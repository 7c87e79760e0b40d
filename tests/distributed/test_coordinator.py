"""Coordinator over real ZMQ sockets on localhost (the reference's test
strategy, tests/distributed/omni_coordinator/)."""

import time

from ht_vllm_omni_tpu.distributed.omni_coordinator import (
    CoordinatorClient,
    OmniCoordinator,
    pick_instance,
)


def test_register_heartbeat_expire_and_balance():
    coord = OmniCoordinator(heartbeat_timeout_s=0.5)
    coord.start()
    try:
        c = CoordinatorClient(coord.address)
        assert c.register("a", "tcp://10.0.0.1:9000", [0, 1])["ok"]
        assert c.register("b", "tcp://10.0.0.2:9000", [1])["ok"]
        c.heartbeat("a", queue_len=5)
        c.heartbeat("b", queue_len=2)

        instances = c.list_instances()
        assert {i["instance_id"] for i in instances} == {"a", "b"}

        # least-loaded wins; stage filter respected
        assert pick_instance(instances, stage_id=1)["instance_id"] == "b"
        assert pick_instance(instances, stage_id=0)["instance_id"] == "a"
        assert pick_instance(instances, stage_id=7) is None

        # b stops heartbeating -> ERROR after timeout; a keeps beating
        deadline = time.time() + 1.2
        while time.time() < deadline:
            c.heartbeat("a", queue_len=1)
            time.sleep(0.1)
        instances = c.list_instances()
        by_id = {i["instance_id"]: i for i in instances}
        assert by_id["b"]["status"] == "error"
        assert by_id["a"]["status"] == "ready"
        assert pick_instance(instances, stage_id=1)["instance_id"] == "a"

        # unknown heartbeat rejected; deregister removes
        assert not c.heartbeat("ghost")["ok"]
        c.deregister("a")
        assert len(c.list_instances()) == 1
        c.close()
    finally:
        coord.stop()
