import numpy as np

from ht_vllm_omni_tpu.distributed.connectors import OmniConnectorFactory
from ht_vllm_omni_tpu.distributed.connectors.tcp import (
    KVStoreServer,
    TcpConnector,
)


def test_tcp_put_get_roundtrip_and_ttl():
    server = KVStoreServer(ttl_s=0.4)
    server.start()
    try:
        host, port = server.address
        conn = OmniConnectorFactory.create(
            "TcpConnector", host=host, port=port
        )
        payload = {"tokens": [1, 2, 3],
                   "kv": np.arange(2048, dtype=np.float32)}
        ok, size = conn.put(0, 1, "req_0_0", payload)
        assert ok and size > 0
        assert conn.flush(timeout_s=10)  # puts are async: drain first

        got, n = conn.get(0, 1, "req_0_0")
        assert got["tokens"] == [1, 2, 3]
        np.testing.assert_array_equal(got["kv"], payload["kv"])

        # consumed
        again, _ = conn.get(0, 1, "req_0_0")
        assert again is None

        # TTL reclaim of unconsumed entries
        conn.put(0, 1, "stale", {"x": 1})
        assert conn.flush(timeout_s=10)
        import time

        time.sleep(0.8)
        stale, _ = conn.get(0, 1, "stale")
        assert stale is None
        conn.close()
    finally:
        server.stop()
