"""ZMQ service registry for disaggregated multi-instance deployments.

Counterpart of the reference OmniCoordinator (reference
vllm_omni/distributed/omni_coordinator/omni_coordinator.py:19-75): stage
instances register and heartbeat over a ZMQ ROUTER socket; instances that
miss heartbeats past the timeout are marked ERROR; hub clients query the
registry to route requests (load_balancer.py picks by queue length).
"""

from __future__ import annotations

import dataclasses
import enum
import json
import threading
import time

import zmq


class StageStatus(str, enum.Enum):
    READY = "ready"
    BUSY = "busy"
    ERROR = "error"


@dataclasses.dataclass
class InstanceInfo:
    instance_id: str
    address: str
    stages: list[int]
    status: StageStatus = StageStatus.READY
    queue_len: int = 0
    last_heartbeat: float = dataclasses.field(default_factory=time.time)

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["status"] = self.status.value
        return d


class OmniCoordinator:
    def __init__(
        self,
        bind: str = "tcp://127.0.0.1:0",
        heartbeat_timeout_s: float = 5.0,
    ) -> None:
        self.ctx = zmq.Context.instance()
        self.sock = self.ctx.socket(zmq.ROUTER)
        if bind.endswith(":0"):
            port = self.sock.bind_to_random_port(bind[: bind.rfind(":")])
            self.address = f"{bind[: bind.rfind(':')]}:{port}"
        else:
            self.sock.bind(bind)
            self.address = bind
        self.heartbeat_timeout_s = heartbeat_timeout_s
        self.instances: dict[str, InstanceInfo] = {}
        self._lock = threading.Lock()
        self._running = False
        self._thread: threading.Thread | None = None

    # ------------------------------------------------------------- serve
    def start(self) -> None:
        self._running = True
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._running = False
        if self._thread:
            self._thread.join(timeout=2)
        self.sock.close(0)

    def _serve(self) -> None:
        poller = zmq.Poller()
        poller.register(self.sock, zmq.POLLIN)
        while self._running:
            if dict(poller.poll(timeout=100)):
                ident, _, raw = self.sock.recv_multipart()
                reply = self._handle(json.loads(raw))
                self.sock.send_multipart(
                    [ident, b"", json.dumps(reply).encode()]
                )
            self._expire()

    def _expire(self) -> None:
        now = time.time()
        with self._lock:
            for info in self.instances.values():
                if (
                    info.status != StageStatus.ERROR
                    and now - info.last_heartbeat > self.heartbeat_timeout_s
                ):
                    info.status = StageStatus.ERROR

    # ------------------------------------------------------------ handlers
    def _handle(self, msg: dict) -> dict:
        op = msg.get("op")
        if op == "register":
            info = InstanceInfo(
                instance_id=msg["instance_id"],
                address=msg["address"],
                stages=msg.get("stages", []),
            )
            with self._lock:
                self.instances[info.instance_id] = info
            return {"ok": True}
        if op == "heartbeat":
            with self._lock:
                info = self.instances.get(msg["instance_id"])
                if info is None:
                    return {"ok": False, "error": "unknown instance"}
                info.last_heartbeat = time.time()
                info.queue_len = msg.get("queue_len", 0)
                info.status = StageStatus(msg.get("status", "ready"))
            return {"ok": True}
        if op == "list":
            with self._lock:
                return {
                    "ok": True,
                    "instances": [
                        i.to_dict() for i in self.instances.values()
                    ],
                }
        if op == "deregister":
            with self._lock:
                self.instances.pop(msg["instance_id"], None)
            return {"ok": True}
        return {"ok": False, "error": f"unknown op {op!r}"}
