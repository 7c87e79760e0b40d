"""Client for stage instances and hubs (reference
omni_coord_client_for_stage.py / omni_coord_client_for_hub.py)."""

from __future__ import annotations

import json

import zmq


class CoordinatorClient:
    def __init__(self, address: str, timeout_ms: int = 2000) -> None:
        self.ctx = zmq.Context.instance()
        self.sock = self.ctx.socket(zmq.REQ)
        self.sock.setsockopt(zmq.RCVTIMEO, timeout_ms)
        self.sock.setsockopt(zmq.SNDTIMEO, timeout_ms)
        self.sock.setsockopt(zmq.LINGER, 0)
        self.sock.connect(address)

    def _call(self, msg: dict) -> dict:
        self.sock.send(json.dumps(msg).encode())
        return json.loads(self.sock.recv())

    def register(
        self, instance_id: str, address: str, stages: list[int]
    ) -> dict:
        return self._call(
            {
                "op": "register",
                "instance_id": instance_id,
                "address": address,
                "stages": stages,
            }
        )

    def heartbeat(
        self, instance_id: str, queue_len: int = 0, status: str = "ready"
    ) -> dict:
        return self._call(
            {
                "op": "heartbeat",
                "instance_id": instance_id,
                "queue_len": queue_len,
                "status": status,
            }
        )

    def list_instances(self) -> list[dict]:
        return self._call({"op": "list"}).get("instances", [])

    def deregister(self, instance_id: str) -> dict:
        return self._call({"op": "deregister", "instance_id": instance_id})

    def close(self) -> None:
        self.sock.close(0)
