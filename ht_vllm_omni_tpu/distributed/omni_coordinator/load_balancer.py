"""Queue-length instance selection (reference load_balancer.py:82)."""

from __future__ import annotations


def pick_instance(instances: list[dict], stage_id: int | None = None) -> (
    dict | None
):
    """Least-loaded READY instance (optionally serving ``stage_id``)."""
    ready = [
        i
        for i in instances
        if i.get("status") == "ready"
        and (stage_id is None or stage_id in i.get("stages", []))
    ]
    if not ready:
        return None
    return min(ready, key=lambda i: i.get("queue_len", 0))
