"""AR-stage core: requests, paged-KV block pool, continuous-batching scheduler."""
