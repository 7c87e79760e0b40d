"""Shared-filesystem connector (distributed/connectors/fsstore.py) —
the reference's Yuanrong alternative-transport slot."""

import numpy as np

from ht_vllm_omni_tpu.distributed.connectors.factory import (
    OmniConnectorFactory,
)


def test_fsstore_roundtrip(tmp_path):
    c = OmniConnectorFactory.create(
        "FsStoreConnector", store_dir=str(tmp_path)
    )
    payload = {
        "rows": np.arange(24, dtype=np.float32).reshape(4, 6),
        "meta": {"chunk": 3},
        "ids": [1, 2, 3],
    }
    ok, size = c.put(0, 1, "req1_1_0", payload)
    assert ok and size > 0
    got, gsize = c.get(0, 1, "req1_1_0")
    assert gsize == size
    np.testing.assert_array_equal(got["rows"], payload["rows"])
    assert got["meta"]["chunk"] == 3 and got["ids"] == [1, 2, 3]
    # consumed: second get misses
    assert c.get(0, 1, "req1_1_0") == (None, 0)
    # missing key
    assert c.get(0, 1, "nope") == (None, 0)


def test_fsstore_ttl_sweep(tmp_path):
    import os
    import time

    c = OmniConnectorFactory.create(
        "FsStoreConnector", store_dir=str(tmp_path), ttl_s=0.2
    )
    c.put(0, 1, "stale", {"x": 1})
    # age the file beyond the ttl
    p = os.path.join(str(tmp_path), "0_1_stale.bin")
    old = time.time() - 10
    os.utime(p, (old, old))
    c._last_sweep = 0.0
    c.put(0, 1, "fresh", {"y": 2})  # triggers the sweep
    assert c.get(0, 1, "stale") == (None, 0)
    assert c.get(0, 1, "fresh")[0]["y"] == 2


def test_yuanrong_alias(tmp_path):
    c = OmniConnectorFactory.create(
        "YuanrongConnector", store_dir=str(tmp_path)
    )
    c.put(1, 2, "k", [1.5, 2.5])
    assert c.get(1, 2, "k")[0] == [1.5, 2.5]
