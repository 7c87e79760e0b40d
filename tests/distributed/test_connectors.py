import numpy as np
import pytest

from ht_vllm_omni_tpu.distributed.connectors import OmniConnectorFactory


@pytest.mark.parametrize(
    "name", ["InMemoryConnector", "SharedMemoryConnector"]
)
def test_put_get_roundtrip(name, tmp_path):
    kwargs = (
        {"registry_dir": str(tmp_path)}
        if name == "SharedMemoryConnector"
        else {}
    )
    conn = OmniConnectorFactory.create(name, **kwargs)
    payload = {
        "token_ids": [1, 2, 3],
        "tensor": np.arange(1024, dtype=np.float32).reshape(32, 32),
    }
    ok, size = conn.put(0, 1, "req1_0_0", payload)
    assert ok and size > 0

    got, _ = conn.get(0, 1, "req1_0_0")
    assert got is not None
    assert got["token_ids"] == [1, 2, 3]
    np.testing.assert_array_equal(got["tensor"], payload["tensor"])

    # consumed on read
    again, n = conn.get(0, 1, "req1_0_0")
    assert again is None and n == 0

    # missing key
    missing, _ = conn.get(0, 1, "nope")
    assert missing is None


def test_factory_unknown_name():
    with pytest.raises(ValueError):
        OmniConnectorFactory.create("NoSuchConnector")
