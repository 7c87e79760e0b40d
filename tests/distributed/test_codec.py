"""Data-only wire codec: round trip + refusal of executable content."""

import numpy as np
import pytest

from ht_vllm_omni_tpu.distributed.connectors.codec import (
    decode_payload,
    encode_payload,
)


def test_roundtrip_nested():
    payload = {
        "token_ids": [1, 2, 3],
        "kv_rows": np.arange(24, dtype=np.float32).reshape(2, 3, 4),
        "extra": {"nested": [True, None, 1.5, "s"], 7: "int-key"},
        "blob": b"\x00\x01raw",
        "i8": np.array([[-3, 7]], dtype=np.int8),
    }
    out = decode_payload(encode_payload(payload))
    assert out["token_ids"] == [1, 2, 3]
    np.testing.assert_array_equal(out["kv_rows"], payload["kv_rows"])
    assert out["kv_rows"].dtype == np.float32
    assert out["extra"]["nested"] == [True, None, 1.5, "s"]
    assert out["extra"][7] == "int-key"
    assert out["blob"] == b"\x00\x01raw"
    np.testing.assert_array_equal(out["i8"], payload["i8"])


def test_rejects_arbitrary_objects():
    class Evil:
        def __reduce__(self):
            return (print, ("pwned",))

    with pytest.raises(TypeError):
        encode_payload({"x": Evil()})
    with pytest.raises(TypeError):
        encode_payload(np.array([Evil()], dtype=object))


def test_tuple_decodes_as_list():
    assert decode_payload(encode_payload((1, 2))) == [1, 2]


def test_extension_dtypes_roundtrip():
    """bf16 hidden states / fp8 KV rows ride the wire as named
    allowlisted ml_dtypes (kind 'V' would otherwise be rejected)."""
    import ml_dtypes

    h = np.arange(12, dtype=np.float32).astype(ml_dtypes.bfloat16)
    k = np.ones((2, 2), np.float32).astype(ml_dtypes.float8_e4m3fn)
    out = decode_payload(encode_payload({"h": h.reshape(3, 4), "k": k}))
    assert out["h"].dtype == np.dtype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(
        out["h"].astype(np.float32).ravel(), h.astype(np.float32)
    )
    assert out["k"].dtype == np.dtype(ml_dtypes.float8_e4m3fn)


def test_decode_refuses_unknown_extension_name():
    blob = encode_payload({"x": np.zeros(2, np.float32)})
    evil = blob.replace(b'"dtype":"<f4"', b'"xdtype":"f4x"')
    with pytest.raises(ValueError):
        decode_payload(evil)
