"""Data-only wire codec for cross-host connector payloads.

Replaces pickle on the network boundary (pickle.loads on an untrusted
peer's bytes is arbitrary code execution; the reference's Mooncake
connectors move raw tensor buffers + msgpack'd metadata for the same
reason).  The format is a JSON structure header — with ndarray / bytes
leaves replaced by indexed placeholders — followed by the raw buffers:

    <u32 nbuffers> <u64 header_len> <header JSON>
    repeat nbuffers: <u64 buf_len> <raw bytes>

Only plain data round-trips: dict / list / tuple (decoded as list) /
str / int / float / bool / None / bytes / numpy arrays.  Anything else
raises TypeError at encode time; decode never executes payload content.
"""

from __future__ import annotations

import json
import struct
from typing import Any

import numpy as np

_U32 = struct.Struct("<I")
_U64 = struct.Struct("<Q")
# allowlist of dtype kinds we will reconstruct (no object dtypes)
_OK_KINDS = set("biufc")
# ml_dtypes extension dtypes (kind 'V') that engines actually ship —
# bf16 hidden states / fp8 KV rows.  Indexed by NAME, never by the raw
# descriptor, so decode stays an allowlist.
_EXT_DTYPES: dict[str, np.dtype] = {}
try:  # ml_dtypes ships with jax; gate anyway
    import ml_dtypes

    for _name in (
        "bfloat16",
        "float8_e4m3fn",
        "float8_e5m2",
        "float8_e4m3b11fnuz",
        "int4",
        "uint4",
    ):
        _dt = getattr(ml_dtypes, _name, None)
        if _dt is not None:
            _EXT_DTYPES[_name] = np.dtype(_dt)
except ImportError:  # pragma: no cover
    pass


def encode_payload(obj: Any) -> bytes:
    buffers: list[bytes] = []

    def conv(o):
        if isinstance(o, np.ndarray):
            if o.dtype.kind not in _OK_KINDS:
                name = o.dtype.name
                if name not in _EXT_DTYPES:
                    raise TypeError(f"non-numeric ndarray dtype {o.dtype}")
                buffers.append(np.ascontiguousarray(o).tobytes())
                return {
                    "__nd__": len(buffers) - 1,
                    "xdtype": name,
                    "shape": list(o.shape),
                }
            buffers.append(np.ascontiguousarray(o).tobytes())
            return {
                "__nd__": len(buffers) - 1,
                "dtype": o.dtype.str,
                "shape": list(o.shape),
            }
        if isinstance(o, (bytes, bytearray, memoryview)):
            buffers.append(bytes(o))
            return {"__bytes__": len(buffers) - 1}
        if isinstance(o, dict):
            return {"__map__": [[conv(k), conv(v)] for k, v in o.items()]}
        if isinstance(o, (list, tuple)):
            return {"__list__": [conv(x) for x in o]}
        if isinstance(o, (np.integer,)):
            return int(o)
        if isinstance(o, (np.floating,)):
            return float(o)
        if isinstance(o, np.bool_):
            return bool(o)
        if o is None or isinstance(o, (bool, int, float, str)):
            return o
        raise TypeError(f"unsupported payload type {type(o)!r}")

    header = json.dumps(conv(obj), separators=(",", ":")).encode()
    parts = [_U32.pack(len(buffers)), _U64.pack(len(header)), header]
    for buf in buffers:
        parts.append(_U64.pack(len(buf)))
        parts.append(buf)
    return b"".join(parts)


def decode_payload(blob: bytes) -> Any:
    (nbuf,) = _U32.unpack_from(blob, 0)
    (hlen,) = _U64.unpack_from(blob, _U32.size)
    off = _U32.size + _U64.size
    tree = json.loads(blob[off : off + hlen].decode())
    off += hlen
    buffers: list[bytes] = []
    for _ in range(nbuf):
        (blen,) = _U64.unpack_from(blob, off)
        off += _U64.size
        buffers.append(blob[off : off + blen])
        off += blen

    def back(o):
        if isinstance(o, dict):
            if "__nd__" in o:
                if "xdtype" in o:
                    dt = _EXT_DTYPES.get(o["xdtype"])
                    if dt is None:
                        raise ValueError(
                            f"refusing extension dtype {o['xdtype']!r}"
                        )
                else:
                    dt = np.dtype(o["dtype"])
                    if dt.kind not in _OK_KINDS:
                        raise ValueError(f"refusing dtype {dt}")
                return np.frombuffer(
                    buffers[o["__nd__"]], dtype=dt
                ).reshape(o["shape"])
            if "__bytes__" in o:
                return buffers[o["__bytes__"]]
            if "__map__" in o:
                return {back(k): back(v) for k, v in o["__map__"]}
            if "__list__" in o:
                return [back(x) for x in o["__list__"]]
            raise ValueError(f"malformed header node {list(o)[:3]}")
        return o

    return back(tree)
