"""ctypes bindings for the native transfer engine (transfer_engine.cpp).

Python-facing API mirrors the store/client split of the reference's
Mooncake connectors (reference mooncake_store_connector.py /
mooncake_transfer_engine_connector.py): a ``NativeKVStoreServer`` runs
next to the consuming stage, producers push bytes with a persistent
``NativeTransferClient``.  Values are opaque bytes end-to-end — encode
structures with connectors/codec.py, never pickle.
"""

from __future__ import annotations

import ctypes
from typing import Optional

from ht_vllm_omni_tpu.native.build import build_library

_lib = None
_lib_error: str | None = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_error
    if _lib is not None or _lib_error is not None:
        return _lib
    path = build_library("omni_transfer", "transfer_engine.cpp")
    if path is None:
        _lib_error = "no C++ toolchain / build failed"
        return None
    lib = ctypes.CDLL(str(path))
    lib.te_server_start.restype = ctypes.c_void_p
    lib.te_server_start.argtypes = [
        ctypes.c_char_p, ctypes.c_uint16, ctypes.c_int64,
    ]
    lib.te_server_port.restype = ctypes.c_uint16
    lib.te_server_port.argtypes = [ctypes.c_void_p]
    lib.te_server_stop.argtypes = [ctypes.c_void_p]
    lib.te_server_stats.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.te_client_connect.restype = ctypes.c_void_p
    lib.te_client_connect.argtypes = [ctypes.c_char_p, ctypes.c_uint16]
    lib.te_client_close.argtypes = [ctypes.c_void_p]
    lib.te_put.restype = ctypes.c_int
    lib.te_put.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint16,
        ctypes.c_char_p, ctypes.c_uint64,
    ]
    lib.te_get.restype = ctypes.c_int
    lib.te_get.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint16,
        ctypes.c_uint32, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.te_delete.restype = ctypes.c_int
    lib.te_delete.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint16,
    ]
    lib.te_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


class NativeKVStoreServer:
    """In-process key/value store served over TCP by C++ threads."""

    def __init__(
        self, host: str = "127.0.0.1", port: int = 0, ttl_s: float = 300.0
    ) -> None:
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native transfer unavailable: {_lib_error}")
        self._lib = lib
        self._h = lib.te_server_start(
            host.encode(), port, int(ttl_s * 1000)
        )
        if not self._h:
            raise OSError(f"te_server_start failed on {host}:{port}")
        self.host = host
        self.port = int(lib.te_server_port(self._h))

    def stats(self) -> dict[str, int]:
        out = (ctypes.c_uint64 * 5)()
        self._lib.te_server_stats(self._h, out)
        keys = ("n_keys", "bytes_in", "bytes_out", "n_puts", "n_gets")
        return dict(zip(keys, (int(v) for v in out)))

    def close(self) -> None:
        if self._h:
            self._lib.te_server_stop(self._h)
            self._h = None

    def __del__(self) -> None:  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


class NativeTransferClient:
    """Persistent connection; one request in flight per client."""

    def __init__(self, host: str, port: int) -> None:
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native transfer unavailable: {_lib_error}")
        self._lib = lib
        self._h = lib.te_client_connect(host.encode(), port)
        if not self._h:
            raise ConnectionError(f"connect {host}:{port} failed")

    def put(self, key: str, value: bytes) -> bool:
        k = key.encode()
        return (
            self._lib.te_put(self._h, k, len(k), value, len(value)) == 0
        )

    def get(
        self, key: str, timeout_ms: int = 0, consume: bool = True
    ) -> bytes | None:
        """Blocking fetch: the server parks the request on a condition
        variable for up to timeout_ms, so arrival wakes us immediately
        (no poll loop)."""
        k = key.encode()
        out = ctypes.POINTER(ctypes.c_uint8)()
        out_len = ctypes.c_uint64()
        st = self._lib.te_get(
            self._h, k, len(k), timeout_ms, int(consume),
            ctypes.byref(out), ctypes.byref(out_len),
        )
        if st != 0:
            return None
        try:
            return ctypes.string_at(out, out_len.value)
        finally:
            self._lib.te_free(out)

    def delete(self, key: str) -> bool:
        k = key.encode()
        return self._lib.te_delete(self._h, k, len(k)) == 0

    def close(self) -> None:
        if self._h:
            self._lib.te_client_close(self._h)
            self._h = None

    def __del__(self) -> None:  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
