"""Native (C++) stage-to-stage connector.

Drop-in for TcpConnector, but the data plane is the C++ transfer engine
(native/transfer_engine.cpp) — the TPU-native counterpart of the
reference's Mooncake TransferEngine C++ library (reference
mooncake_transfer_engine_connector.py:24-27).  Differences vs the
Python connector that matter under load:

- one writev per message (header+key+value), no Python-side joins;
- GETs park server-side on a condition variable, so chunk consumers
  wake on arrival instead of poll-sleeping (the Python store returns
  "missing" and the caller retries);
- the store and all socket I/O run on C++ threads, off the GIL.

Payload safety is identical: values are framed with the data-only codec
(connectors/codec.py), the server never deserializes.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Any

from ht_vllm_omni_tpu.distributed.connectors.base import OmniConnectorBase
from ht_vllm_omni_tpu.distributed.connectors.codec import (
    decode_payload,
    encode_payload,
)
from ht_vllm_omni_tpu.native.transfer import (
    NativeKVStoreServer,
    NativeTransferClient,
    native_available,
)

__all__ = [
    "NativeKVStoreServer",
    "NativeTcpConnector",
    "native_available",
]


class NativeTcpConnector(OmniConnectorBase):
    """put/get client against a NativeKVStoreServer.

    Same contract as TcpConnector: ``put`` is non-blocking (bounded
    queue + dedicated sender thread = backpressure without stalling the
    orchestrator pump), ``get`` is synchronous with a short server-side
    wait so async-chunk consumers don't spin.
    """

    QUEUE_DEPTH = 64
    GET_WAIT_MS = 2  # server-side cv wait per get; callers poll above

    def __init__(
        self, host: str, port: int, send_timeout_s: float = 30.0,
        **extra: Any,
    ) -> None:
        super().__init__(**extra)
        self.addr = (host, int(port))
        self.send_timeout_s = send_timeout_s
        self.healthy = True
        self._local = threading.local()
        self._sendq: queue.Queue = queue.Queue(self.QUEUE_DEPTH)
        self._inflight = 0
        self._flush_cv = threading.Condition()
        self._running = True
        self._sender = threading.Thread(
            target=self._send_loop, name="native-connector-send", daemon=True
        )
        self._sender.start()

    # ----------------------------------------------------------- clients
    def _client(self) -> NativeTransferClient:
        cli = getattr(self._local, "cli", None)
        if cli is None:
            cli = NativeTransferClient(*self.addr)
            self._local.cli = cli
        return cli

    def _key(self, from_stage: int, to_stage: int, key: str) -> str:
        return f"{from_stage}->{to_stage}:{key}"

    # ------------------------------------------------------------ sender
    def _send_loop(self) -> None:
        cli: NativeTransferClient | None = None
        while self._running:
            try:
                k, blob = self._sendq.get(timeout=0.2)
            except queue.Empty:
                continue
            ok = False
            try:
                if cli is None:
                    cli = NativeTransferClient(*self.addr)
                ok = cli.put(k, blob)
            except (OSError, ConnectionError, RuntimeError):
                ok = False
            if not ok:  # one reconnect attempt per frame
                try:
                    if cli is not None:
                        cli.close()
                    cli = NativeTransferClient(*self.addr)
                    ok = cli.put(k, blob)
                except (OSError, ConnectionError, RuntimeError):
                    cli = None
                    ok = False
            self.healthy = ok
            with self._flush_cv:
                self._inflight -= 1
                self._flush_cv.notify_all()

    def put(self, from_stage, to_stage, key, data):
        blob = encode_payload(data)
        k = self._key(from_stage, to_stage, key)
        with self._flush_cv:
            self._inflight += 1
        self._sendq.put((k, blob), timeout=self.send_timeout_s)
        return True, len(blob)

    def flush(self, timeout_s: float = 30.0) -> bool:
        deadline = time.time() + timeout_s
        with self._flush_cv:
            while self._inflight > 0:
                remaining = deadline - time.time()
                if remaining <= 0:
                    return False
                self._flush_cv.wait(remaining)
        return self.healthy

    def get(self, from_stage, to_stage, key):
        k = self._key(from_stage, to_stage, key)
        try:
            blob = self._client().get(k, timeout_ms=self.GET_WAIT_MS)
        except (OSError, ConnectionError, RuntimeError):
            try:
                self._local.cli = None
                blob = self._client().get(k, timeout_ms=self.GET_WAIT_MS)
            except (OSError, ConnectionError, RuntimeError):
                self.healthy = False
                return None, 0
        if blob is None:
            return None, 0
        return decode_payload(blob), len(blob)

    def close(self) -> None:
        self._running = False
        self._sender.join(timeout=2)
        cli = getattr(self._local, "cli", None)
        if cli is not None:
            cli.close()
