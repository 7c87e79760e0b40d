"""TCP connector for multi-node stage-to-stage transfer.

Counterpart of the reference's Mooncake connectors (reference
vllm_omni/distributed/omni_connectors/connectors/
mooncake_transfer_engine_connector.py / mooncake_store_connector.py):
where Mooncake moves pinned GPU buffers over RDMA, the TPU deployment
moves host payloads between hosts over the data-center network — here a
small length-prefixed protocol over TCP sockets, with a store server
that consumers drain.  A stale-entry TTL mirrors the reference's
5-minute pinned-buffer reclaim (mooncake_transfer_engine_connector.py:31).

Wire safety: payloads cross a network trust boundary, so they are framed
with the data-only codec (connectors/codec.py — JSON structure + raw
ndarray buffers), never pickle; the store server treats blobs as opaque
bytes and deserializes nothing.
"""

from __future__ import annotations

import socket
import socketserver
import struct
import threading
import time
from typing import Any

from ht_vllm_omni_tpu.distributed.connectors.base import OmniConnectorBase
from ht_vllm_omni_tpu.distributed.connectors.codec import (
    decode_payload,
    encode_payload,
)

_HDR = struct.Struct("<IQ")  # op, payload length
_KLEN = struct.Struct("<H")  # key length prefix inside PUT bodies
_OP_PUT = 1
_OP_GET = 2
_OP_NONE = 0
_OP_DATA = 3


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return buf


class KVStoreServer:
    """The store side (run next to the consuming stage)."""

    def __init__(
        self, host: str = "127.0.0.1", port: int = 0,
        ttl_s: float = 300.0,
    ) -> None:
        self._store: dict[str, tuple[float, bytes]] = {}
        self._lock = threading.Lock()
        self.ttl_s = ttl_s
        store = self._store
        lock = self._lock
        self._conns: set = set()
        conns = self._conns

        class Handler(socketserver.BaseRequestHandler):
            def setup(self) -> None:
                conns.add(self.request)

            def finish(self) -> None:
                conns.discard(self.request)

            def handle(self) -> None:
                try:
                    while True:
                        op, length = _HDR.unpack(
                            _recv_exact(self.request, _HDR.size)
                        )
                        body = _recv_exact(self.request, length)
                        if op == _OP_PUT:
                            (klen,) = _KLEN.unpack_from(body, 0)
                            key = body[_KLEN.size : _KLEN.size + klen]
                            key = key.decode("utf-8")
                            blob = body[_KLEN.size + klen :]
                            with lock:
                                store[key] = (time.time(), blob)
                            self.request.sendall(_HDR.pack(_OP_NONE, 0))
                        elif op == _OP_GET:
                            key = body.decode("utf-8")
                            with lock:
                                item = store.pop(key, None)
                            if item is None:
                                self.request.sendall(
                                    _HDR.pack(_OP_NONE, 0)
                                )
                            else:
                                self.request.sendall(
                                    _HDR.pack(_OP_DATA, len(item[1]))
                                    + item[1]
                                )
                except (ConnectionError, OSError):
                    return

        self._server = socketserver.ThreadingTCPServer(
            (host, port), Handler
        )
        self._server.daemon_threads = True
        self.address = self._server.server_address
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._gc = threading.Thread(target=self._expire, daemon=True)
        self._running = True

    def start(self) -> None:
        self._thread.start()
        self._gc.start()

    def _expire(self) -> None:
        while self._running:
            now = time.time()
            with self._lock:
                dead = [
                    k
                    for k, (ts, _) in self._store.items()
                    if now - ts > self.ttl_s
                ]
                for k in dead:
                    del self._store[k]
            time.sleep(min(self.ttl_s / 4, 5.0))

    def stop(self) -> None:
        self._running = False
        self._server.shutdown()
        self._server.server_close()
        # sever live client connections so peers observe the store down
        for sock in list(self._conns):
            try:
                sock.shutdown(socket.SHUT_RDWR)
            except OSError:
                pass
            try:
                sock.close()
            except OSError:
                pass


class TcpConnector(OmniConnectorBase):
    """put/get client against a KVStoreServer.

    ``put`` is NON-blocking: payloads land on a bounded queue drained by
    a dedicated sender thread that owns one connection and pipelines
    PUT+ack round trips, so the orchestrator's pump never stalls on the
    network (the bounded queue is the backpressure valve — a full queue
    blocks the producer instead of growing without limit).  ``get`` stays
    synchronous (the consumer needs the data) on its own connection.
    Both sides reconnect on error; persistent failures flip
    ``healthy`` so the coordinator's health loop can see the edge down.
    """

    QUEUE_DEPTH = 64

    def __init__(
        self, host: str, port: int, send_timeout_s: float = 30.0,
        **extra: Any,
    ) -> None:
        import queue

        super().__init__(**extra)
        self.addr = (host, int(port))
        self._local = threading.local()
        self.send_timeout_s = send_timeout_s
        self.healthy = True
        self._sendq: queue.Queue = queue.Queue(self.QUEUE_DEPTH)
        self._inflight = 0
        self._flush_cv = threading.Condition()
        self._running = True
        self._sender = threading.Thread(
            target=self._send_loop, name="tcp-connector-send", daemon=True
        )
        self._sender.start()

    def _connect(self) -> socket.socket:
        sock = socket.create_connection(self.addr, timeout=10)
        sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        return sock

    def _sock(self) -> socket.socket:
        sock = getattr(self._local, "sock", None)
        if sock is None:
            sock = self._connect()
            self._local.sock = sock
        return sock

    def _key(self, from_stage: int, to_stage: int, key: str) -> str:
        return f"{from_stage}->{to_stage}:{key}"

    # ------------------------------------------------------------ sender
    def _send_loop(self) -> None:
        import queue

        sock: socket.socket | None = None
        while self._running:
            try:
                frame = self._sendq.get(timeout=0.2)
            except queue.Empty:
                continue
            try:
                if sock is None:
                    sock = self._connect()
                sock.sendall(frame)
                _recv_exact(sock, _HDR.size)  # ack
                self.healthy = True
            except (OSError, ConnectionError):
                # one reconnect attempt per frame; then drop + mark down
                try:
                    if sock is not None:
                        sock.close()
                    sock = self._connect()
                    sock.sendall(frame)
                    _recv_exact(sock, _HDR.size)
                    self.healthy = True
                except (OSError, ConnectionError):
                    sock = None
                    self.healthy = False
            finally:
                with self._flush_cv:
                    self._inflight -= 1
                    self._flush_cv.notify_all()

    def put(self, from_stage, to_stage, key, data):
        blob = encode_payload(data)
        kb = self._key(from_stage, to_stage, key).encode("utf-8")
        body = _KLEN.pack(len(kb)) + kb + blob
        frame = _HDR.pack(_OP_PUT, len(body)) + body
        with self._flush_cv:
            self._inflight += 1
        self._sendq.put(frame, timeout=self.send_timeout_s)
        return True, len(blob)

    def flush(self, timeout_s: float = 30.0) -> bool:
        """Block until every queued put has been sent+acked (or dropped).
        Returns self.healthy."""
        deadline = time.time() + timeout_s
        with self._flush_cv:
            while self._inflight > 0:
                remaining = deadline - time.time()
                if remaining <= 0:
                    return False
                self._flush_cv.wait(remaining)
        return self.healthy

    def get(self, from_stage, to_stage, key):
        body = self._key(from_stage, to_stage, key).encode("utf-8")
        try:
            sock = self._sock()
            sock.sendall(_HDR.pack(_OP_GET, len(body)) + body)
            op, length = _HDR.unpack(_recv_exact(sock, _HDR.size))
        except (OSError, ConnectionError):
            # reconnect once; a missing payload is recoverable upstream
            # (kv_transfer.receive_and_inject recomputes)
            try:
                self._local.sock = None
                sock = self._sock()
                sock.sendall(_HDR.pack(_OP_GET, len(body)) + body)
                op, length = _HDR.unpack(_recv_exact(sock, _HDR.size))
            except (OSError, ConnectionError):
                self.healthy = False
                return None, 0
        if op != _OP_DATA:
            return None, 0
        blob = _recv_exact(sock, length)
        return decode_payload(blob), len(blob)

    def close(self) -> None:
        self._running = False
        self._sender.join(timeout=2)
        sock = getattr(self._local, "sock", None)
        if sock is not None:
            sock.close()
