"""Native C++ transfer engine: robustness at the network trust boundary.

Covers the hardening of native/transfer_engine.cpp (advisor round-2
findings): oversized frames must be rejected without aborting the
process, and server stop must not deadlock on idle persistent
connections (the connector's normal state)."""

from __future__ import annotations

import socket
import struct
import threading
import time

import pytest

from ht_vllm_omni_tpu.native.transfer import (
    NativeKVStoreServer,
    NativeTransferClient,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain"
)


def test_put_get_roundtrip():
    srv = NativeKVStoreServer()
    try:
        cli = NativeTransferClient(srv.host, srv.port)
        assert cli.put("k1", b"hello" * 1000)
        assert cli.get("k1", consume=False) == b"hello" * 1000
        assert cli.get("k1") == b"hello" * 1000
        assert cli.get("k1", timeout_ms=10) is None  # consumed
        cli.close()
    finally:
        srv.close()


def test_oversized_frame_rejected_not_fatal():
    """A hostile 16-byte header claiming a huge val_len must get an
    error response (or a dropped connection) — NOT a bad_alloc that
    std::terminates the serving process."""
    srv = NativeKVStoreServer()
    try:
        s = socket.create_connection((srv.host, srv.port), timeout=5)
        # op=PUT key_len=3 timeout=0 val_len=2^63 (way past the cap)
        s.sendall(struct.pack("<BHIQ", 1, 3, 0, 1 << 63) + b"key")
        resp = s.recv(9)
        if resp:  # server replied ST_ERROR before dropping us
            status = resp[0]
            assert status == 2
        s.close()
        # server must still be alive and serving
        cli = NativeTransferClient(srv.host, srv.port)
        assert cli.put("ok", b"x")
        assert cli.get("ok") == b"x"
        cli.close()
    finally:
        srv.close()


def test_stop_with_idle_connections_does_not_hang():
    """te_server_stop must sever live client sockets; otherwise handler
    threads stay blocked in read() and join() deadlocks forever."""
    srv = NativeKVStoreServer()
    clients = [NativeTransferClient(srv.host, srv.port) for _ in range(4)]
    for i, c in enumerate(clients):
        assert c.put(f"k{i}", b"v")  # establish the connection
    done = threading.Event()

    def stopper():
        srv.close()
        done.set()

    t = threading.Thread(target=stopper, daemon=True)
    t.start()
    assert done.wait(timeout=10), "server stop deadlocked on idle conns"
    for c in clients:
        c.close()


def test_blocking_get_wakes_on_put():
    srv = NativeKVStoreServer()
    try:
        consumer = NativeTransferClient(srv.host, srv.port)
        producer = NativeTransferClient(srv.host, srv.port)
        got: list[bytes | None] = []

        def fetch():
            got.append(consumer.get("late", timeout_ms=5000))

        t = threading.Thread(target=fetch, daemon=True)
        t.start()
        time.sleep(0.1)
        assert producer.put("late", b"payload")
        t.join(timeout=5)
        assert got == [b"payload"]
        consumer.close()
        producer.close()
    finally:
        srv.close()
