"""The scripts/stream_tts_play.py client against a canned PCM server.

Covers the client side of the HT progressive-streaming feature
(reference scripts/stream_tts_play.py): chunked HTTP read, TTFP
measurement, WAV save.  The server here is a stdlib fake returning a
fixed PCM body in chunks — the real server side is covered by
tests/entrypoints/test_speech_stream.py.
"""

import json
import pathlib
import struct
import subprocess
import sys
import threading
import wave
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[2]
SCRIPT = ROOT / "scripts" / "stream_tts_play.py"

PCM = (np.sin(np.linspace(0, 40, 2400)) * 2000).astype("<i2").tobytes()


class _Handler(BaseHTTPRequestHandler):
    def do_POST(self):  # noqa: N802
        assert self.path == "/v1/audio/speech"
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        assert body["response_format"] == "pcm"
        assert body["input"]
        self.send_response(200)
        self.send_header("Content-Type", "application/octet-stream")
        self.end_headers()
        for i in range(0, len(PCM), 512):
            self.wfile.write(PCM[i : i + 512])
            self.wfile.flush()

    def log_message(self, *a):  # quiet
        pass


def test_stream_client_saves_wav(tmp_path):
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        out = tmp_path / "out.wav"
        proc = subprocess.run(
            [
                sys.executable, str(SCRIPT),
                "--url", f"http://127.0.0.1:{srv.server_port}",
                "--no-play", "--save", str(out),
                "hello world",
            ],
            capture_output=True, text=True, timeout=60,
        )
        assert proc.returncode == 0, proc.stderr
        assert "TTFP" in proc.stderr and "RTF" in proc.stderr
        with wave.open(str(out)) as w:
            assert w.getframerate() == 24000
            assert w.getnchannels() == 1
            frames = w.readframes(w.getnframes())
        assert frames == PCM
    finally:
        srv.shutdown()


def test_stream_client_pcm_save_and_stdin(tmp_path):
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        out = tmp_path / "out.pcm"
        proc = subprocess.run(
            [
                sys.executable, str(SCRIPT),
                "--url", f"http://127.0.0.1:{srv.server_port}",
                "--no-play", "--save", str(out),
            ],
            input="piped text",
            capture_output=True, text=True, timeout=60,
        )
        assert proc.returncode == 0, proc.stderr
        assert out.read_bytes() == PCM
    finally:
        srv.shutdown()


def test_wav_header_matches_struct():
    sys.path.insert(0, str(SCRIPT.parent))
    try:
        import stream_tts_play as m
    finally:
        sys.path.pop(0)
    hdr = m.wav_header(1200, 24000)
    assert hdr[:4] == b"RIFF" and hdr[8:16] == b"WAVEfmt "
    assert struct.unpack("<I", hdr[40:44])[0] == 1200 * 2
