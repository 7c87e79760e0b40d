#!/usr/bin/env python3
"""Stream TTS audio from an ht-omni server and play it in real time.

Counterpart to the HT fork's streaming playback tool (reference
`scripts/stream_tts_play.py`): issues a progressive `/v1/audio/speech`
request and feeds PCM chunks to a player process (`play`/`aplay`/
`ffplay`, whichever is installed) as they arrive, so audio starts at
first chunk rather than at end of synthesis.  Reports TTFP (time to
first audio byte) and a streaming RTF estimate.

Usage:
    python scripts/stream_tts_play.py "Hello, streaming test."
    python scripts/stream_tts_play.py --voice default "Preset voice."
    python scripts/stream_tts_play.py --save out.wav --no-play "Just save."
    python scripts/stream_tts_play.py --no-stream "Latency comparison."

Only stdlib is required (urllib); no `requests` dependency.
"""

from __future__ import annotations

import argparse
import json
import shutil
import struct
import subprocess
import sys
import time
import urllib.request

SAMPLE_RATE = 24000
CHANNELS = 1
BITS = 16


def wav_header(num_samples: int, sample_rate: int) -> bytes:
    data_len = num_samples * CHANNELS * (BITS // 8)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + data_len)
        + b"WAVEfmt "
        + struct.pack(
            "<IHHIIHH",
            16, 1, CHANNELS, sample_rate,
            sample_rate * CHANNELS * (BITS // 8),
            CHANNELS * (BITS // 8), BITS,
        )
        + b"data"
        + struct.pack("<I", data_len)
    )


def find_player(sample_rate: int) -> list[str] | None:
    """Pick an installed raw-PCM player command reading from stdin."""
    if shutil.which("play"):  # sox
        return [
            "play", "-q", "-t", "raw", "-r", str(sample_rate), "-e",
            "signed", "-b", str(BITS), "-c", str(CHANNELS), "-",
        ]
    if shutil.which("aplay"):
        return [
            "aplay", "-q", "-t", "raw", "-r", str(sample_rate),
            "-f", "S16_LE", "-c", str(CHANNELS), "-",
        ]
    if shutil.which("ffplay"):
        return [
            "ffplay", "-loglevel", "quiet", "-nodisp", "-autoexit",
            "-f", "s16le", "-ar", str(sample_rate),
            "-ch_layout", "mono", "-i", "-",
        ]
    return None


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("text", nargs="*", help="text to synthesize")
    ap.add_argument("--url", default="http://localhost:8000")
    ap.add_argument("--model", default="")
    ap.add_argument("--voice", default="default")
    ap.add_argument("--speed", type=float, default=1.0)
    ap.add_argument("--sample-rate", type=int, default=SAMPLE_RATE)
    ap.add_argument("--save", metavar="PATH", help=".wav or .pcm output")
    ap.add_argument("--no-play", action="store_true")
    ap.add_argument(
        "--no-stream", action="store_true",
        help="request non-progressive synthesis (latency comparison)",
    )
    args = ap.parse_args()

    text = " ".join(args.text) if args.text else sys.stdin.read().strip()
    if not text:
        ap.error("no input text (argument or stdin)")

    body = json.dumps(
        {
            "model": args.model,
            "input": text,
            "voice": args.voice,
            "speed": args.speed,
            "response_format": "pcm",
            "stream": not args.no_stream,
            "sample_rate": args.sample_rate,
        }
    ).encode()
    req = urllib.request.Request(
        args.url.rstrip("/") + "/v1/audio/speech",
        data=body,
        headers={"Content-Type": "application/json"},
    )

    player = None
    if not args.no_play:
        cmd = find_player(args.sample_rate)
        if cmd is None:
            print(
                "no audio player found (install sox/alsa-utils/ffmpeg); "
                "saving only",
                file=sys.stderr,
            )
        else:
            player = subprocess.Popen(cmd, stdin=subprocess.PIPE)

    pcm = bytearray()
    t0 = time.time()
    ttfp = None
    with urllib.request.urlopen(req) as resp:
        while True:
            chunk = resp.read(4096)
            if not chunk:
                break
            if ttfp is None:
                ttfp = time.time() - t0
            pcm.extend(chunk)
            if player is not None and player.stdin is not None:
                try:
                    player.stdin.write(chunk)
                    player.stdin.flush()
                except BrokenPipeError:
                    player = None
    e2e = time.time() - t0

    if player is not None and player.stdin is not None:
        player.stdin.close()
        player.wait()

    n_samples = len(pcm) // (BITS // 8)
    audio_s = n_samples / float(args.sample_rate)
    print(
        f"TTFP {1000 * (ttfp or e2e):.0f} ms | e2e {e2e:.2f} s | "
        f"audio {audio_s:.2f} s | RTF "
        f"{(e2e / audio_s) if audio_s else float('inf'):.3f}",
        file=sys.stderr,
    )

    if args.save:
        with open(args.save, "wb") as f:
            if args.save.endswith(".wav"):
                f.write(wav_header(n_samples, args.sample_rate))
            f.write(pcm)
        print(f"saved {args.save}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
