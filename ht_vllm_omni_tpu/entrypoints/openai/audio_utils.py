"""Audio byte-stream helpers for progressive TTS serving.

Rebuilds the reference's streaming-chunker details (reference
vllm_omni/entrypoints/openai/serving_speech.py:952-1012): float waveform
chunks -> 16-bit PCM; for WAV, a single riff header with an unknown
(0xFFFFFFFF) data length is emitted before the first chunk so clients can
play while bytes stream.
"""

from __future__ import annotations

import struct

import numpy as np

UNKNOWN_SIZE = 0xFFFFFFFF


def float_to_pcm16(audio: np.ndarray) -> bytes:
    clipped = np.clip(np.asarray(audio, dtype=np.float32), -1.0, 1.0)
    return (clipped * 32767.0).astype("<i2").tobytes()


def wav_header(
    sample_rate: int,
    num_channels: int = 1,
    bits_per_sample: int = 16,
    data_size: int = UNKNOWN_SIZE,
) -> bytes:
    byte_rate = sample_rate * num_channels * bits_per_sample // 8
    block_align = num_channels * bits_per_sample // 8
    riff_size = (
        UNKNOWN_SIZE if data_size == UNKNOWN_SIZE else 36 + data_size
    )
    return b"".join(
        [
            b"RIFF",
            struct.pack("<I", riff_size),
            b"WAVE",
            b"fmt ",
            struct.pack(
                "<IHHIIHH",
                16, 1, num_channels, sample_rate, byte_rate, block_align,
                bits_per_sample,
            ),
            b"data",
            struct.pack("<I", data_size),
        ]
    )
