"""Codec vocoder: causality, chunk-streaming consistency, TTS pipeline."""

import numpy as np

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.models.tts.code2wav import (
    Code2WavConfig,
    Code2WavModel,
    forward,
    init_params,
)


def _cfg():
    return Code2WavConfig(
        vocab_size=64, channels=32, num_blocks=3, hop=16, sample_rate=8000
    )


def test_forward_shapes_and_range():
    cfg = _cfg()
    params = init_params(cfg, jax.random.PRNGKey(0))
    wave = forward(cfg, params, jnp.arange(10, dtype=jnp.int32))
    assert wave.shape == (10 * cfg.hop,)
    assert float(jnp.abs(wave).max()) <= 1.0


def test_causality():
    """Changing a later token must not affect earlier samples."""
    cfg = _cfg()
    params = init_params(cfg, jax.random.PRNGKey(0))
    a = np.asarray(forward(cfg, params, jnp.asarray([1, 2, 3, 4, 5])))
    b = np.asarray(forward(cfg, params, jnp.asarray([1, 2, 3, 9, 9])))
    np.testing.assert_array_equal(a[: 3 * cfg.hop], b[: 3 * cfg.hop])
    assert np.any(a[3 * cfg.hop:] != b[3 * cfg.hop:])


def test_chunked_streaming_matches_full():
    """Chunks with left_context >= receptive field reproduce the full
    waveform exactly — the async-chunk contract."""
    cfg = _cfg()
    model = Code2WavModel(cfg)
    tokens = list(np.random.default_rng(0).integers(0, 64, size=40))
    full = model(tokens, None, {}, {})["audio"]

    left = cfg.receptive_field  # 15 frames
    window = 10
    out = []
    sent = 0
    while sent < len(tokens):
        take = min(window, len(tokens) - sent)
        start = max(0, sent - left)
        chunk_tokens = tokens[start: sent + take]
        piece = model(
            chunk_tokens, None,
            {"new_tokens": take, "left_context": sent - start}, {},
        )["audio"]
        out.append(piece)
        sent += take
    streamed = np.concatenate(out)
    np.testing.assert_allclose(streamed, full, atol=1e-6)


def test_qwen3_tts_pipeline_yaml_loads():
    from ht_vllm_omni_tpu.config.stage_config import (
        builtin_pipeline_path,
        load_pipeline_config,
    )

    cfg = load_pipeline_config(builtin_pipeline_path("qwen3_tts"))
    assert cfg.model_type == "qwen3_tts" and cfg.async_chunk
    assert cfg.stage(1).model_stage == "code2wav"
    assert cfg.edge(0, 1).window_size == 25
