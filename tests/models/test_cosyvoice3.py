"""CosyVoice3 family: STFT/ISTFT parity vs torch, CFM flow shapes,
HiFT decode, pipeline e2e."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.models.cosyvoice3 import flow, hifigan
from ht_vllm_omni_tpu.models.cosyvoice3.config import (
    CosyVoice3Config,
    FlowConfig,
    HiftConfig,
)


def test_stft_istft_matches_torch():
    torch = pytest.importorskip("torch")
    n_fft, hop = 16, 4
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 128)).astype(np.float32)

    re, im = hifigan.stft(jnp.asarray(x), n_fft, hop)
    win = torch.hann_window(n_fft, periodic=True)
    spec = torch.stft(
        torch.from_numpy(x), n_fft, hop, n_fft, window=win,
        return_complex=True,
    )
    np.testing.assert_allclose(
        np.asarray(re), spec.real.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(im), spec.imag.numpy(), rtol=1e-4, atol=1e-5
    )

    y = hifigan.istft(re, im, n_fft, hop)
    y_ref = torch.istft(spec, n_fft, hop, n_fft, window=win).numpy()
    np.testing.assert_allclose(
        np.asarray(y)[:, : y_ref.shape[1]], y_ref, rtol=1e-4, atol=1e-5
    )
    # and the round trip reproduces the signal
    np.testing.assert_allclose(
        np.asarray(y)[:, : x.shape[1]], x, rtol=1e-4, atol=1e-4
    )


def test_flow_token2mel_shapes_and_determinism():
    cfg = FlowConfig.tiny()
    params = flow.init_params(cfg, jax.random.PRNGKey(0))
    toks = jnp.asarray([[1, 5, 9, 3]], jnp.int32)
    spk = jnp.zeros((1, cfg.spk_embed_dim))
    mel = flow.token2mel(cfg, params, toks, spk, jax.random.PRNGKey(1))
    assert mel.shape == (1, 4 * cfg.token_mel_ratio, cfg.output_size)
    mel2 = flow.token2mel(cfg, params, toks, spk, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(mel), np.asarray(mel2))
    # speaker conditioning changes the mel
    mel3 = flow.token2mel(
        cfg, params, toks, spk + 1.0, jax.random.PRNGKey(1)
    )
    assert not np.allclose(np.asarray(mel), np.asarray(mel3))


def test_hift_decode_shapes():
    cfg = HiftConfig.tiny()
    params = hifigan.init_params(cfg, jax.random.PRNGKey(0))
    mel = jax.random.normal(
        jax.random.PRNGKey(1), (1, 12, cfg.in_channels)
    )
    wav = hifigan.mel_to_wav(cfg, params, mel, jax.random.PRNGKey(2))
    assert wav.shape[0] == 1
    # total upsample = prod(rates) * hop = 2*2*4 = 16 per mel frame
    assert abs(wav.shape[1] - 12 * cfg.total_upsample) <= cfg.istft_n_fft
    w = np.asarray(wav)
    assert np.isfinite(w).all() and np.abs(w).max() <= cfg.audio_limit


def test_code2wav_model_adapter():
    from ht_vllm_omni_tpu.models.cosyvoice3.code2wav_model import (
        CosyVoice3Code2WavModel,
    )

    model = CosyVoice3Code2WavModel(CosyVoice3Config.tiny())
    out = model([1, 2, 3, 4], None, {"left_context": 1}, {})
    assert "audio" in out and len(out["audio"]) > 0
    per_tok = (
        model.cfg.flow.token_mel_ratio * model.cfg.hift.total_upsample
    )
    # left context trimmed: 3 of 4 tokens remain (within istft edge slack)
    assert abs(len(out["audio"]) - 3 * per_tok) <= model.cfg.hift.istft_n_fft


def test_pipeline_e2e_streaming_audio():
    from ht_vllm_omni_tpu.config.stage_config import (
        builtin_pipeline_path,
        load_pipeline_config,
    )
    from ht_vllm_omni_tpu.engine.stage_factory import build_stages
    from ht_vllm_omni_tpu.entrypoints.omni import Omni
    from ht_vllm_omni_tpu.sampling_params import SamplingParams

    cfg = load_pipeline_config(builtin_pipeline_path("cosyvoice3"))
    st0 = cfg.stage(0)
    st0.engine_args["model_arch_config"] = dict(
        model_type="qwen2", vocab_size=68, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, dtype="float32", tie_word_embeddings=True,
        eos_token_id=65,
    )
    st0.engine_args["num_pages"] = 64
    cfg.stage(1).engine_args["code2wav"] = dict(
        flow=dict(
            vocab_size=64, input_size=16, output_size=8, spk_embed_dim=8,
            dit_hidden=16, dit_layers=2, dit_heads=2, n_timesteps=2,
        ),
        hift=dict(
            in_channels=8, base_channels=16, nb_harmonics=2,
            upsample_rates=[2, 2], upsample_kernel_sizes=[4, 4],
            resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3]],
            source_resblock_kernel_sizes=[3, 3],
            source_resblock_dilation_sizes=[[1], [1]],
        ),
    )
    omni = Omni(pipeline=cfg, stages=build_stages(cfg))
    sp = SamplingParams(
        temperature=0.0, max_tokens=30, ignore_eos=True,
        allowed_token_range=(0, 64),
    )
    outs = omni.generate([[3, 7, 11]], sp)
    audio = outs[0].consolidated_multimodal("audio")
    assert audio is not None and len(audio) > 0
    assert np.isfinite(np.asarray(audio, np.float32)).all()
