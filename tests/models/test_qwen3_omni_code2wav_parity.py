"""HF-parity: jax Qwen3-Omni Code2Wav vs transformers, tiny-random."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ht_vllm_omni_tpu.models.qwen3_omni import code2wav as c2w


def _tiny():
    from transformers.models.qwen3_omni_moe.configuration_qwen3_omni_moe import (
        Qwen3OmniMoeCode2WavConfig,
    )
    from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe import (
        Qwen3OmniMoeCode2Wav,
    )

    kw = dict(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=64,
        sliding_window=8,
        codebook_size=32,
        num_quantizers=4,
        upsampling_ratios=[2],
        upsample_rates=[4, 3],
        decoder_dim=16,
    )
    hf_cfg = Qwen3OmniMoeCode2WavConfig(**kw)
    torch.manual_seed(31)
    hf = Qwen3OmniMoeCode2Wav(hf_cfg).eval()
    # transformers initialises SnakeBeta params to zeros*alpha = 0 which
    # makes the activation near-identity; randomise them so the test
    # actually exercises the nonlinearity
    with torch.no_grad():
        for name, p in hf.named_parameters():
            if name.endswith((".alpha", ".beta", ".gamma")):
                p.copy_(torch.randn_like(p) * 0.2)
    cfg = c2w.Code2WavConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=64, sliding_window=8,
        codebook_size=32, num_quantizers=4, upsampling_ratios=(2,),
        upsample_rates=(4, 3), decoder_dim=16,
        rms_norm_eps=hf_cfg.rms_norm_eps, rope_theta=hf_cfg.rope_theta,
        layer_scale_initial_scale=hf_cfg.layer_scale_initial_scale,
    )
    params = c2w.load_hf_state(cfg, hf.state_dict())
    return hf, cfg, params


def test_code2wav_matches_hf():
    hf, cfg, params = _tiny()
    rng = np.random.default_rng(13)
    t = 12
    codes = rng.integers(0, 32, size=(4, t)).astype(np.int64)

    with torch.no_grad():
        want = hf(torch.from_numpy(codes)[None])[0, 0].numpy()

    got = np.asarray(c2w.decode(cfg, params, codes.astype(np.int32)))
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_chunked_decode_matches_hf_chunked():
    hf, cfg, params = _tiny()
    rng = np.random.default_rng(17)
    codes = rng.integers(0, 32, size=(4, 30)).astype(np.int64)
    with torch.no_grad():
        want = hf.chunked_decode(
            torch.from_numpy(codes)[None], chunk_size=10,
            left_context_size=4,
        )[0, 0].numpy()
    got = c2w.chunked_decode(
        cfg, params, codes.astype(np.int32), chunk_size=10,
        left_context_size=4,
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)
