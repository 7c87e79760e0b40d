"""HF-parity: jax Qwen3-Omni audio encoder vs transformers, tiny-random.

Mirrors the golden-test pattern of tests/models/test_qwen2_vs_hf.py: the
transformers implementation is the numerics oracle; weights transfer via
load_hf_state."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ht_vllm_omni_tpu.models.qwen3_omni import audio_encoder as ae


def _tiny():
    from transformers.models.qwen3_omni_moe.configuration_qwen3_omni_moe import (
        Qwen3OmniMoeAudioEncoderConfig,
    )
    from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe import (
        Qwen3OmniMoeAudioEncoder,
    )

    hf_cfg = Qwen3OmniMoeAudioEncoderConfig(
        num_mel_bins=32,
        d_model=64,
        encoder_layers=2,
        encoder_attention_heads=4,
        encoder_ffn_dim=128,
        downsample_hidden_size=16,
        output_dim=48,
        n_window=8,
        n_window_infer=32,
        max_source_positions=128,
        conv_chunksize=500,
    )
    torch.manual_seed(7)
    hf = Qwen3OmniMoeAudioEncoder(hf_cfg).eval()
    cfg = ae.AudioEncoderConfig(
        num_mel_bins=32, d_model=64, encoder_layers=2,
        encoder_attention_heads=4, encoder_ffn_dim=128,
        downsample_hidden_size=16, output_dim=48, n_window=8,
        n_window_infer=32, max_source_positions=128,
    )
    params = ae.load_hf_state(cfg, hf.state_dict())
    return hf, cfg, params


@pytest.mark.parametrize("t_frames", [48, 40, 33])
def test_audio_encoder_matches_hf(t_frames):
    hf, cfg, params = _tiny()
    rng = np.random.default_rng(3)
    mel = rng.standard_normal((32, t_frames), dtype=np.float32)

    with torch.no_grad():
        want = hf(
            torch.from_numpy(mel),
            feature_lens=torch.tensor([t_frames]),
        ).last_hidden_state.numpy()

    chunk = cfg.chunk_frames
    t_pad = ((t_frames + chunk - 1) // chunk) * chunk
    mel_pad = np.zeros((32, t_pad), np.float32)
    mel_pad[:, :t_frames] = mel
    got, out_len = ae.forward(cfg, params, mel_pad, np.int32(t_frames))
    got = np.asarray(got)[: int(out_len)]

    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, atol=6e-4, rtol=3e-3)
