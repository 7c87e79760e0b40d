"""Golden parity: jax DAC decoder vs HF transformers DacModel."""

import numpy as np
import pytest

import jax.numpy as jnp

from ht_vllm_omni_tpu.models.fish_speech import dac_decoder

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def test_dac_decode_matches_hf():
    hf_cfg = transformers.DacConfig(
        encoder_hidden_size=16, downsampling_ratios=[2, 4],
        decoder_hidden_size=16, n_codebooks=4, codebook_size=32,
        codebook_dim=6, sampling_rate=16000,
    )
    hf = transformers.DacModel(hf_cfg).eval().to(torch.float32)
    cfg = dac_decoder.config_from_hf(hf_cfg)
    assert cfg.upsampling_ratios == (4, 2)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = dac_decoder.load_hf_params(cfg, sd)

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 32, size=(2, 4, 11), dtype=np.int64)

    with torch.no_grad():
        z_ref = hf.quantizer.from_codes(torch.from_numpy(codes))[0]
        audio_ref = hf.decoder(z_ref).numpy()  # [B, 1, T*hop] or [B, T*hop]

    z = dac_decoder.from_codes(cfg, params, jnp.asarray(codes))
    np.testing.assert_allclose(
        np.asarray(z).transpose(0, 2, 1),
        z_ref.numpy(),
        rtol=1e-4, atol=1e-4,
    )
    audio = dac_decoder.decode(cfg, params, jnp.asarray(codes))
    np.testing.assert_allclose(
        np.asarray(audio), audio_ref.squeeze(1), rtol=1e-3, atol=1e-4
    )
    assert audio.shape == (2, 11 * cfg.hop_length)
