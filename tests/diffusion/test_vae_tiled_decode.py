"""Tiled VAE decode (diffusers enable_tiling parity) — seam-blended
single-chip decode for large frames."""

import jax
import numpy as np

from ht_vllm_omni_tpu.diffusion.models.qwen_image import vae
from ht_vllm_omni_tpu.diffusion.models.qwen_image.config import (
    QwenImageVAEConfig,
)


def _small_cfg():
    return QwenImageVAEConfig(
        base_dim=16,
        z_dim=4,
        dim_mult=(1, 2),
        num_res_blocks=1,
    )


def test_tiled_matches_full_decode():
    cfg = _small_cfg()
    params = vae.init_params(cfg, jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 24, 24, cfg.z_dim))
    full = np.asarray(vae.decode(cfg, params, z))
    tiled = np.asarray(
        vae.decode_tiled(cfg, params, z, tile=16, overlap=4)
    )
    assert tiled.shape == full.shape
    assert np.isfinite(tiled).all()
    # the mid-block attention is global, so tiles are an approximation;
    # without attention scales in this config the interior should agree
    # closely and the seam bands stay bounded
    diff = np.abs(tiled - full)
    assert np.median(diff) < 2e-2, np.median(diff)
    assert diff.mean() < 0.1, diff.mean()


def test_tiled_small_passthrough():
    cfg = _small_cfg()
    params = vae.init_params(cfg, jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, cfg.z_dim))
    full = np.asarray(vae.decode(cfg, params, z))
    tiled = np.asarray(vae.decode_tiled(cfg, params, z, tile=16))
    np.testing.assert_array_equal(tiled, full)


def test_tiled_non_square():
    # one dimension under the tile size must not produce negative tile
    # starts (regression: 64x24 latents crashed the blend)
    cfg = _small_cfg()
    params = vae.init_params(cfg, jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 40, 12, cfg.z_dim))
    tiled = np.asarray(
        vae.decode_tiled(cfg, params, z, tile=16, overlap=4)
    )
    full = np.asarray(vae.decode(cfg, params, z))
    assert tiled.shape == full.shape
    assert np.isfinite(tiled).all()
    assert np.median(np.abs(tiled - full)) < 6e-2
