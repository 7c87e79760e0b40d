import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ht_vllm_omni_tpu.diffusion.vae_parallel import (
    patch_parallel_decode,
    tiled_decode,
)


def _decode(lat):
    """A conv-free stand-in decoder: 8x nearest upsample + channel mix."""
    up = jnp.repeat(jnp.repeat(lat, 8, axis=0), 8, axis=1)
    return jnp.tanh(up[..., :3])


def test_tiled_decode_matches_full():
    lat = jax.random.normal(jax.random.PRNGKey(0), (16, 8, 4))
    full = _decode(lat)
    tiled = tiled_decode(_decode, lat, tile_rows=4, overlap=2)
    np.testing.assert_allclose(tiled, full, atol=1e-6)


def test_patch_parallel_matches_full():
    lat = jax.random.normal(jax.random.PRNGKey(1), (16, 8, 4))
    full = _decode(lat)
    mesh = Mesh(np.array(jax.devices()[:4]), ("vae",))
    out = patch_parallel_decode(
        _decode, lat, mesh, "vae", overlap=2, upscale=8
    )
    np.testing.assert_allclose(out, full, atol=1e-6)
