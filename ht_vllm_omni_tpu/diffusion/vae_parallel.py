"""Patch-parallel (tiled) VAE decoding.

Counterpart of the reference's VAE patch parallelism (reference
vllm_omni/diffusion/distributed/vae_patch_parallel.py:71
_distributed_tiled_decode + distributed/autoencoders/): the latent image
is split into row tiles (with overlap for seam-free convs); each mesh
shard decodes its tiles and the result is all_gathered — on TPU this is a
shard_map over a "vae" axis instead of a gather to rank 0.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.utils import cdiv


def tiled_decode(
    decode_fn: Callable[[jax.Array], jax.Array],
    latents: jax.Array,  # [H, W, C]
    *,
    tile_rows: int,
    overlap: int = 0,
    upscale: int = 8,
) -> jax.Array:
    """Decode row tiles independently and stitch (single device)."""
    h = latents.shape[0]
    n_tiles = cdiv(h, tile_rows)
    outs = []
    for i in range(n_tiles):
        lo = max(0, i * tile_rows - overlap)
        hi = min(h, (i + 1) * tile_rows + overlap)
        tile = decode_fn(latents[lo:hi])
        top_trim = (i * tile_rows - lo) * upscale
        bot_trim = (hi - min(h, (i + 1) * tile_rows)) * upscale
        outs.append(
            tile[top_trim : tile.shape[0] - bot_trim
                 if bot_trim else tile.shape[0]]
        )
    return jnp.concatenate(outs, axis=0)


def patch_parallel_decode(
    decode_fn: Callable[[jax.Array], jax.Array],
    latents: jax.Array,  # [H, W, C], H divisible by the axis size
    mesh,
    axis: str,
    *,
    overlap: int = 0,
    upscale: int = 8,
) -> jax.Array:
    """Each shard decodes its row-band (plus halo); bands all_gather back.

    decode_fn must be jnp-traceable and map [h, W, C] -> [h*upscale, ...].
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    size = mesh.shape[axis]
    h = latents.shape[0]
    assert h % size == 0, (h, size)
    band = h // size

    def run(lat_local):
        # fetch halo rows from neighbours via a gathered copy (halo is
        # tiny; a ppermute exchange is the optimisation for big overlaps)
        idx = jax.lax.axis_index(axis)
        full = jax.lax.all_gather(lat_local, axis, axis=0, tiled=True)
        lo = jnp.maximum(idx * band - overlap, 0)
        start = jnp.minimum(lo, h - (band + 2 * overlap))
        window = jax.lax.dynamic_slice_in_dim(
            full, start, band + 2 * overlap, axis=0
        )
        decoded = decode_fn(window)
        off = (idx * band - start) * upscale
        mine = jax.lax.dynamic_slice_in_dim(
            decoded, off, band * upscale, axis=0
        )
        return jax.lax.all_gather(mine, axis, axis=0, tiled=True)

    return jax.jit(
        shard_map(
            run,
            mesh=mesh,
            in_specs=(P(axis),),
            out_specs=P(),
            check_vma=False,
        )
    )(latents)
