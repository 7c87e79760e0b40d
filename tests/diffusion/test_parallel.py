"""Ulysses SP + CFG parallel on the virtual CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ht_vllm_omni_tpu.diffusion.distributed.cfg_parallel import cfg_combine
from ht_vllm_omni_tpu.diffusion.distributed.sp_ulysses import (
    ulysses_attention,
)
from ht_vllm_omni_tpu.ops.flash_attention import flash_attention


def test_ulysses_matches_local_attention():
    sp = 4
    heads, s, d = 8, 64, 32
    mesh = Mesh(np.array(jax.devices()[:sp]), ("sp",))
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (heads, s, d), jnp.float32)
    k = jax.random.normal(ks[1], (heads, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (heads, s, d), jnp.float32)

    ref = flash_attention(q[None], k[None], v[None], causal=False)[0]

    def run(q, k, v):
        return ulysses_attention(q, k, v, axis="sp", sp_size=sp)

    out = jax.jit(
        shard_map(
            run,
            mesh=mesh,
            in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp")),
            out_specs=P(None, "sp"),
            check_vma=False,
        )
    )(q, k, v)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_cfg_combine_across_shards():
    mesh = Mesh(np.array(jax.devices()[:2]), ("cfg",))
    v_cond = jnp.full((4, 8), 2.0)
    v_uncond = jnp.full((4, 8), 1.0)
    stacked = jnp.stack([v_cond, v_uncond])  # shard 0 cond, shard 1 uncond
    scale = jnp.float32(5.0)

    def run(v):
        return cfg_combine(v[0], scale, axis="cfg")[None]

    out = jax.jit(
        shard_map(
            run,
            mesh=mesh,
            in_specs=(P("cfg"),),
            out_specs=P("cfg"),
            check_vma=False,
        )
    )(stacked)
    want = 1.0 + 5.0 * (2.0 - 1.0)
    np.testing.assert_allclose(out[0], np.full((4, 8), want))
    np.testing.assert_allclose(out[1], np.full((4, 8), want))
