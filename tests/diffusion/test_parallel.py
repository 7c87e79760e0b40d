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


def test_uaa_uneven_heads_and_sequence():
    """Ulysses-Anything (sp_ulysses.ulysses_attention_uneven): 6 heads
    on sp=4 (head padding) and a 50-token sequence padded to 52 (tail
    KV rows masked via kv_lens) must match local attention exactly at
    the valid positions — reference ulysses.py:52-104."""
    from ht_vllm_omni_tpu.diffusion.distributed.sp_ulysses import (
        ulysses_attention_uneven,
    )

    sp = 4
    heads, s_valid, d = 6, 50, 32
    s_pad = ((s_valid + sp - 1) // sp) * sp  # 52
    mesh = Mesh(np.array(jax.devices()[:sp]), ("sp",))
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (heads, s_valid, d), jnp.float32)
    k = jax.random.normal(ks[1], (heads, s_valid, d), jnp.float32)
    v = jax.random.normal(ks[2], (heads, s_valid, d), jnp.float32)
    ref = flash_attention(q[None], k[None], v[None], causal=False)[0]

    def padseq(x):
        return jnp.pad(x, ((0, 0), (0, s_pad - s_valid), (0, 0)))

    def run(q, k, v):
        return ulysses_attention_uneven(
            q, k, v, axis="sp", sp_size=sp, valid_len=s_valid
        )

    out = jax.jit(
        shard_map(
            run, mesh=mesh,
            in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp")),
            out_specs=P(None, "sp"),
            check_vma=False,
        )
    )(padseq(q), padseq(k), padseq(v))
    np.testing.assert_allclose(
        out[:, :s_valid], ref, atol=2e-5, rtol=2e-5
    )


def test_uaa_joint_text_prefix():
    """Joint text/image stream: a replicated text prefix joins the
    gathered image sequence as context (reference ulysses.py:219-287);
    must equal local attention over [text || image] KV with image
    queries."""
    from ht_vllm_omni_tpu.diffusion.distributed.sp_ulysses import (
        ulysses_attention_uneven,
    )

    sp = 4
    heads, s_img, t_txt, d = 8, 64, 13, 32
    mesh = Mesh(np.array(jax.devices()[:sp]), ("sp",))
    ks = jax.random.split(jax.random.PRNGKey(5), 5)
    q = jax.random.normal(ks[0], (heads, s_img, d), jnp.float32)
    k = jax.random.normal(ks[1], (heads, s_img, d), jnp.float32)
    v = jax.random.normal(ks[2], (heads, s_img, d), jnp.float32)
    tk = jax.random.normal(ks[3], (heads, t_txt, d), jnp.float32)
    tv = jax.random.normal(ks[4], (heads, t_txt, d), jnp.float32)
    k_all = jnp.concatenate([tk, k], axis=1)
    v_all = jnp.concatenate([tv, v], axis=1)
    ref = flash_attention(
        q[None], k_all[None], v_all[None], causal=False
    )[0]

    def run(q, k, v, tk, tv):
        return ulysses_attention_uneven(
            q, k, v, axis="sp", sp_size=sp, text_kv=(tk, tv)
        )

    out = jax.jit(
        shard_map(
            run, mesh=mesh,
            in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp"),
                      P(), P()),
            out_specs=P(None, "sp"),
            check_vma=False,
        )
    )(q, k, v, tk, tv)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)
