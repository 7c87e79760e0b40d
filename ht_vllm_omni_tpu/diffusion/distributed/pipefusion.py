"""PipeFusion: DiT pipeline parallelism over a "pp" mesh axis.

Counterpart of the reference's diffusion pipeline parallelism (reference
vllm_omni/diffusion/distributed/group_coordinator.py:548,623 —
``pipeline_parallel_size`` + ``num_pipefusion_patches``), i.e. the xDiT
displaced-patch pipeline: transformer layers shard over pp stages, the
image token sequence splits into pp patches, and patches flow through
the stages in a software pipeline.  Cross-patch attention context comes
from the PREVIOUS denoise step's K/V (one-step staleness — the
PipeFusion approximation, which converges because diffusion features
change slowly between adjacent steps), while a patch's own K/V is always
fresh.  The FIRST step runs as a full-sequence ring wave (exact
forward, 1/pp utilization) that fills the caches — the reference's
warmup step.

TPU expression: the whole denoise loop lives inside one
jit(shard_map(...)) over the ("cfg", "pp") axes; activations hop stages
with a single ring ``lax.ppermute`` per micro-round and the per-stage
K/V caches ride ``lax.fori_loop`` carries — no host involvement inside
the loop.  Joint text-conditioning tokens travel with every patch
bundle (they are short), so block math matches the single-device DiT
exactly up to the documented cross-patch staleness.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.diffusion.models import dit
from ht_vllm_omni_tpu.models.layers import rms_norm
from ht_vllm_omni_tpu.ops.flash_attention import flash_attention


def _layer(cfg, lp, bundle, t_vec, s_txt, kv_stale=None, patch_off=0):
    """One DiT block over a [S_txt + S_p, H] bundle.

    kv_stale: [S_img, 2F] previous-step image K/V; the bundle's image
    rows substitute their FRESH k/v at ``patch_off`` before attention
    (displaced-patch context).  None = the bundle is the whole joint
    sequence (warmup: exact self-attention).

    Returns (bundle_out, kv_own [S_p, 2F] fresh image rows).
    Math mirrors diffusion/models/dit.forward's block."""
    dt = bundle.dtype
    heads = cfg.num_heads
    hd = cfg.head_dim
    h = cfg.hidden_size

    mods = jnp.dot(jax.nn.silu(t_vec), lp["ada"]) + lp["ada_b"]
    sh1, sc1, g1, sh2, sc2, g2 = jnp.split(mods, 6)
    xn = rms_norm(bundle, lp["norm_scale"], 1e-6)
    xm = xn * (1 + sc1.astype(dt)) + sh1.astype(dt)
    qkv = jnp.dot(
        xm, lp["wqkv"], preferred_element_type=jnp.float32
    ).astype(dt)
    q, k_own, v_own = jnp.split(qkv, 3, axis=-1)

    if kv_stale is None:
        k_ctx, v_ctx = k_own, v_own
    else:
        k_img = jax.lax.dynamic_update_slice_in_dim(
            kv_stale[:, :h].astype(dt), k_own[s_txt:], patch_off, 0
        )
        v_img = jax.lax.dynamic_update_slice_in_dim(
            kv_stale[:, h:].astype(dt), v_own[s_txt:], patch_off, 0
        )
        k_ctx = jnp.concatenate([k_own[:s_txt], k_img], axis=0)
        v_ctx = jnp.concatenate([v_own[:s_txt], v_img], axis=0)

    def to_heads(a):
        return a.reshape(a.shape[0], heads, hd).transpose(1, 0, 2)[None]

    o = flash_attention(
        to_heads(q), to_heads(k_ctx), to_heads(v_ctx), causal=False
    )
    o = o[0].transpose(1, 0, 2).reshape(bundle.shape[0], h)
    attn = jnp.dot(
        o, lp["wo"], preferred_element_type=jnp.float32
    ).astype(dt)
    bundle = bundle + g1.astype(dt) * attn
    xn = rms_norm(bundle, lp["norm_scale"], 1e-6)
    xm = xn * (1 + sc2.astype(dt)) + sh2.astype(dt)
    mlp = jnp.dot(
        xm, lp["mlp_in"], preferred_element_type=jnp.float32
    ).astype(dt)
    mlp = jnp.dot(
        jax.nn.gelu(mlp), lp["mlp_out"],
        preferred_element_type=jnp.float32,
    ).astype(dt)
    bundle = bundle + g2.astype(dt) * mlp
    kv_own = jnp.concatenate([k_own[s_txt:], v_own[s_txt:]], axis=-1)
    return bundle, kv_own


def _head(cfg, params, bundle, t_vec, s_txt):
    """Final adaLN head -> velocity for the bundle's image rows."""
    dt = bundle.dtype
    h = cfg.hidden_size
    mods = jnp.dot(jax.nn.silu(t_vec), params["final_ada"]) + (
        params["final_ada_b"]
    )
    shf, scf = jnp.split(mods, 2)
    xn = rms_norm(bundle, jnp.ones((h,), dt), 1e-6)
    xm = xn * (1 + scf.astype(dt)) + shf.astype(dt)
    out = jnp.dot(
        xm, params["final_out"], preferred_element_type=jnp.float32
    )
    return out[s_txt:]


def _embed(cfg, params, tokens, cond):
    """Patchified latent tokens + cond embeds -> [S_txt + S, H]."""
    dt = jnp.dtype(cfg.dtype)
    x = jnp.dot(
        tokens.astype(dt), params["patch_in"],
        preferred_element_type=jnp.float32,
    ).astype(dt) + params["patch_in_b"]
    c = jnp.dot(
        cond.astype(dt), params["cond_proj"],
        preferred_element_type=jnp.float32,
    ).astype(dt)
    return jnp.concatenate([c, x], axis=0)


def _tvec(cfg, params, t):
    t_emb = dit.timestep_embedding(t, 256)
    t_vec = jnp.dot(t_emb, params["t_mlp1"])
    return jnp.dot(jax.nn.silu(t_vec), params["t_mlp2"])


def pipefusion_denoise(
    cfg,
    sigmas,  # [num_steps + 1] f32 schedule
    pp: int,
    pp_axis: str,
    cfg_axis: str | None,
    num_steps: int,
    s_img: int,  # image token count (divisible by pp)
    s_txt: int,
):
    """Build the per-shard denoise body (inside shard_map over
    (cfg, pp)):

        fn(layer_params_local, shared_params, tokens, cond_branch,
           gscale, start, count) -> tokens_out
    """
    from ht_vllm_omni_tpu.diffusion.distributed.cfg_parallel import (
        cfg_combine,
    )

    s_p = s_img // pp
    h = cfg.hidden_size
    c_out = cfg.in_channels * cfg.patch_size**2
    perm = [(i, (i + 1) % pp) for i in range(pp)]

    def run(lp_local, shared, tokens, cond_b, gscale, start, count):
        dt = jnp.dtype(cfg.dtype)
        s = jax.lax.axis_index(pp_axis)
        l_loc = lp_local["wqkv"].shape[0]
        cond = cond_b[0]

        def ring(a):
            return jax.lax.ppermute(a, pp_axis, perm)

        def bcast_from(val, pred):
            return jax.lax.psum(
                jnp.where(pred, val, jnp.zeros_like(val)), pp_axis
            )

        def scan_layers(bundle, t_vec, kv_prev, kv_acc, patch_off,
                        warm):
            """This stage's local layers over one bundle; fresh image
            K/V rows land in kv_acc at patch_off."""

            def body(carry, lp_row):
                b, acc, li = carry
                stale = (
                    None if warm
                    else jax.lax.dynamic_index_in_dim(
                        kv_prev, li, axis=0, keepdims=False
                    )
                )
                b2, kv_own = _layer(
                    cfg, lp_row, b, t_vec, s_txt,
                    kv_stale=stale, patch_off=patch_off,
                )
                acc = jax.lax.dynamic_update_slice(
                    acc, kv_own[None], (li, patch_off, 0)
                )
                return (b2, acc, li + 1), None

            (b, acc, _), _ = jax.lax.scan(
                body, (bundle, kv_acc, jnp.int32(0)), lp_local
            )
            return b, acc

        def warm_step(x_tok, t, kv_prev):
            """Full-sequence ring wave: exact forward + cache fill."""
            t_vec = _tvec(cfg, shared, t)
            bundle0 = _embed(cfg, shared, x_tok, cond)
            kv = kv_prev

            def rnd(rr, carry):
                b, kv = carry
                b2, kv2 = scan_layers(b, t_vec, kv, kv, 0, True)
                mine = s == rr
                kv = jnp.where(mine, kv2, kv)
                b = jnp.where(mine, b2, b)
                return ring(b), kv

            b, kv = jax.lax.fori_loop(0, pp, rnd, (bundle0, kv))
            v = _head(cfg, shared, b, t_vec, s_txt)  # true b on stage 0
            return bcast_from(v, s == 0), kv

        def pipe_step(x_tok, t, kv_prev):
            """Displaced-patch pipeline: 2*pp - 1 micro-rounds; stage s
            handles patch (r - s); cross-patch context is kv_prev."""
            t_vec = _tvec(cfg, shared, t)
            kv_cur = kv_prev
            vel = jnp.zeros((s_img, c_out), jnp.float32)
            ring0 = jnp.zeros((s_txt + s_p, h), dt)

            def rnd(r, carry):
                ring_b, kv_cur, vel = carry
                m = r - s
                valid = jnp.logical_and(m >= 0, m < pp)
                patch_off = jnp.clip(m, 0, pp - 1) * s_p
                patch_tok = jax.lax.dynamic_slice_in_dim(
                    x_tok, patch_off, s_p, 0
                )
                entry = _embed(cfg, shared, patch_tok, cond)
                b_in = jnp.where(s == 0, entry, ring_b)
                b2, kv2 = scan_layers(
                    b_in, t_vec, kv_prev, kv_cur, patch_off, False
                )
                kv_cur = jnp.where(valid, kv2, kv_cur)
                vp = _head(cfg, shared, b2, t_vec, s_txt)
                write = jnp.logical_and(valid, s == pp - 1)
                vel = jnp.where(
                    write,
                    jax.lax.dynamic_update_slice(vel, vp, (patch_off, 0)),
                    vel,
                )
                return ring(b2), kv_cur, vel

            _rb, kv_cur, vel = jax.lax.fori_loop(
                0, 2 * pp - 1, rnd, (ring0, kv_cur, vel)
            )
            return bcast_from(vel, s == pp - 1), kv_cur

        def step_body(i, carry):
            x_tok, kv = carry
            t = 1000.0 * jnp.take(
                sigmas, jnp.clip(i, 0, num_steps - 1)
            ).astype(jnp.float32)
            v, kv = jax.lax.cond(
                i == start,
                lambda xt, kvv: warm_step(xt, t, kvv),
                lambda xt, kvv: pipe_step(xt, t, kvv),
                x_tok, kv,
            )
            if cfg_axis is not None:
                v = cfg_combine(v, gscale, axis=cfg_axis)
            d_sig = jnp.take(sigmas, i + 1) - jnp.take(sigmas, i)
            x_tok = x_tok + d_sig * v.astype(x_tok.dtype)
            return x_tok, kv

        kv0 = jnp.zeros((l_loc, s_img, 2 * h), dt)
        x_out, _ = jax.lax.fori_loop(
            start, jnp.minimum(start + count, num_steps), step_body,
            (tokens, kv0),
        )
        return x_out

    return run
