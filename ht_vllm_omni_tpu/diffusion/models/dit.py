"""Generic DiT transformer in pure jax (adaLN-zero blocks).

The architectural skeleton shared by the reference's image DiTs
(qwen_image / flux / sd3 transformers, reference
vllm_omni/diffusion/models/*/transformer_*.py): patchified latents +
text-cond tokens run through joint self-attention blocks modulated by the
timestep embedding (adaLN-zero); final layer projects back to patch
pixels.  Layers are stacked and scanned like the AR models; attention
reuses the Pallas flash kernel (non-causal).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.diffusion.data import DiTArchConfig
from ht_vllm_omni_tpu.models.layers import rms_norm
from ht_vllm_omni_tpu.ops.flash_attention import flash_attention


def _dt(cfg):
    return jnp.dtype(cfg.dtype)


def timestep_embedding(t: jax.Array, dim: int) -> jax.Array:
    """Sinusoidal embedding of (continuous) timesteps; t scalar or [B]."""
    half = dim // 2
    freqs = jnp.exp(
        -jnp.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = jnp.asarray(t, jnp.float32)[..., None] * freqs
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def init_params(cfg: DiTArchConfig, key: jax.Array) -> dict:
    dt = _dt(cfg)
    h = cfg.hidden_size
    p = cfg.patch_size
    keys = iter(jax.random.split(key, 24))

    def w(k, shape, scale=None):
        scale = scale or shape[-2] ** -0.5 if len(shape) > 1 else 0.02
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dt)

    nl = cfg.num_layers
    return {
        "patch_in": w(next(keys), (cfg.in_channels * p * p, h), 0.02),
        "patch_in_b": jnp.zeros((h,), dt),
        "cond_embed": w(next(keys), (cfg.vocab_size, h), 0.02),
        "cond_proj": w(next(keys), (cfg.cond_dim, h), 0.02),
        "t_mlp1": w(next(keys), (256, h), 0.02),
        "t_mlp2": w(next(keys), (h, h)),
        # per-block (stacked [L, ...])
        "ada": w(next(keys), (nl, h, 6 * h), 0.0),  # adaLN-zero: init 0
        "ada_b": jnp.zeros((nl, 6 * h), dt),
        "wqkv": w(next(keys), (nl, h, 3 * h)),
        "wo": w(next(keys), (nl, h, h)),
        "mlp_in": w(next(keys), (nl, h, 4 * h)),
        "mlp_out": w(next(keys), (nl, 4 * h, h)),
        "norm_scale": jnp.ones((nl, h), dt),
        # final
        "final_ada": w(next(keys), (h, 2 * h), 0.0),
        "final_ada_b": jnp.zeros((2 * h,), dt),
        "final_out": w(next(keys), (h, cfg.in_channels * p * p), 0.0),
    }


def patchify(cfg: DiTArchConfig, latents: jax.Array) -> jax.Array:
    """[H, W, C] -> [H/p * W/p, C*p*p]"""
    hh, ww, c = latents.shape
    p = cfg.patch_size
    x = latents.reshape(hh // p, p, ww // p, p, c)
    return x.transpose(0, 2, 1, 3, 4).reshape(
        (hh // p) * (ww // p), c * p * p
    )


def unpatchify(
    cfg: DiTArchConfig, tokens: jax.Array, hh: int, ww: int
) -> jax.Array:
    p = cfg.patch_size
    c = cfg.in_channels
    x = tokens.reshape(hh // p, ww // p, p, p, c)
    return x.transpose(0, 2, 1, 3, 4).reshape(hh, ww, c)


def forward(
    cfg: DiTArchConfig,
    params: dict,
    latent_tokens: jax.Array,  # [S_img, C*p*p] patchified noisy latents
    cond_tokens: jax.Array,  # [S_txt, cond_dim] text-cond embeddings
    timestep: jax.Array,  # scalar in [0, 1000)
    *,
    sp_size: int = 1,
    sp_axis: str | None = None,
) -> jax.Array:
    """Predict velocity for one sample; returns [S_img, C*p*p].

    With sp_axis set (Ulysses sequence parallel), latent_tokens arrive
    seq-sharded; attention reshards head<->seq with all_to_all
    (diffusion/distributed/sp_ulysses.py).
    """
    dt = _dt(cfg)
    h = cfg.hidden_size
    heads = cfg.num_heads
    hd = cfg.head_dim

    x = jnp.dot(
        latent_tokens.astype(dt), params["patch_in"],
        preferred_element_type=jnp.float32,
    ).astype(dt) + params["patch_in_b"]
    c = jnp.dot(
        cond_tokens.astype(dt), params["cond_proj"],
        preferred_element_type=jnp.float32,
    ).astype(dt)
    s_img, s_txt = x.shape[0], c.shape[0]
    x = jnp.concatenate([c, x], axis=0)  # joint [S_txt + S_img, H]

    t_emb = timestep_embedding(timestep, 256)
    t_vec = jnp.dot(t_emb, params["t_mlp1"])
    t_vec = jnp.dot(jax.nn.silu(t_vec), params["t_mlp2"])  # [H] f32

    def block(xc, lp):
        mods = (
            jnp.dot(jax.nn.silu(t_vec), lp["ada"]) + lp["ada_b"]
        )  # [6H]
        sh1, sc1, g1, sh2, sc2, g2 = jnp.split(mods, 6)
        xn = rms_norm(xc, lp["norm_scale"], 1e-6)
        xm = xn * (1 + sc1.astype(dt)) + sh1.astype(dt)
        qkv = jnp.dot(
            xm, lp["wqkv"], preferred_element_type=jnp.float32
        ).astype(dt)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        s_tot = xc.shape[0]

        def to_heads(a):
            return a.reshape(s_tot, heads, hd).transpose(1, 0, 2)[None]

        if sp_axis is not None:
            # joint [text || image] stream under Ulysses: the text
            # prefix is replicated on every sp shard while image tokens
            # are seq-sharded, so attention routes through the joint
            # strategy (sp_ulysses.ulysses_joint_attention) — text KV
            # joins once, not once per shard
            from ht_vllm_omni_tpu.diffusion.distributed.sp_ulysses import (
                ulysses_joint_attention,
            )

            qh, kh, vh = to_heads(q)[0], to_heads(k)[0], to_heads(v)[0]
            o_img, o_txt = ulysses_joint_attention(
                qh[:, s_txt:], kh[:, s_txt:], vh[:, s_txt:],
                qh[:, :s_txt], kh[:, :s_txt], vh[:, :s_txt],
                axis=sp_axis, sp_size=sp_size,
            )
            o = jnp.concatenate([o_txt, o_img], axis=1)[None]
        else:
            o = flash_attention(
                to_heads(q), to_heads(k), to_heads(v), causal=False
            )
        o = o[0].transpose(1, 0, 2).reshape(s_tot, h)
        attn = jnp.dot(
            o, lp["wo"], preferred_element_type=jnp.float32
        ).astype(dt)
        xc = xc + g1.astype(dt) * attn
        xn = rms_norm(xc, lp["norm_scale"], 1e-6)
        xm = xn * (1 + sc2.astype(dt)) + sh2.astype(dt)
        mlp = jnp.dot(
            xm, lp["mlp_in"], preferred_element_type=jnp.float32
        ).astype(dt)
        mlp = jnp.dot(
            jax.nn.gelu(mlp), lp["mlp_out"],
            preferred_element_type=jnp.float32,
        ).astype(dt)
        xc = xc + g2.astype(dt) * mlp
        return xc, None

    lp_tree = {
        k: params[k]
        for k in ("ada", "ada_b", "wqkv", "wo", "mlp_in", "mlp_out",
                  "norm_scale")
    }
    x, _ = jax.lax.scan(block, x, lp_tree)

    mods = jnp.dot(jax.nn.silu(t_vec), params["final_ada"]) + (
        params["final_ada_b"]
    )
    shf, scf = jnp.split(mods, 2)
    xn = rms_norm(x, jnp.ones((h,), dt), 1e-6)
    xm = xn * (1 + scf.astype(dt)) + shf.astype(dt)
    out = jnp.dot(
        xm, params["final_out"], preferred_element_type=jnp.float32
    )
    return out[s_txt:]  # velocity for image tokens only


def forward_cached(
    cfg: DiTArchConfig,
    params: dict,
    latent_tokens: jax.Array,
    cond_tokens: jax.Array,
    timestep: jax.Array,
    db_state: dict,
    db_cfg,
    step_idx: jax.Array,
):
    """forward() with DBCache block-level skipping (cache/dbcache.py):
    the first Fn blocks always compute; the middle blocks are replaced by
    the cached residual when the early hidden state moved less than the
    threshold; the last Bn blocks always compute.  Returns
    (velocity, new_db_state, cached?)."""
    from ht_vllm_omni_tpu.diffusion.cache import dbcache

    dt = _dt(cfg)
    h = cfg.hidden_size

    # prologue (same as forward)
    x = jnp.dot(
        latent_tokens.astype(dt), params["patch_in"],
        preferred_element_type=jnp.float32,
    ).astype(dt) + params["patch_in_b"]
    c = jnp.dot(
        cond_tokens.astype(dt), params["cond_proj"],
        preferred_element_type=jnp.float32,
    ).astype(dt)
    s_txt = c.shape[0]
    x = jnp.concatenate([c, x], axis=0)

    t_emb = timestep_embedding(timestep, 256)
    t_vec = jnp.dot(t_emb, params["t_mlp1"])
    t_vec = jnp.dot(jax.nn.silu(t_vec), params["t_mlp2"])

    heads = cfg.num_heads
    hd = cfg.head_dim

    def block(xc, lp):
        mods = jnp.dot(jax.nn.silu(t_vec), lp["ada"]) + lp["ada_b"]
        sh1, sc1, g1, sh2, sc2, g2 = jnp.split(mods, 6)
        xn = rms_norm(xc, lp["norm_scale"], 1e-6)
        xm = xn * (1 + sc1.astype(dt)) + sh1.astype(dt)
        qkv = jnp.dot(
            xm, lp["wqkv"], preferred_element_type=jnp.float32
        ).astype(dt)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        s_tot = xc.shape[0]

        def to_heads(a):
            return a.reshape(s_tot, heads, hd).transpose(1, 0, 2)[None]

        o = flash_attention(
            to_heads(q), to_heads(k), to_heads(v), causal=False
        )
        o = o[0].transpose(1, 0, 2).reshape(s_tot, h)
        attn = jnp.dot(
            o, lp["wo"], preferred_element_type=jnp.float32
        ).astype(dt)
        xc = xc + g1.astype(dt) * attn
        xn = rms_norm(xc, lp["norm_scale"], 1e-6)
        xm = xn * (1 + sc2.astype(dt)) + sh2.astype(dt)
        mlp = jnp.dot(
            xm, lp["mlp_in"], preferred_element_type=jnp.float32
        ).astype(dt)
        mlp = jnp.dot(
            jax.nn.gelu(mlp), lp["mlp_out"],
            preferred_element_type=jnp.float32,
        ).astype(dt)
        xc = xc + g2.astype(dt) * mlp
        return xc, None

    lp_tree = {
        k: params[k]
        for k in ("ada", "ada_b", "wqkv", "wo", "mlp_in", "mlp_out",
                  "norm_scale")
    }
    num_l = params["ada"].shape[0]
    f_n = min(db_cfg.Fn_compute_blocks, num_l)
    b_n = min(db_cfg.Bn_compute_blocks, max(num_l - f_n, 0))

    def sl(a, b):
        return {k: v[a:b] for k, v in lp_tree.items()}

    x, _ = jax.lax.scan(block, x, sl(0, f_n))

    def compute_mid():
        y, _ = jax.lax.scan(block, x, sl(f_n, num_l - b_n))
        return y

    x32, db_state, cached = dbcache.cached_mid(
        db_state, step_idx, x, compute_mid, db_cfg
    )
    x = x32.astype(dt)
    if b_n > 0:
        x, _ = jax.lax.scan(block, x, sl(num_l - b_n, num_l))

    mods = jnp.dot(jax.nn.silu(t_vec), params["final_ada"]) + (
        params["final_ada_b"]
    )
    shf, scf = jnp.split(mods, 2)
    xn = rms_norm(x, jnp.ones((h,), dt), 1e-6)
    xm = xn * (1 + scf.astype(dt)) + shf.astype(dt)
    out = jnp.dot(
        xm, params["final_out"], preferred_element_type=jnp.float32
    )
    return out[s_txt:], db_state, cached
