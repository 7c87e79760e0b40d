"""Flux-architecture transformer with per-family activation options
(Ovis-Image / LongCat-Image; see config.py for the exact mapping).

Structure shared by both (reference ovis_image_transformer.py:340,
longcat_image_transformer.py:577):

- timestep-only conditioning (Timesteps(256, cos-first) -> MLP);
- dual-stream blocks: per-block adaLN-zero on both streams, joint
  attention over [txt ; img] with per-stream q/k RMS norms and biased
  projections;
- single-stream blocks: AdaLayerNormZeroSingle + fused
  [attention ; mlp] output projection, text prepended;
- AdaLayerNormContinuous output head.

RoPE tables are computed by the pipeline from family-specific position
ids and passed in (interleaved-pair convention, like Flux1).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.diffusion.models.flux_like.config import (
    FluxLikeArchConfig,
)


def init_params(cfg: FluxLikeArchConfig, key: jax.Array) -> dict:
    L, LS, d = cfg.num_layers, cfg.num_single_layers, cfg.inner_dim
    hd = cfg.attention_head_dim
    mh = int(d * cfg.mlp_ratio)
    gated = 2 if cfg.ff_act == "swiglu" else 1
    sgated = 2 if cfg.single_mlp_act == "swiglu" else 1
    ks = iter(jax.random.split(key, 24 + 20 * L + 8 * LS))

    def w(shape, scale=0.02):
        return jax.random.normal(next(ks), shape, jnp.float32) * scale

    def stack(n, shape):
        return jax.random.normal(next(ks), (n,) + shape, jnp.float32) * 0.02

    def zstack(n, m):
        return jnp.zeros((n, m), jnp.float32)

    p = {
        "x_w": w((cfg.in_channels, d)), "x_b": jnp.zeros((d,)),
        "ctx_w": w((cfg.joint_attention_dim, d)),
        "ctx_b": jnp.zeros((d,)),
        "t_w1": w((256, d)), "t_b1": jnp.zeros((d,)),
        "t_w2": w((d, d)), "t_b2": jnp.zeros((d,)),
        # dual blocks
        "ada_w": stack(L, (d, 6 * d)), "ada_b": zstack(L, 6 * d),
        "ada_c_w": stack(L, (d, 6 * d)), "ada_c_b": zstack(L, 6 * d),
        "qkv_w": stack(L, (d, 3 * d)), "qkv_b": zstack(L, 3 * d),
        "add_qkv_w": stack(L, (d, 3 * d)), "add_qkv_b": zstack(L, 3 * d),
        "qn": jnp.ones((L, hd)), "kn": jnp.ones((L, hd)),
        "add_qn": jnp.ones((L, hd)), "add_kn": jnp.ones((L, hd)),
        "out_w": stack(L, (d, d)), "out_b": zstack(L, d),
        "add_out_w": stack(L, (d, d)), "add_out_b": zstack(L, d),
        "ff_in": stack(L, (d, gated * mh)), "ff_in_b": zstack(L, gated * mh),
        "ff_out": stack(L, (mh, d)), "ff_out_b": zstack(L, d),
        "ffc_in": stack(L, (d, gated * mh)),
        "ffc_in_b": zstack(L, gated * mh),
        "ffc_out": stack(L, (mh, d)), "ffc_out_b": zstack(L, d),
        # single blocks
        "s_ada_w": stack(LS, (d, 3 * d)), "s_ada_b": zstack(LS, 3 * d),
        "s_qkv_w": stack(LS, (d, 3 * d)), "s_qkv_b": zstack(LS, 3 * d),
        "s_qn": jnp.ones((LS, hd)), "s_kn": jnp.ones((LS, hd)),
        "s_mlp_w": stack(LS, (d, sgated * mh)),
        "s_mlp_b": zstack(LS, sgated * mh),
        "s_out_w": stack(LS, (d + mh, d)), "s_out_b": zstack(LS, d),
        # output head
        "o_ada_w": w((d, 2 * d)), "o_ada_b": jnp.zeros((2 * d,)),
        "o_w": w((d, cfg.in_channels)),
        "o_b": jnp.zeros((cfg.in_channels,)),
    }
    if cfg.context_rms_norm:
        p["ctx_norm"] = jnp.ones((cfg.joint_attention_dim,))
    return p


def _rms(x, w, eps=1e-6):
    v = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
    return (w * (x * jax.lax.rsqrt(v + eps))).astype(x.dtype)


def _ln(x, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _sinus(t, dim=256):
    half = dim // 2
    freqs = jnp.exp(
        -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], -1)


def rope_tables(cfg: FluxLikeArchConfig, ids: np.ndarray):
    """ids [S, 3] -> interleaved-pair tables [S, head_dim//2]."""
    cs, ss = [], []
    for ax, d_ax in enumerate(cfg.axes_dims_rope):
        inv = 1.0 / (
            cfg.rope_theta
            ** (np.arange(0, d_ax, 2, dtype=np.float64) / d_ax)
        )
        f = np.asarray(ids[:, ax], np.float64)[:, None] * inv[None]
        cs.append(np.cos(f).astype(np.float32))
        ss.append(np.sin(f).astype(np.float32))
    return (
        jnp.asarray(np.concatenate(cs, -1)),
        jnp.asarray(np.concatenate(ss, -1)),
    )


def _rope_apply(x, cos, sin):
    orig = x.dtype
    xf = x.astype(jnp.float32)
    a, b = xf[..., 0::2], xf[..., 1::2]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return (
        jnp.stack([a * c - b * s, a * s + b * c], -1)
        .reshape(x.shape)
        .astype(orig)
    )


def _ff(cfg, x, w_in, b_in, w_out, b_out, kind):
    h = x @ w_in + b_in
    if kind == "swiglu":
        a, gate = jnp.split(h, 2, -1)
        h = a * jax.nn.silu(gate)
    else:
        h = jax.nn.gelu(h, approximate=True)
    return h @ w_out + b_out


def forward(
    cfg: FluxLikeArchConfig,
    p: dict,
    img_tokens: jax.Array,  # [B, S_img, in_channels] packed latents
    txt_embeds: jax.Array,  # [B, S_txt, joint_attention_dim]
    timestep: jax.Array,    # [B] sigma in [0, 1]
    txt_rope: tuple[jax.Array, jax.Array],
    img_rope: tuple[jax.Array, jax.Array],
) -> jax.Array:
    b, s_img, _ = img_tokens.shape
    s_txt = txt_embeds.shape[1]
    nh, hd = cfg.num_attention_heads, cfg.attention_head_dim
    d = cfg.inner_dim
    mh = int(d * cfg.mlp_ratio)

    temb = jax.nn.silu(
        _sinus(timestep * 1000.0) @ p["t_w1"] + p["t_b1"]
    )
    temb = temb @ p["t_w2"] + p["t_b2"]
    silu_t = jax.nn.silu(temb)

    img = img_tokens @ p["x_w"] + p["x_b"]
    txt = txt_embeds
    if cfg.context_rms_norm:
        txt = _rms(txt, p["ctx_norm"])
    txt = txt @ p["ctx_w"] + p["ctx_b"]

    tcos, tsin = txt_rope
    icos, isin = img_rope
    jcos = jnp.concatenate([tcos, icos], 0)
    jsin = jnp.concatenate([tsin, isin], 0)

    for li in range(cfg.num_layers):
        ada = silu_t @ p["ada_w"][li] + p["ada_b"][li]
        sh_m, sc_m, g_m, sh_f, sc_f, g_f = jnp.split(ada[:, None], 6, -1)
        adc = silu_t @ p["ada_c_w"][li] + p["ada_c_b"][li]
        csh_m, csc_m, cg_m, csh_f, csc_f, cg_f = jnp.split(
            adc[:, None], 6, -1
        )
        ni = (1 + sc_m) * _ln(img) + sh_m
        nt = (1 + csc_m) * _ln(txt) + csh_m
        q, k, v = jnp.split(ni @ p["qkv_w"][li] + p["qkv_b"][li], 3, -1)
        aq, ak, av = jnp.split(
            nt @ p["add_qkv_w"][li] + p["add_qkv_b"][li], 3, -1
        )
        q = _rms(q.reshape(b, s_img, nh, hd), p["qn"][li])
        k = _rms(k.reshape(b, s_img, nh, hd), p["kn"][li])
        v = v.reshape(b, s_img, nh, hd)
        aq = _rms(aq.reshape(b, s_txt, nh, hd), p["add_qn"][li])
        ak = _rms(ak.reshape(b, s_txt, nh, hd), p["add_kn"][li])
        av = av.reshape(b, s_txt, nh, hd)
        jq = _rope_apply(jnp.concatenate([aq, q], 1), jcos, jsin)
        jk = _rope_apply(jnp.concatenate([ak, k], 1), jcos, jsin)
        jv = jnp.concatenate([av, v], 1)
        scores = jnp.einsum("bqhd,bkhd->bhqk", jq, jk) * (hd**-0.5)
        att = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(
            img.dtype
        )
        o = jnp.einsum("bhqk,bkhd->bqhd", att, jv).reshape(
            b, s_txt + s_img, d
        )
        ot, oi = o[:, :s_txt], o[:, s_txt:]
        img = img + g_m * (oi @ p["out_w"][li] + p["out_b"][li])
        txt = txt + cg_m * (ot @ p["add_out_w"][li] + p["add_out_b"][li])

        ni = (1 + sc_f) * _ln(img) + sh_f
        img = img + g_f * _ff(
            cfg, ni, p["ff_in"][li], p["ff_in_b"][li],
            p["ff_out"][li], p["ff_out_b"][li], cfg.ff_act,
        )
        nt = (1 + csc_f) * _ln(txt) + csh_f
        txt = txt + cg_f * _ff(
            cfg, nt, p["ffc_in"][li], p["ffc_in_b"][li],
            p["ffc_out"][li], p["ffc_out_b"][li], cfg.ff_act,
        )

    h = jnp.concatenate([txt, img], 1)
    s_all = s_txt + s_img
    for li in range(cfg.num_single_layers):
        ada = silu_t @ p["s_ada_w"][li] + p["s_ada_b"][li]
        sh, sc, gate = jnp.split(ada[:, None], 3, -1)
        n = (1 + sc) * _ln(h) + sh
        q, k, v = jnp.split(
            n @ p["s_qkv_w"][li] + p["s_qkv_b"][li], 3, -1
        )
        q = _rms(q.reshape(b, s_all, nh, hd), p["s_qn"][li])
        k = _rms(k.reshape(b, s_all, nh, hd), p["s_kn"][li])
        v = v.reshape(b, s_all, nh, hd)
        q = _rope_apply(q, jcos, jsin)
        k = _rope_apply(k, jcos, jsin)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (hd**-0.5)
        att = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(
            h.dtype
        )
        o = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, s_all, d)
        mlp = n @ p["s_mlp_w"][li] + p["s_mlp_b"][li]
        if cfg.single_mlp_act == "swiglu":
            val, gate_m = jnp.split(mlp, 2, -1)
            mlp = jax.nn.silu(gate_m) * val
        else:
            mlp = jax.nn.gelu(mlp, approximate=True)
        fused = jnp.concatenate([o, mlp], -1)
        h = h + gate * (fused @ p["s_out_w"][li] + p["s_out_b"][li])

    img = h[:, s_txt:]
    ada = silu_t @ p["o_ada_w"] + p["o_ada_b"]
    scale, shift = jnp.split(ada, 2, -1)
    img = _ln(img) * (1 + scale)[:, None] + shift[:, None]
    return img @ p["o_w"] + p["o_b"]
