"""GLM-Image DiT (jax): AR-prior-conditioned image transformer.

Follows the reference GlmImageTransformer2DModel (reference
vllm_omni/diffusion/models/glm_image/glm_image_transformer.py):

- per-patch conditioning: each 2x2 latent patch ADDS the embedding of
  its AR-generated VQ prior token (projected through a linear-silu FF);
  classifier-free guidance drops the prior (:781-788, :860-870);
- SDXL-style conditioning vector: timestep + target-size + crop-coords
  sinusoids -> MLPs, summed (:790-800);
- blocks share ONE adaLN-zero head emitting 12 chunks for both streams
  and ONE GELU-tanh FF applied to both; joint attention runs a single
  fused qkv over [txt ; img] with LayerNorm q/k norms, and RoPE (2D
  h/w, NeoX-halves) touches only the image tokens (:386-530, :620-713);
- AdaLayerNormContinuous output head WITHOUT the SiLU (:210-230).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.diffusion.models.glm_image.config import (
    GlmImageArchConfig,
)


def init_params(cfg: GlmImageArchConfig, key: jax.Array) -> dict:
    L, d = cfg.num_layers, cfg.inner_dim
    pin = cfg.patch_size**2 * cfg.in_channels
    mh = 4 * d
    ks = iter(jax.random.split(key, 32 + 10 * L))

    def w(shape, scale=0.02):
        return jax.random.normal(next(ks), shape, jnp.float32) * scale

    def stack(n, shape):
        return jax.random.normal(next(ks), (n,) + shape, jnp.float32) * 0.02

    te = cfg.time_embed_dim
    return {
        "img_w": w((pin, d)), "img_b": jnp.zeros((d,)),
        # glyph (text) projector: gelu FF text_embed_dim -> inner
        "gly_w1": w((cfg.text_embed_dim, d)), "gly_b1": jnp.zeros((d,)),
        "gly_w2": w((d, d)), "gly_b2": jnp.zeros((d,)),
        "prior_embed": w((cfg.prior_vq_quantizer_codebook_size, d), 1.0),
        "pri_w1": w((d, d)), "pri_b1": jnp.zeros((d,)),
        "pri_w2": w((d, d)), "pri_b2": jnp.zeros((d,)),
        # timestep + size/crop conditioning
        "t_w1": w((256, te)), "t_b1": jnp.zeros((te,)),
        "t_w2": w((te, te)), "t_b2": jnp.zeros((te,)),
        "c_w1": w((4 * cfg.condition_dim, te)), "c_b1": jnp.zeros((te,)),
        "c_w2": w((te, te)), "c_b2": jnp.zeros((te,)),
        # blocks
        "ada_w": stack(L, (te, 12 * d)), "ada_b": jnp.zeros((L, 12 * d)),
        "qkv_w": stack(L, (d, 3 * d)), "qkv_b": jnp.zeros((L, 3 * d)),
        "out_w": stack(L, (d, d)), "out_b": jnp.zeros((L, d)),
        "ff_w1": stack(L, (d, mh)), "ff_b1": jnp.zeros((L, mh)),
        "ff_w2": stack(L, (mh, d)), "ff_b2": jnp.zeros((L, d)),
        # output head (no SiLU adaLN-continuous)
        "o_ada_w": w((te, 2 * d)), "o_ada_b": jnp.zeros((2 * d,)),
        "o_w": w((d, cfg.patch_size**2 * cfg.out_channels)),
        "o_b": jnp.zeros((cfg.patch_size**2 * cfg.out_channels,)),
    }


def _ln(x, eps=1e-5):
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


def rope_tables(cfg: GlmImageArchConfig, ht: int, wt: int):
    """2D rope tables [ht*wt, head_dim] ([f_h || f_w] duplicated, NeoX
    halves apply — GlmImageRotaryPosEmbed, :122-160)."""
    hd = cfg.attention_head_dim
    dim_axis = hd // 2
    inv = 1.0 / (
        cfg.rope_theta
        ** (np.arange(0, dim_axis, 2, dtype=np.float64)[: dim_axis // 2]
            / dim_axis)
    )
    fh = np.arange(ht)[:, None] * inv[None]
    fw = np.arange(wt)[:, None] * inv[None]
    fh = np.broadcast_to(fh[:, None, :], (ht, wt, fh.shape[-1]))
    fw = np.broadcast_to(fw[None, :, :], (ht, wt, fw.shape[-1]))
    f = np.concatenate([fh, fw], -1)
    f = np.concatenate([f, f], -1).reshape(ht * wt, -1)
    return (
        jnp.asarray(np.cos(f), jnp.float32),
        jnp.asarray(np.sin(f), jnp.float32),
    )


def _rope_halves(x, cos, sin):
    """NeoX-halves rotation over the full head dim; x [B,S,H,D]."""
    orig = x.dtype
    xf = x.astype(jnp.float32)
    half = xf.shape[-1] // 2
    re, im = xf[..., :half], xf[..., half:]
    rot = jnp.concatenate([-im, re], -1)
    return (
        xf * cos[None, :, None, :] + rot * sin[None, :, None, :]
    ).astype(orig)


def forward(
    cfg: GlmImageArchConfig,
    p: dict,
    latents: jax.Array,       # [B, C, H, W]
    text: jax.Array,          # [B, S_t, text_embed_dim]
    prior_tokens: jax.Array,  # [B, S_img] VQ ids (one per patch)
    prior_drop: jax.Array,    # [B] bool: drop the prior (CFG uncond)
    timestep: jax.Array,      # [B] diffusers scale
    target_size: jax.Array,   # [B, 2]
    crop_coords: jax.Array,   # [B, 2]
) -> jax.Array:
    b, c, hh, ww = latents.shape
    ps = cfg.patch_size
    ht, wt = hh // ps, ww // ps
    s_img = ht * wt
    nh, hd = cfg.num_attention_heads, cfg.attention_head_dim
    d = cfg.inner_dim
    s_txt = text.shape[1]

    x = latents.reshape(b, c, ht, ps, wt, ps)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, s_img, c * ps * ps)
    x = x @ p["img_w"] + p["img_b"]

    txt = jax.nn.gelu(
        text @ p["gly_w1"] + p["gly_b1"], approximate=False
    )
    txt = txt @ p["gly_w2"] + p["gly_b2"]

    pe = p["prior_embed"][jnp.clip(
        prior_tokens, 0, cfg.prior_vq_quantizer_codebook_size - 1
    )]
    pe = pe * (1.0 - prior_drop.astype(jnp.float32))[:, None, None]
    pe = jax.nn.silu(pe @ p["pri_w1"] + p["pri_b1"])
    pe = pe @ p["pri_w2"] + p["pri_b2"]
    x = x + pe

    temb = jax.nn.silu(_sinus(timestep) @ p["t_w1"] + p["t_b1"])
    temb = temb @ p["t_w2"] + p["t_b2"]
    cond = jnp.concatenate(
        [
            _sinus(target_size[:, 0], cfg.condition_dim),
            _sinus(target_size[:, 1], cfg.condition_dim),
            _sinus(crop_coords[:, 0], cfg.condition_dim),
            _sinus(crop_coords[:, 1], cfg.condition_dim),
        ],
        axis=-1,
    )
    cemb = jax.nn.silu(cond @ p["c_w1"] + p["c_b1"])
    temb = temb + (cemb @ p["c_w2"] + p["c_b2"])

    cos, sin = rope_tables(cfg, ht, wt)

    for li in range(cfg.num_layers):
        ada = temb @ p["ada_w"][li] + p["ada_b"][li]
        (sh_m, csh_m, sc_m, csc_m, g_m, cg_m,
         sh_f, csh_f, sc_f, csc_f, g_f, cg_f) = jnp.split(
            ada[:, None], 12, -1
        )
        nx = _ln(x) * (1 + sc_m) + sh_m
        nt = _ln(txt) * (1 + csc_m) + csh_m

        joint = jnp.concatenate([nt, nx], 1)
        s_all = s_txt + s_img
        qkv = joint @ p["qkv_w"][li] + p["qkv_b"][li]
        q, k, v = jnp.split(qkv, 3, -1)
        q = _ln(q.reshape(b, s_all, nh, hd))
        k = _ln(k.reshape(b, s_all, nh, hd))
        v = v.reshape(b, s_all, nh, hd)
        qi = _rope_halves(q[:, s_txt:], cos, sin)
        ki = _rope_halves(k[:, s_txt:], cos, sin)
        q = jnp.concatenate([q[:, :s_txt], qi], 1)
        k = jnp.concatenate([k[:, :s_txt], ki], 1)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (hd**-0.5)
        att = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(
            x.dtype
        )
        o = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, s_all, d)
        o = o @ p["out_w"][li] + p["out_b"][li]
        txt = txt + o[:, :s_txt] * cg_m
        x = x + o[:, s_txt:] * g_m

        nx = _ln(x) * (1 + sc_f) + sh_f
        nt = _ln(txt) * (1 + csc_f) + csh_f
        ffx = jax.nn.gelu(
            nx @ p["ff_w1"][li] + p["ff_b1"][li], approximate=True
        ) @ p["ff_w2"][li] + p["ff_b2"][li]
        fft = jax.nn.gelu(
            nt @ p["ff_w1"][li] + p["ff_b1"][li], approximate=True
        ) @ p["ff_w2"][li] + p["ff_b2"][li]
        x = x + ffx * g_f
        txt = txt + fft * cg_f

    ada = temb @ p["o_ada_w"] + p["o_ada_b"]  # no SiLU (reference :226)
    scale, shift = jnp.split(ada, 2, -1)
    x = _ln(x) * (1 + scale)[:, None] + shift[:, None]
    x = x @ p["o_w"] + p["o_b"]

    co = cfg.out_channels
    x = x.reshape(b, ht, wt, co, ps, ps)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(b, co, hh, ww)
