"""Stable Audio DiT (jax).

Follows the reference StableAudioDiTModel (reference
vllm_omni/diffusion/models/stable_audio/stable_audio_transformer.py):

- 1-D latent sequence [B, C, L] with residual pre/post 1x1 convs;
- a single global token (duration embedding + Gaussian-Fourier time
  embedding) PREPENDED to the sequence (:495-533);
- blocks: LayerNorm self-attention with PARTIAL NeoX rotary (first
  head_dim/2 dims only, :24-56), GQA (kv heads < q heads), LayerNorm
  cross-attention over projected text features, SwiGLU FFN (:286-357).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.diffusion.models.stable_audio.config import (
    StableAudioArchConfig,
)


def init_params(cfg: StableAudioArchConfig, key: jax.Array) -> dict:
    L, d = cfg.num_layers, cfg.inner_dim
    hd = cfg.attention_head_dim
    nq, nk = cfg.num_attention_heads, cfg.num_key_value_attention_heads
    mh = d * cfg.ff_mult
    ks = iter(jax.random.split(key, 32 + 16 * L))

    def w(shape, scale=0.02):
        return jax.random.normal(next(ks), shape, jnp.float32) * scale

    def stack(n, shape):
        return jax.random.normal(next(ks), (n,) + shape, jnp.float32) * 0.02

    return {
        "fourier_w": jax.random.normal(
            next(ks), (cfg.time_proj_dim // 2,), jnp.float32
        ),
        "t_w1": w((cfg.time_proj_dim, d)), "t_b1": jnp.zeros((d,)),
        "t_w2": w((d, d)), "t_b2": jnp.zeros((d,)),
        "g_w1": w((cfg.global_states_input_dim, d)),
        "g_w2": w((d, d)),
        "c_w1": w((cfg.cross_attention_input_dim, cfg.cross_attention_dim)),
        "c_w2": w((cfg.cross_attention_dim, cfg.cross_attention_dim)),
        "pre_w": w((1, cfg.in_channels, cfg.in_channels)),
        "in_w": w((cfg.in_channels, d)),
        "ln1_w": jnp.ones((L, d)), "ln1_b": jnp.zeros((L, d)),
        "q1": stack(L, (d, nq * hd)),
        "k1": stack(L, (d, nk * hd)),
        "v1": stack(L, (d, nk * hd)),
        "o1": stack(L, (nq * hd, d)),
        "ln2_w": jnp.ones((L, d)), "ln2_b": jnp.zeros((L, d)),
        "q2": stack(L, (d, nq * hd)),
        "k2": stack(L, (cfg.cross_attention_dim, nk * hd)),
        "v2": stack(L, (cfg.cross_attention_dim, nk * hd)),
        "o2": stack(L, (nq * hd, d)),
        "ln3_w": jnp.ones((L, d)), "ln3_b": jnp.zeros((L, d)),
        "ff_in": stack(L, (d, 2 * mh)),
        "ff_in_b": jnp.zeros((L, 2 * mh)),
        "ff_out": stack(L, (mh, d)),
        "ff_out_b": jnp.zeros((L, d)),
        "out_w": w((d, cfg.out_channels)),
        "post_w": w((1, cfg.out_channels, cfg.out_channels)),
    }


def _ln(x, w, b):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    return (((xf - mu) * jax.lax.rsqrt(var + 1e-5)) * w + b).astype(x.dtype)


def rope_tables(cfg: StableAudioArchConfig, seq_len: int):
    """NeoX-half tables [S, rotary_dim] (cos duplicated halves,
    diffusers get_1d_rotary_pos_embed(repeat_interleave_real=False))."""
    rd = cfg.rotary_dim
    inv = 1.0 / (
        10000.0 ** (np.arange(0, rd, 2, dtype=np.float64) / rd)
    )
    f = np.arange(seq_len, dtype=np.float64)[:, None] * inv[None]
    cos = np.concatenate([np.cos(f), np.cos(f)], -1).astype(np.float32)
    sin = np.concatenate([np.sin(f), np.sin(f)], -1).astype(np.float32)
    return jnp.asarray(cos), jnp.asarray(sin)


def _partial_rope(x, cos, sin):
    """Rotate only the first rotary_dim dims, NeoX halves convention."""
    rd = cos.shape[-1]
    xr, xp = x[..., :rd], x[..., rd:]
    half = rd // 2
    re, im = xr[..., :half], xr[..., half:]
    rot = jnp.concatenate([-im, re], -1)
    xr = (
        xr.astype(jnp.float32) * cos[None, :, None, :]
        + rot.astype(jnp.float32) * sin[None, :, None, :]
    ).astype(x.dtype)
    return jnp.concatenate([xr, xp], -1)


def _attn(cfg, q, k, v, nq, nk):
    hd = cfg.attention_head_dim
    if nq != nk:
        k = jnp.repeat(k, nq // nk, axis=2)
        v = jnp.repeat(v, nq // nk, axis=2)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (hd**-0.5)
    att = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", att, v)


def forward(
    cfg: StableAudioArchConfig,
    p: dict,
    latents: jax.Array,   # [B, C, L]
    text: jax.Array,      # [B, S_t, cross_attention_input_dim]
    glob: jax.Array,      # [B, global_states_input_dim] duration embed
    timestep: jax.Array,  # [B] sigma
) -> jax.Array:
    b, c, length = latents.shape
    d = cfg.inner_dim
    nq, nk = cfg.num_attention_heads, cfg.num_key_value_attention_heads
    hd = cfg.attention_head_dim

    # Gaussian Fourier time features (cos first)
    proj = (
        2.0 * math.pi * timestep.astype(jnp.float32)[:, None]
        * p["fourier_w"][None]
    )
    t_feat = jnp.concatenate([jnp.cos(proj), jnp.sin(proj)], -1)
    t_emb = jax.nn.silu(t_feat @ p["t_w1"] + p["t_b1"])
    t_emb = t_emb @ p["t_w2"] + p["t_b2"]
    g = jax.nn.silu(glob @ p["g_w1"]) @ p["g_w2"]
    g = (g + t_emb)[:, None]  # [B, 1, D]

    ctx = jax.nn.silu(text @ p["c_w1"]) @ p["c_w2"]

    x = jax.lax.conv_general_dilated(
        latents.transpose(0, 2, 1), p["pre_w"], (1,), "VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
    ) + latents.transpose(0, 2, 1)
    x = x @ p["in_w"]
    x = jnp.concatenate([g, x], axis=1)  # prepend global token
    s = x.shape[1]
    cos, sin = rope_tables(cfg, s)

    for li in range(cfg.num_layers):
        n = _ln(x, p["ln1_w"][li], p["ln1_b"][li])
        q = (n @ p["q1"][li]).reshape(b, s, nq, hd)
        k = (n @ p["k1"][li]).reshape(b, s, nk, hd)
        v = (n @ p["v1"][li]).reshape(b, s, nk, hd)
        q = _partial_rope(q, cos, sin)
        k = _partial_rope(k, cos, sin)
        o = _attn(cfg, q, k, v, nq, nk).reshape(b, s, nq * hd)
        x = x + o @ p["o1"][li]

        n = _ln(x, p["ln2_w"][li], p["ln2_b"][li])
        st = ctx.shape[1]
        q = (n @ p["q2"][li]).reshape(b, s, nq, hd)
        k = (ctx @ p["k2"][li]).reshape(b, st, nk, hd)
        v = (ctx @ p["v2"][li]).reshape(b, st, nk, hd)
        o = _attn(cfg, q, k, v, nq, nk).reshape(b, s, nq * hd)
        x = x + o @ p["o2"][li]

        n = _ln(x, p["ln3_w"][li], p["ln3_b"][li])
        a, gate = jnp.split(n @ p["ff_in"][li] + p["ff_in_b"][li], 2, -1)
        x = x + (a * jax.nn.silu(gate)) @ p["ff_out"][li] + p["ff_out_b"][li]

    x = x @ p["out_w"]
    x = x[:, 1:]  # drop the global token
    out = jax.lax.conv_general_dilated(
        x, p["post_w"], (1,), "VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
    ) + x
    return out.transpose(0, 2, 1)  # [B, C, L]
