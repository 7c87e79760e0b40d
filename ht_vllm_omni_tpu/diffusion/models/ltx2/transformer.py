"""LTX2 joint audio-video transformer (jax).

Follows the reference LTX2VideoTransformerBlock /
LTX2Transformer3DModel (reference vllm_omni/diffusion/models/ltx2/
ltx2_transformer.py:670-968):

- each block runs BOTH streams: modulated self-attention (per-block
  scale_shift_table + timestep projection, 6 chunks per stream), text
  cross-attention per stream, then bidirectional audio<->video
  cross-attention whose inputs are modulated by a separate 4+1-chunk
  table and whose q AND k both carry TIME-axis rotary embeddings so the
  modalities align temporally (:887-957);
- q/k norms are RMS across the whole inner dim
  ("rms_norm_across_heads"); FFNs are GELU-tanh; rope is interleaved.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.diffusion.models.ltx2.config import LTX2ArchConfig


def init_params(cfg: LTX2ArchConfig, key: jax.Array) -> dict:
    L = cfg.num_layers
    d, ad = cfg.dim, cfg.audio_dim
    ks = iter(jax.random.split(key, 48))

    def w(shape, scale=0.02):
        return jax.random.normal(next(ks), shape, jnp.float32) * scale

    def stack(shape):
        return jax.random.normal(next(ks), (L,) + shape, jnp.float32) * 0.02

    def attn(qd, kd, od):
        return {
            "q": stack((qd, od)), "q_b": jnp.zeros((L, od)),
            "k": stack((kd, od)), "k_b": jnp.zeros((L, od)),
            "v": stack((kd, od)), "v_b": jnp.zeros((L, od)),
            "o": stack((od, qd)), "o_b": jnp.zeros((L, qd)),
            "qn": jnp.ones((L, od)), "kn": jnp.ones((L, od)),
        }

    p = {
        "v_in_w": w((cfg.in_channels, d)), "v_in_b": jnp.zeros((d,)),
        "a_in_w": w((cfg.audio_in_channels, ad)),
        "a_in_b": jnp.zeros((ad,)),
        "cap_w": w((cfg.caption_dim, cfg.cross_attention_dim)),
        "cap_b": jnp.zeros((cfg.cross_attention_dim,)),
        "acap_w": w((cfg.caption_dim, cfg.audio_cross_attention_dim)),
        "acap_b": jnp.zeros((cfg.audio_cross_attention_dim,)),
        # timestep -> per-stream modulation projections
        "t_w1": w((256, d)), "t_b1": jnp.zeros((d,)),
        "t_w2": w((d, 6 * d)), "t_b2": jnp.zeros((6 * d,)),
        "at_w1": w((256, ad)), "at_b1": jnp.zeros((ad,)),
        "at_w2": w((ad, 6 * ad)), "at_b2": jnp.zeros((6 * ad,)),
        "ca_w": w((d, 5 * d)), "ca_b": jnp.zeros((5 * d,)),
        "aca_w": w((ad, 5 * ad)), "aca_b": jnp.zeros((5 * ad,)),
        # per-block tables
        "sst": jax.random.normal(next(ks), (L, 6, d)) / math.sqrt(d),
        "a_sst": jax.random.normal(next(ks), (L, 6, ad)) / math.sqrt(ad),
        "ca_sst": jax.random.normal(next(ks), (L, 5, d)),
        "a_ca_sst": jax.random.normal(next(ks), (L, 5, ad)),
        # attentions
        "self_v": attn(d, d, d),
        "self_a": attn(ad, ad, ad),
        "x_v": attn(d, cfg.cross_attention_dim, d),
        "x_a": attn(ad, cfg.audio_cross_attention_dim, ad),
        "a2v": attn(d, ad, ad),  # Q video, K/V audio, head dims audio
        "v2a": attn(ad, d, ad),  # Q audio, K/V video
        # FFNs (gelu-tanh, mult 4)
        "ff_v1": stack((d, 4 * d)), "ff_v1b": jnp.zeros((L, 4 * d)),
        "ff_v2": stack((4 * d, d)), "ff_v2b": jnp.zeros((L, d)),
        "ff_a1": stack((ad, 4 * ad)), "ff_a1b": jnp.zeros((L, 4 * ad)),
        "ff_a2": stack((4 * ad, ad)), "ff_a2b": jnp.zeros((L, ad)),
        # output heads
        "v_out_table": jax.random.normal(next(ks), (2, d)) / math.sqrt(d),
        "v_out_w": w((d, cfg.in_channels)),
        "v_out_b": jnp.zeros((cfg.in_channels,)),
        "a_out_table": jax.random.normal(next(ks), (2, ad)) / math.sqrt(ad),
        "a_out_w": w((ad, cfg.audio_in_channels)),
        "a_out_b": jnp.zeros((cfg.audio_in_channels,)),
    }
    return p


def _rms(x, w, eps=1e-6):
    v = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
    return (w * (x * jax.lax.rsqrt(v + eps))).astype(x.dtype)


def _rms_plain(x, eps=1e-6):
    v = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
    return (x * jax.lax.rsqrt(v + eps)).astype(x.dtype)


def _sinus(t, dim=256):
    half = dim // 2
    freqs = jnp.exp(
        -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], -1)


def rope_tables(theta, positions: np.ndarray, dim: int):
    """Interleaved tables [S, dim//2] over a single position axis (or a
    concatenation of axis tables built by the caller)."""
    inv = 1.0 / (
        theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim)
    )
    f = np.asarray(positions, np.float64)[:, None] * inv[None]
    return (
        jnp.asarray(np.cos(f), jnp.float32),
        jnp.asarray(np.sin(f), jnp.float32),
    )


def video_rope(cfg: LTX2ArchConfig, grid: tuple[int, int, int]):
    """3-axis rope over the (f, h, w) grid, head_dim split in thirds."""
    hd = cfg.attention_head_dim
    d_t = hd - 2 * (hd // 3)
    d_s = hd // 3
    f, h, w = grid
    gt, gh, gw = np.meshgrid(
        np.arange(f), np.arange(h), np.arange(w), indexing="ij"
    )
    parts = []
    for pos, dd in ((gt, d_t), (gh, d_s), (gw, d_s)):
        c, s = rope_tables(cfg.rope_theta, pos.reshape(-1), dd)
        parts.append((c, s))
    cos = jnp.concatenate([c for c, _ in parts], -1)
    sin = jnp.concatenate([s for _, s in parts], -1)
    return cos, sin


def _apply_rope(x, cos, sin):
    """Interleaved pairs; x [B, S, H, D], tables [S, D//2]."""
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


def _attend(lp, li, x, ctx, nh, hd, q_rope=None, k_rope=None,
            ctx_mask=None):
    b, sq, _ = x.shape
    sk = ctx.shape[1]
    q = _rms(x @ lp["q"][li] + lp["q_b"][li], lp["qn"][li])
    k = _rms(ctx @ lp["k"][li] + lp["k_b"][li], lp["kn"][li])
    v = ctx @ lp["v"][li] + lp["v_b"][li]
    q = q.reshape(b, sq, nh, hd)
    k = k.reshape(b, sk, nh, hd)
    v = v.reshape(b, sk, nh, hd)
    if q_rope is not None:
        q = _apply_rope(q, *q_rope)
    if k_rope is not None:
        k = _apply_rope(k, *k_rope)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) / math.sqrt(hd)
    if ctx_mask is not None:
        scores = jnp.where(ctx_mask[:, None, None, :], scores, -1e30)
    o = jnp.einsum(
        "bhqk,bkhd->bqhd", jax.nn.softmax(scores, -1),
        v.astype(jnp.float32),
    ).reshape(b, sq, nh * hd)
    return (o @ lp["o"][li] + lp["o_b"][li]).astype(x.dtype)


def forward(
    cfg: LTX2ArchConfig,
    p: dict,
    vid: jax.Array,     # [B, S_v, in_channels] video latent tokens
    aud: jax.Array,     # [B, S_a, audio_in_channels] audio latent tokens
    cap: jax.Array,     # [B, S_t, caption_dim]
    cap_mask: jax.Array,  # [B, S_t]
    t: jax.Array,       # [B] sigma in [0, 1]
    grid: tuple[int, int, int],    # static video (f, h, w) token grid
) -> tuple[jax.Array, jax.Array]:
    b, s_v, _ = vid.shape
    s_a = aud.shape[1]
    d, ad = cfg.dim, cfg.audio_dim
    nh, hd = cfg.num_attention_heads, cfg.attention_head_dim
    anh, ahd = cfg.audio_num_attention_heads, cfg.audio_attention_head_dim

    x = vid @ p["v_in_w"] + p["v_in_b"]
    a = aud @ p["a_in_w"] + p["a_in_b"]
    ctx_v = cap @ p["cap_w"] + p["cap_b"]
    ctx_a = cap @ p["acap_w"] + p["acap_b"]

    tf = _sinus(t * 1000.0)
    temb = jax.nn.silu(tf @ p["t_w1"] + p["t_b1"])
    mod_v = (temb @ p["t_w2"] + p["t_b2"]).reshape(b, 1, 6, d)
    atemb = jax.nn.silu(tf @ p["at_w1"] + p["at_b1"])
    mod_a = (atemb @ p["at_w2"] + p["at_b2"]).reshape(b, 1, 6, ad)
    ca_v = (
        jax.nn.silu(temb) @ p["ca_w"] + p["ca_b"]
    ).reshape(b, 1, 5, d)
    ca_a = (
        jax.nn.silu(atemb) @ p["aca_w"] + p["aca_b"]
    ).reshape(b, 1, 5, ad)

    vcos, vsin = video_rope(cfg, grid)
    acos, asin = rope_tables(
        cfg.rope_theta, np.arange(s_a), ahd
    )
    # shared-clock TIME rope for cross-modality attention: both token
    # streams map onto [0, 1000) "seconds" so a2v/v2a align temporally
    f_tokens = grid[0]
    v_time = np.repeat(
        np.arange(f_tokens) * (1000.0 / max(f_tokens, 1)),
        grid[1] * grid[2],
    )
    a_time = np.arange(s_a) * (1000.0 / max(s_a, 1))
    cav = rope_tables(cfg.rope_theta, v_time, ahd)
    caa = rope_tables(cfg.rope_theta, a_time, ahd)

    for li in range(cfg.num_layers):
        av = p["sst"][li][None, None] + mod_v.astype(jnp.float32)
        sh_m, sc_m, g_m, sh_f, sc_f, g_f = [av[:, :, i] for i in range(6)]
        aa = p["a_sst"][li][None, None] + mod_a.astype(jnp.float32)
        (ash_m, asc_m, ag_m, ash_f, asc_f, ag_f) = [
            aa[:, :, i] for i in range(6)
        ]

        # 1. self-attention
        n = _rms_plain(x) * (1 + sc_m) + sh_m
        x = x + _attend(
            p["self_v"], li, n.astype(x.dtype), n.astype(x.dtype),
            nh, hd, (vcos, vsin), (vcos, vsin),
        ) * g_m
        n = _rms_plain(a) * (1 + asc_m) + ash_m
        a = a + _attend(
            p["self_a"], li, n.astype(a.dtype), n.astype(a.dtype),
            anh, ahd, (acos, asin), (acos, asin),
        ) * ag_m

        # 2. text cross-attention (ungated)
        x = x + _attend(
            p["x_v"], li, _rms_plain(x), ctx_v, nh, hd,
            ctx_mask=cap_mask > 0,
        )
        a = a + _attend(
            p["x_a"], li, _rms_plain(a), ctx_a, anh, ahd,
            ctx_mask=cap_mask > 0,
        )

        # 3. bidirectional a2v / v2a with modulated norms + time rope
        cv = p["ca_sst"][li][None, None] + ca_v.astype(jnp.float32)
        ca = p["a_ca_sst"][li][None, None] + ca_a.astype(jnp.float32)
        v_a2v_sc, v_a2v_sh, v_v2a_sc, v_v2a_sh, v_gate = [
            cv[:, :, i] for i in range(5)
        ]
        a_a2v_sc, a_a2v_sh, a_v2a_sc, a_v2a_sh, a_gate = [
            ca[:, :, i] for i in range(5)
        ]
        nx = _rms_plain(x)
        na = _rms_plain(a)
        mx = nx * (1 + v_a2v_sc) + v_a2v_sh
        ma = na * (1 + a_a2v_sc) + a_a2v_sh
        x = x + v_gate * _attend(
            p["a2v"], li, mx.astype(x.dtype), ma.astype(a.dtype),
            anh, ahd, cav, caa,
        )
        mx = nx * (1 + v_v2a_sc) + v_v2a_sh
        ma = na * (1 + a_v2a_sc) + a_v2a_sh
        a = a + a_gate * _attend(
            p["v2a"], li, ma.astype(a.dtype), mx.astype(x.dtype),
            anh, ahd, caa, cav,
        )

        # 4. FFN
        n = (_rms_plain(x) * (1 + sc_f) + sh_f).astype(x.dtype)
        x = x + (
            jax.nn.gelu(n @ p["ff_v1"][li] + p["ff_v1b"][li],
                        approximate=True)
            @ p["ff_v2"][li] + p["ff_v2b"][li]
        ) * g_f
        n = (_rms_plain(a) * (1 + asc_f) + ash_f).astype(a.dtype)
        a = a + (
            jax.nn.gelu(n @ p["ff_a1"][li] + p["ff_a1b"][li],
                        approximate=True)
            @ p["ff_a2"][li] + p["ff_a2b"][li]
        ) * ag_f

    sh = p["v_out_table"][0][None, None] + temb.astype(jnp.float32)[:, None]
    sc = p["v_out_table"][1][None, None] + temb.astype(jnp.float32)[:, None]
    x = _rms_plain(x) * (1 + sc) + sh
    x = x @ p["v_out_w"] + p["v_out_b"]
    sh = (
        p["a_out_table"][0][None, None] + atemb.astype(jnp.float32)[:, None]
    )
    sc = (
        p["a_out_table"][1][None, None] + atemb.astype(jnp.float32)[:, None]
    )
    a = _rms_plain(a) * (1 + sc) + sh
    a = a @ p["a_out_w"] + p["a_out_b"]
    return x, a
