"""Helios transformer (jax): Wan-architecture video DiT with
multi-term memory and guidance cross-attention.

Follows the reference HeliosTransformer3DModel (reference
vllm_omni/diffusion/models/helios/helios_transformer.py):

- blocks carry the Wan 6-chunk scale-shift modulation, cross-attention
  to text and GELU-tanh FFN (:470-568) — the block math matches the
  Wan implementation (diffusion/models/wan_video/transformer.py),
  whose helpers this module reuses;
- multi-term memory: short/mid/long history latents patch-embed through
  dedicated Conv3d embedders at coarser strides and PREPEND to the
  current chunk's tokens (:670-688, :760-820);
- guidance cross-attention: only the current chunk's tokens attend to
  the text — history tokens skip the text update (:545-556);
- RoPE uses explicit frame indices so history tokens carry their true
  temporal positions (:156-205); the output head reads only the
  current-chunk tokens.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.diffusion.models.wan_video import transformer as wan
from ht_vllm_omni_tpu.diffusion.models.wan_video.config import (
    WanVideoArchConfig,
)

# memory patch strides (frame, h, w) per term (reference :670-688)
MEMORY_STRIDES = {
    "short": (1, 2, 2),
    "mid": (2, 4, 4),
    "long": (4, 8, 8),
}


def init_params(cfg: WanVideoArchConfig, key: jax.Array) -> dict:
    """Wan params + the three memory patch embedders."""
    p = wan.init_params(cfg, key)
    d = cfg.inner_dim
    c = cfg.in_channels
    ks = iter(jax.random.split(jax.random.fold_in(key, 99), 8))
    for name, (pt, ph, pw) in MEMORY_STRIDES.items():
        fan = pt * ph * pw * c
        p[f"mem_{name}_w"] = (
            jax.random.normal(next(ks), (fan, d), jnp.float32)
            / math.sqrt(fan)
        )
        p[f"mem_{name}_b"] = jnp.zeros((d,))
    return p


def _patch_tokens(lat, stride, w, b):
    """[B, C, F, H, W] -> [B, S, D] via stride==kernel Conv3d."""
    bsz, c, f, h, ww = lat.shape
    pt, ph, pw = stride
    pf, phh, pww = f // pt, h // ph, ww // pw
    x = lat.transpose(0, 2, 3, 4, 1)
    x = x.reshape(bsz, pf, pt, phh, ph, pww, pw, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        bsz, pf * phh * pww, pt * ph * pw * c
    )
    return x @ w + b, (pf, phh, pww)


def _rope_with_frames(cfg, frame_idx: np.ndarray, hh: int, ww: int):
    """Interleaved 3D rope tables with EXPLICIT frame indices
    [n_frames] (HeliosRotaryPosEmbed semantics)."""
    d_t, d_y, d_x = cfg.rope_dims

    # same axis split as wan.rope_3d, but with explicit frame indices
    def axis(positions, dim):
        inv = 1.0 / (
            10000.0 ** (np.arange(0, dim, 2, dtype=np.float64) / dim)
        )
        return positions[:, None] * inv[None]

    ft = axis(np.asarray(frame_idx, np.float64), d_t)
    fy = axis(np.arange(hh, dtype=np.float64), d_y)
    fx = axis(np.arange(ww, dtype=np.float64), d_x)
    nf = len(frame_idx)
    grid = np.concatenate(
        [
            np.broadcast_to(ft[:, None, None, :], (nf, hh, ww, ft.shape[-1])),
            np.broadcast_to(fy[None, :, None, :], (nf, hh, ww, fy.shape[-1])),
            np.broadcast_to(fx[None, None, :, :], (nf, hh, ww, fx.shape[-1])),
        ],
        axis=-1,
    ).reshape(nf * hh * ww, -1)
    return (
        jnp.asarray(np.cos(grid), jnp.float32),
        jnp.asarray(np.sin(grid), jnp.float32),
    )


def forward(
    cfg: WanVideoArchConfig,
    params: dict,
    latents: jax.Array,       # [B, C, F, H, W] current chunk
    timestep: jax.Array,      # [B] train scale
    text: jax.Array,          # [B, S_txt, text_dim]
    text_lens: jax.Array,     # [B]
    history: dict | None = None,   # {"short"/"mid"/"long": latents}
    history_offsets: tuple = (),   # static ((name, first_frame), ...)
    chunk_frame_offset: int = 0,   # current chunk's first latent frame
) -> jax.Array:
    """Velocity for the CURRENT chunk [B, C, F, H, W]."""
    b = latents.shape[0]
    d = cfg.inner_dim
    nh, hd = cfg.num_attention_heads, cfg.attention_head_dim
    eps = cfg.eps
    dt = params["patch_w"].dtype
    pt, ph, pw = cfg.patch_size

    # current chunk tokens
    pw_flat = params["patch_w"].reshape(-1, d)
    cur, (pf, phh, pww) = _patch_tokens(
        latents.astype(dt), cfg.patch_size, pw_flat, params["patch_b"]
    )
    s_cur = cur.shape[1]
    cur_cos, cur_sin = _rope_with_frames(
        cfg, chunk_frame_offset + np.arange(pf), phh, pww
    )

    # memory tokens prepended (short → mid → long order follows the
    # reference's concatenation of processed history segments)
    segs, coss, sins = [], [], []
    if history:
        offsets = dict(history_offsets)
        for name in ("short", "mid", "long"):
            if name not in history:
                continue
            lat_h = history[name]
            toks, (mf, mh, mw) = _patch_tokens(
                jnp.asarray(lat_h, dt), MEMORY_STRIDES[name],
                params[f"mem_{name}_w"], params[f"mem_{name}_b"],
            )
            segs.append(toks)
            first = int(offsets.get(name, 0))
            c_, s_ = _rope_with_frames(
                cfg, first + np.arange(mf), mh, mw
            )
            coss.append(c_)
            sins.append(s_)
    segs.append(cur)
    coss.append(cur_cos)
    sins.append(cur_sin)
    x = jnp.concatenate(segs, axis=1)
    cos = jnp.concatenate(coss, axis=0)
    sin = jnp.concatenate(sins, axis=0)
    s_all = x.shape[1]
    s_hist = s_all - s_cur

    # condition embeddings (wan layout)
    tfeat = wan._timestep_embed(cfg, timestep)
    temb = jnp.dot(tfeat, params["time_w1"]) + params["time_b1"]
    temb = jnp.dot(jax.nn.silu(temb), params["time_w2"]) + params["time_b2"]
    tproj = (
        jnp.dot(jax.nn.silu(temb), params["time_proj_w"])
        + params["time_proj_b"]
    )
    mod_base = tproj.reshape(b, 1, 6, d)
    txt = wan._gelu_tanh(
        jnp.dot(text.astype(jnp.float32), params["text_w1"])
        + params["text_b1"]
    )
    txt = (jnp.dot(txt, params["text_w2"]) + params["text_b2"]).astype(dt)
    s_txt = txt.shape[1]
    txt_mask = jnp.arange(s_txt)[None, :] < text_lens[:, None]

    from ht_vllm_omni_tpu.models.layers import rms_norm

    lp_stack = {
        k: v for k, v in params.items() if k in wan._BLOCK_KEYS
    }
    for li in range(cfg.num_layers):
        lp = {k: v[li] for k, v in lp_stack.items()}
        mod = mod_base.astype(jnp.float32) + lp["mod_table"].astype(
            jnp.float32
        )[None, None]
        sh_m, sc_m, g_m, sh_f, sc_f, g_f = [mod[:, :, i] for i in range(6)]

        # self-attention over [history ; current]
        nx = (wan._layer_norm(x, eps) * (1 + sc_m) + sh_m).astype(dt)
        qkv = jnp.dot(nx, lp["qkv_w"]) + lp["qkv_b"]
        q, k, v = jnp.split(qkv, 3, -1)
        q = rms_norm(q, lp["q_norm"], eps).reshape(b, s_all, nh, hd)
        k = rms_norm(k, lp["k_norm"], eps).reshape(b, s_all, nh, hd)
        v = v.reshape(b, s_all, nh, hd)
        q = wan.apply_rope_interleaved(q, cos, sin)
        k = wan.apply_rope_interleaved(k, cos, sin)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q.astype(jnp.float32),
            k.astype(jnp.float32),
        ) / math.sqrt(hd)
        probs = jax.nn.softmax(scores, -1)
        o = jnp.einsum(
            "bhqk,bkhd->bqhd", probs, v.astype(jnp.float32)
        ).reshape(b, s_all, d)
        o = jnp.dot(o.astype(dt), lp["attn_out_w"]) + lp["attn_out_b"]
        x = (x.astype(jnp.float32) + o.astype(jnp.float32) * g_m).astype(dt)

        # guidance cross-attention: only the CURRENT chunk reads text
        cur_x = x[:, s_hist:]
        if "norm2_g" in lp:
            nx = wan._layer_norm(
                cur_x, eps, lp["norm2_g"], lp["norm2_b"]
            ).astype(dt)
        else:
            nx = cur_x
        q = rms_norm(
            jnp.dot(nx, lp["xq_w"]) + lp["xq_b"], lp["xq_norm"], eps
        ).reshape(b, s_cur, nh, hd)
        k = rms_norm(
            jnp.dot(txt, lp["xk_w"]) + lp["xk_b"], lp["xk_norm"], eps
        ).reshape(b, s_txt, nh, hd)
        v = (jnp.dot(txt, lp["xv_w"]) + lp["xv_b"]).reshape(
            b, s_txt, nh, hd
        )
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q.astype(jnp.float32),
            k.astype(jnp.float32),
        ) / math.sqrt(hd)
        logits = jnp.where(txt_mask[:, None, None, :], logits, -1e30)
        o = jnp.einsum(
            "bhqk,bkhd->bqhd", jax.nn.softmax(logits, -1),
            v.astype(jnp.float32),
        ).reshape(b, s_cur, d)
        o = jnp.dot(o.astype(dt), lp["xattn_out_w"]) + lp["xattn_out_b"]
        x = jnp.concatenate(
            [x[:, :s_hist], cur_x + o.astype(dt)], axis=1
        )

        # FFN
        nx = (wan._layer_norm(x, eps) * (1 + sc_f) + sh_f).astype(dt)
        ff = wan._gelu_tanh(jnp.dot(nx, lp["ffn_w1"]) + lp["ffn_b1"])
        ff = jnp.dot(ff.astype(dt), lp["ffn_w2"]) + lp["ffn_b2"]
        x = (x.astype(jnp.float32) + ff.astype(jnp.float32) * g_f).astype(dt)

    # output head over the current chunk only
    te = temb.astype(jnp.float32)[:, None, :]
    ot = params["out_table"].astype(jnp.float32)
    shift = ot[0][None, None] + te
    scale = ot[1][None, None] + te
    h = x[:, s_hist:]
    h = (wan._layer_norm(h, eps) * (1 + scale) + shift).astype(dt)
    h = jnp.dot(h, params["proj_out_w"]) + params["proj_out_b"]
    c = cfg.out_channels
    h = h.reshape(b, pf, phh, pww, c, pt, ph, pw)
    h = h.transpose(0, 4, 1, 5, 2, 6, 3, 7)
    return h.reshape(b, c, pf * pt, phh * ph, pww * pw)
