"""Causal-3D video VAE (Wan-style) in jax.

Structural counterpart of the reference's AutoencoderKLWan (reference
vllm_omni/diffusion/models/wan2_2/pipeline_wan2_2.py:21 via
DistributedAutoencoderKLWan): causal temporal convolutions (each output
frame sees only itself and earlier frames), per-stage spatial 2x
resampling, temporal 2x resampling on flagged stage transitions, RMS
channel norms, and a spatial attention block in the mid stack.

Layout is channels-last [B, F, H, W, C]; temporal causality comes from
left-only zero padding on the time axis, verified by the causality test
(frame t's decode is bit-identical under changes to frames > t).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.diffusion.models.wan_video.config import (
    WanVideoVAEConfig,
)

_DN3 = ("NDHWC", "DHWIO", "NDHWC")


def _causal_conv3d(x, w, b, *, stride=(1, 1, 1)):
    """x [B, F, H, W, C]; w [kt, kh, kw, Ci, Co]; time pads left-only."""
    kt, kh, kw = w.shape[0], w.shape[1], w.shape[2]
    pad_t = (kt - 1, 0)
    pad_h = ((kh - 1) // 2, kh // 2)
    pad_w = ((kw - 1) // 2, kw // 2)
    out = jax.lax.conv_general_dilated(
        x, w, stride,
        padding=(pad_t, pad_h, pad_w),
        dimension_numbers=_DN3,
        preferred_element_type=jnp.float32,
    )
    return (out + b).astype(x.dtype)


def _channel_rms(x, gamma):
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.sum(xf * xf, axis=-1, keepdims=True) + 1e-24)
    return (
        xf * inv * math.sqrt(x.shape[-1]) * gamma.astype(jnp.float32)
    ).astype(x.dtype)


def _silu(x):
    return jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)


# -------------------------------------------------------------------- init
def _conv_p(key, kt, kh, kw, ci, co, dt):
    scale = 1.0 / math.sqrt(kt * kh * kw * ci)
    return {
        "w": (
            jax.random.normal(key, (kt, kh, kw, ci, co), jnp.float32)
            * scale
        ).astype(dt),
        "b": jnp.zeros((co,), dt),
    }


def _res_p(keys, ci, co, dt):
    return {
        "norm1": jnp.ones((ci,), dt),
        "conv1": _conv_p(keys[0], 3, 3, 3, ci, co, dt),
        "norm2": jnp.ones((co,), dt),
        "conv2": _conv_p(keys[1], 3, 3, 3, co, co, dt),
        "skip": (
            _conv_p(keys[2], 1, 1, 1, ci, co, dt) if ci != co else None
        ),
    }


def _attn_p(keys, c, dt):
    return {
        "norm": jnp.ones((c,), dt),
        "qkv": _conv_p(keys[0], 1, 1, 1, c, 3 * c, dt),
        "proj": _conv_p(keys[1], 1, 1, 1, c, c, dt),
    }


def init_params(cfg: WanVideoVAEConfig, key: jax.Array) -> dict:
    dt = jnp.dtype(cfg.dtype)
    dims = [cfg.base_dim * m for m in cfg.dim_mult]
    keys = iter(jax.random.split(key, 256))

    def ks(n):
        return [next(keys) for _ in range(n)]

    # ----- decoder: z -> video (dims reversed)
    rdims = dims[::-1]
    dec_up = []
    for i in range(len(rdims)):
        blocks = []
        ci = rdims[max(i - 1, 0)] if i > 0 else rdims[0]
        for j in range(cfg.num_res_blocks + 1):
            blocks.append(_res_p(ks(3), ci, rdims[i], dt))
            ci = rdims[i]
        upsample = None
        if i < len(rdims) - 1:
            upsample = {
                "conv": _conv_p(ks(1)[0], 3, 3, 3, rdims[i], rdims[i], dt),
            }
        dec_up.append({"res": blocks, "upsample": upsample})
    decoder = {
        "conv_in": _conv_p(ks(1)[0], 3, 3, 3, cfg.z_dim, rdims[0], dt),
        "mid": {
            "res1": _res_p(ks(3), rdims[0], rdims[0], dt),
            "attn": _attn_p(ks(2), rdims[0], dt),
            "res2": _res_p(ks(3), rdims[0], rdims[0], dt),
        },
        "up": dec_up,
        "norm_out": jnp.ones((rdims[-1],), dt),
        "conv_out": _conv_p(
            ks(1)[0], 3, 3, 3, rdims[-1], cfg.input_channels, dt
        ),
    }

    # ----- encoder: video -> z (posterior mean + logvar)
    enc_down = []
    for i in range(len(dims)):
        blocks = []
        ci = dims[max(i - 1, 0)] if i > 0 else dims[0]
        for j in range(cfg.num_res_blocks):
            blocks.append(_res_p(ks(3), ci, dims[i], dt))
            ci = dims[i]
        downsample = None
        if i < len(dims) - 1:
            downsample = {
                "conv": _conv_p(ks(1)[0], 3, 3, 3, dims[i], dims[i], dt),
            }
        enc_down.append({"res": blocks, "downsample": downsample})
    encoder = {
        "conv_in": _conv_p(
            ks(1)[0], 3, 3, 3, cfg.input_channels, dims[0], dt
        ),
        "down": enc_down,
        "mid": {
            "res1": _res_p(ks(3), dims[-1], dims[-1], dt),
            "attn": _attn_p(ks(2), dims[-1], dt),
            "res2": _res_p(ks(3), dims[-1], dims[-1], dt),
        },
        "norm_out": jnp.ones((dims[-1],), dt),
        "conv_out": _conv_p(
            ks(1)[0], 3, 3, 3, dims[-1], 2 * cfg.z_dim, dt
        ),
    }
    return {"decoder": decoder, "encoder": encoder}


# ----------------------------------------------------------------- blocks
def _res_block(p, x):
    h = _causal_conv3d(_silu(_channel_rms(x, p["norm1"])), **p["conv1"])
    h = _causal_conv3d(_silu(_channel_rms(h, p["norm2"])), **p["conv2"])
    skip = x if p["skip"] is None else _causal_conv3d(x, **p["skip"])
    return skip + h


def _attn_block(p, x):
    """Per-frame spatial self-attention (time stays independent)."""
    b, f, h, w, c = x.shape
    nx = _channel_rms(x, p["norm"])
    qkv = _causal_conv3d(nx, **p["qkv"])  # 1x1x1
    q, k, v = jnp.split(qkv.reshape(b * f, h * w, 3 * c), 3, axis=-1)
    logits = jnp.einsum(
        "bqc,bkc->bqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) / math.sqrt(c)
    probs = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bqk,bkc->bqc", probs, v.astype(jnp.float32))
    o = o.reshape(b, f, h, w, c).astype(x.dtype)
    return x + _causal_conv3d(o, **p["proj"])


def _upsample(p, x, temporal: bool):
    """Spatial 2x nearest (+ temporal 2x causal duplication) then conv.
    ``temporal`` is static (from cfg.temporal_resample), never traced."""
    b, f, h, w, c = x.shape
    x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
    if temporal:
        x = jnp.repeat(x, 2, axis=1)
    return _causal_conv3d(x, **p["conv"])


def _downsample(p, x, temporal: bool):
    stride = (2 if temporal else 1, 2, 2)
    return _causal_conv3d(x, **p["conv"], stride=stride)


# ------------------------------------------------------------------ decode
def decode(
    cfg: WanVideoVAEConfig, params: dict, z: jax.Array
    # z [B, F_lat, H_lat, W_lat, Cz] (already de-normalised)
) -> jax.Array:
    p = params["decoder"]
    x = _causal_conv3d(z, **p["conv_in"])
    x = _res_block(p["mid"]["res1"], x)
    x = _attn_block(p["mid"]["attn"], x)
    x = _res_block(p["mid"]["res2"], x)
    rflags = cfg.temporal_resample[::-1]
    for i, blk in enumerate(p["up"]):
        for rp in blk["res"]:
            x = _res_block(rp, x)
        if blk["upsample"] is not None:
            x = _upsample(blk["upsample"], x, rflags[i])
    x = _silu(_channel_rms(x, p["norm_out"]))
    x = _causal_conv3d(x, **p["conv_out"])
    return x.astype(jnp.float32)  # [B, F, H, W, 3] in [-1, 1]-ish


def encode(
    cfg: WanVideoVAEConfig, params: dict, x: jax.Array
    # x [B, F, H, W, 3] in [-1, 1]
) -> jax.Array:
    p = params["encoder"]
    h = _causal_conv3d(x, **p["conv_in"])
    for i, blk in enumerate(p["down"]):
        for rp in blk["res"]:
            h = _res_block(rp, h)
        if blk["downsample"] is not None:
            h = _downsample(blk["downsample"], h, cfg.temporal_resample[i])
    h = _res_block(p["mid"]["res1"], h)
    h = _attn_block(p["mid"]["attn"], h)
    h = _res_block(p["mid"]["res2"], h)
    h = _silu(_channel_rms(h, p["norm_out"]))
    h = _causal_conv3d(h, **p["conv_out"])
    mean, _logvar = jnp.split(h, 2, axis=-1)
    return mean.astype(jnp.float32)  # [B, F_lat, H_lat, W_lat, Cz]


def normalize_latents(cfg: WanVideoVAEConfig, z: jax.Array) -> jax.Array:
    mean = jnp.asarray(cfg.latents_mean, jnp.float32)
    std = jnp.asarray(cfg.latents_std, jnp.float32)
    return (z - mean) / std


def denormalize_latents(cfg: WanVideoVAEConfig, z: jax.Array) -> jax.Array:
    mean = jnp.asarray(cfg.latents_mean, jnp.float32)
    std = jnp.asarray(cfg.latents_std, jnp.float32)
    return z * std + mean
