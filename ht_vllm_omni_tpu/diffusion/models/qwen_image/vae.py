"""AutoencoderKLQwenImage in jax (image path, NHWC).

Wan-style causal-3D KL autoencoder (reference
vllm_omni/diffusion/models/qwen_image/autoencoder_kl_qwenimage.py:667):
8x spatial compression, 16 latent channels, channelwise-RMS norms,
single-head spatial attention in the mid blocks.

Weights keep the checkpoint's full 3D kernels [kt, kh, kw, ci, co]; the
image path (one frame) applies only the LAST temporal tap of each causal
kernel — exact, because causal padding places zeros at the two earlier
taps (reference QwenImageCausalConv3d pads (2*pad_t, 0) in front,
autoencoder_kl_qwenimage.py:73).  The temporal branch of ``upsample3d``
is likewise a no-op on the first temporal chunk (reference :170-194
"Rep" cache state), so single-frame decode is spatial-only.  This keeps
the hot path pure 2D convs that XLA tiles onto the MXU.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.diffusion.models.qwen_image.config import (
    QwenImageVAEConfig,
)

_DN = ("NHWC", "HWIO", "NHWC")


def _conv2d(x, w3d, b, *, stride=1, pad="SAME"):
    """x [B,H,W,Ci] conv with the last temporal tap of w3d [kt,kh,kw,Ci,Co]."""
    w = w3d[-1]
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride),
        padding=pad,
        dimension_numbers=_DN,
        preferred_element_type=jnp.float32,
    )
    return (out + b).astype(x.dtype)


def _channel_rms(x, gamma):
    """F.normalize over channels * sqrt(C) * gamma (reference
    QwenImageRMS_norm, autoencoder_kl_qwenimage.py:86-109)."""
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.sum(xf * xf, axis=-1, keepdims=True) + 1e-24)
    return (xf * inv * math.sqrt(x.shape[-1]) * gamma.astype(jnp.float32)
            ).astype(x.dtype)


def _silu(x):
    return jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)


# ------------------------------------------------------------------- init
def _conv_p(key, kt, kh, kw, ci, co, dt):
    scale = 1.0 / math.sqrt(kt * kh * kw * ci)
    return {
        "w": (jax.random.normal(key, (kt, kh, kw, ci, co), jnp.float32)
              * scale).astype(dt),
        "b": jnp.zeros((co,), dt),
    }


def _res_p(keys, ci, co, dt):
    p = {
        "norm1": jnp.ones((ci,), dt),
        "conv1": _conv_p(next(keys), 3, 3, 3, ci, co, dt),
        "norm2": jnp.ones((co,), dt),
        "conv2": _conv_p(next(keys), 3, 3, 3, co, co, dt),
    }
    if ci != co:
        p["shortcut"] = _conv_p(next(keys), 1, 1, 1, ci, co, dt)
    return p


def _attn_p(keys, c, dt):
    return {
        "norm": jnp.ones((c,), dt),
        "qkv": _conv_p(next(keys), 1, 1, 1, c, 3 * c, dt),
        "proj": _conv_p(next(keys), 1, 1, 1, c, c, dt),
    }


def _mid_p(keys, c, dt):
    return {
        "res0": _res_p(keys, c, c, dt),
        "attn": _attn_p(keys, c, dt),
        "res1": _res_p(keys, c, c, dt),
    }


def init_params(cfg: QwenImageVAEConfig, key: jax.Array) -> dict:
    dt = jnp.dtype(cfg.dtype)
    keys = iter(jax.random.split(key, 256))
    mult = list(cfg.dim_mult)
    z2 = cfg.z_dim * 2

    # ---- decoder (reference QwenImageDecoder3d:549)
    ddims = [cfg.base_dim * u for u in [mult[-1]] + mult[::-1]]
    dec: dict = {
        "conv_in": _conv_p(next(keys), 3, 3, 3, cfg.z_dim, ddims[0], dt),
        "mid": _mid_p(keys, ddims[0], dt),
        "up": [],
        "norm_out": jnp.ones((ddims[-1],), dt),
        "conv_out": _conv_p(next(keys), 3, 3, 3, ddims[-1],
                            cfg.input_channels, dt),
    }
    for i, (ci, co) in enumerate(zip(ddims[:-1], ddims[1:])):
        if i > 0:
            ci = ci // 2
        blk = {"res": [], "upsample": None}
        cur = ci
        for _ in range(cfg.num_res_blocks + 1):
            blk["res"].append(_res_p(keys, cur, co, dt))
            cur = co
        if i != len(mult) - 1:
            blk["upsample"] = _conv_p(next(keys), 1, 3, 3, co, co // 2, dt)
        dec["up"].append(blk)

    # ---- encoder (reference QwenImageEncoder3d:372)
    edims = [cfg.base_dim * u for u in [1] + mult]
    enc: dict = {
        "conv_in": _conv_p(next(keys), 3, 3, 3, cfg.input_channels,
                           edims[0], dt),
        "down": [],
        "mid": _mid_p(keys, edims[-1], dt),
        "norm_out": jnp.ones((edims[-1],), dt),
        "conv_out": _conv_p(next(keys), 3, 3, 3, edims[-1], z2, dt),
    }
    for i, (ci, co) in enumerate(zip(edims[:-1], edims[1:])):
        blk = {"res": [], "downsample": None}
        cur = ci
        for _ in range(cfg.num_res_blocks):
            blk["res"].append(_res_p(keys, cur, co, dt))
            cur = co
        if i != len(mult) - 1:
            blk["downsample"] = _conv_p(next(keys), 1, 3, 3, co, co, dt)
        enc["down"].append(blk)

    return {
        "decoder": dec,
        "encoder": enc,
        "quant_conv": _conv_p(next(keys), 1, 1, 1, z2, z2, dt),
        "post_quant_conv": _conv_p(next(keys), 1, 1, 1, cfg.z_dim,
                                   cfg.z_dim, dt),
    }


# ---------------------------------------------------------------- blocks
def _res_block(p, x):
    h = x
    if "shortcut" in p:
        h = _conv2d(x, p["shortcut"]["w"], p["shortcut"]["b"])
    y = _silu(_channel_rms(x, p["norm1"]))
    y = _conv2d(y, p["conv1"]["w"], p["conv1"]["b"])
    y = _silu(_channel_rms(y, p["norm2"]))
    y = _conv2d(y, p["conv2"]["w"], p["conv2"]["b"])
    return y + h


def _attn_block(p, x):
    b, h, w, c = x.shape
    y = _channel_rms(x, p["norm"])
    qkv = _conv2d(y, p["qkv"]["w"], p["qkv"]["b"]).reshape(b, h * w, 3, c)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    s = jnp.einsum(
        "bqc,bkc->bqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) / math.sqrt(c)
    a = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bqk,bkc->bqc", a, v.astype(jnp.float32)).astype(x.dtype)
    o = _conv2d(o.reshape(b, h, w, c), p["proj"]["w"], p["proj"]["b"])
    return o + x


def _mid_block(p, x):
    x = _res_block(p["res0"], x)
    x = _attn_block(p["attn"], x)
    return _res_block(p["res1"], x)


def _upsample(p, x):
    b, h, w, c = x.shape
    # nearest-exact 2x then 3x3 conv to c//2 (reference QwenImageResample
    # "upsample2d"/"upsample3d" spatial branch, :147-157)
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return _conv2d(x, p["w"], p["b"])


def _downsample(p, x):
    # zero-pad right/bottom by 1 then stride-2 3x3 conv (reference :160)
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return _conv2d(x, p["w"], p["b"], stride=2, pad="VALID")


# ----------------------------------------------------------------- decode
def decode(
    cfg: QwenImageVAEConfig, params: dict, z: jax.Array  # [B, Hl, Wl, Cz]
) -> jax.Array:
    """Latents (already de-normalised) -> image [B, H*r, W*r, 3] fp32."""
    p = params["decoder"]
    z = _conv2d(
        z.astype(params["post_quant_conv"]["w"].dtype),
        params["post_quant_conv"]["w"], params["post_quant_conv"]["b"],
    )
    x = _conv2d(z, p["conv_in"]["w"], p["conv_in"]["b"])
    x = _mid_block(p["mid"], x)
    for blk in p["up"]:
        for rp in blk["res"]:
            x = _res_block(rp, x)
        if blk["upsample"] is not None:
            x = _upsample(blk["upsample"], x)
    x = _silu(_channel_rms(x, p["norm_out"]))
    x = _conv2d(x, p["conv_out"]["w"], p["conv_out"]["b"])
    return x.astype(jnp.float32)


def encode(
    cfg: QwenImageVAEConfig, params: dict, x: jax.Array  # [B, H, W, 3]
) -> jax.Array:
    """Image -> latent distribution mean [B, Hl, Wl, Cz] (mode of the
    posterior; logvar is discarded as in deterministic encode)."""
    p = params["encoder"]
    x = _conv2d(
        x.astype(p["conv_in"]["w"].dtype), p["conv_in"]["w"],
        p["conv_in"]["b"],
    )
    for blk in p["down"]:
        for rp in blk["res"]:
            x = _res_block(rp, x)
        if blk["downsample"] is not None:
            x = _downsample(blk["downsample"], x)
    x = _mid_block(p["mid"], x)
    x = _silu(_channel_rms(x, p["norm_out"]))
    x = _conv2d(x, p["conv_out"]["w"], p["conv_out"]["b"])
    x = _conv2d(x, params["quant_conv"]["w"], params["quant_conv"]["b"])
    mean, _logvar = jnp.split(x, 2, axis=-1)
    return mean.astype(jnp.float32)


def normalize_latents(cfg: QwenImageVAEConfig, z: jax.Array) -> jax.Array:
    """Encoder output -> model space: (z - mean) / std."""
    mean = jnp.asarray(cfg.latents_mean, jnp.float32)
    std = jnp.asarray(cfg.latents_std, jnp.float32)
    return (z - mean) / std


def denormalize_latents(cfg: QwenImageVAEConfig, z: jax.Array) -> jax.Array:
    """Model space -> decoder input: z * std + mean (reference
    pipeline_qwen_image.py:810-818)."""
    mean = jnp.asarray(cfg.latents_mean, jnp.float32)
    std = jnp.asarray(cfg.latents_std, jnp.float32)
    return z * std + mean


def decode_tiled(
    cfg: QwenImageVAEConfig,
    params: dict,
    z: jax.Array,  # [B, Hl, Wl, Cz]
    *,
    tile: int = 32,
    overlap: int = 8,
    _decode_fn=None,
) -> jax.Array:
    """Tiled decode for large frames (reference parity: diffusers
    AutoencoderKL.enable_tiling / tiled_decode, which the reference
    pipelines turn on for big images): decode overlapping latent tiles
    and feather-blend the seams, bounding the decoder's activation peak
    at the cost of border numerics inside the overlap band.

    Tile starts are clamped so every tile has the SAME latent shape
    (one XLA compile); the final placement alpha-ramps each seam over
    its actual overlap width.  Single-chip counterpart of the
    distributed VAE patch decode (diffusion/vae_parallel.py).
    """
    import numpy as np

    b, hl, wl, _ = z.shape
    if hl <= tile and wl <= tile:
        return decode(cfg, params, z)
    r = cfg.spatial_ratio
    # per-axis tile edges: a dimension smaller than ``tile`` keeps its
    # full extent (otherwise start clamping would go negative on
    # non-square latents, e.g. 64x24)
    tile_h = min(tile, hl)
    tile_w = min(tile, wl)

    def starts(total, t):
        stride = max(t - overlap, 1)
        ss = list(range(0, max(total - t, 0) + 1, stride))
        if ss[-1] != total - t:
            ss.append(total - t)
        return ss

    dec = _decode_fn or (lambda zt: decode(cfg, params, zt))
    out = np.zeros((b, hl * r, wl * r, 3), np.float32)
    weight = np.zeros((1, hl * r, wl * r, 1), np.float32)
    ramp_len = overlap * r

    def ramp(n, px):
        """Per-axis alpha: ramps up over the leading overlap band."""
        a = np.ones(px, np.float32)
        if n > 0:
            a[:ramp_len] = np.linspace(0.0, 1.0, ramp_len, endpoint=False)
        return a

    for i in starts(hl, tile_h):
        for j in starts(wl, tile_w):
            tile_img = np.asarray(
                dec(z[:, i : i + tile_h, j : j + tile_w, :]),
                np.float32,
            )
            ph, pw = tile_h * r, tile_w * r
            alpha = (
                ramp(i, ph)[None, :, None, None]
                * ramp(j, pw)[None, None, :, None]
            )
            ys, xs = i * r, j * r
            out[:, ys : ys + ph, xs : xs + pw] = (
                out[:, ys : ys + ph, xs : xs + pw] * (1 - alpha)
                + tile_img * alpha
            )
            weight[:, ys : ys + ph, xs : xs + pw] = 1.0
    assert weight.all(), "tiled decode left uncovered pixels"
    return jnp.asarray(out)


# latent edge above which decode_pixels switches to the tiled path
VAE_TILE_THRESHOLD = 48


def decode_pixels(
    cfg: QwenImageVAEConfig, params: dict, z: jax.Array, fns: dict
) -> jax.Array:
    """Denormalized NHWC latents -> [B, H, W, 3] float image in [0, 1].

    Shared finalize path for the 2D-KL-VAE families (qwen-image, flux,
    sd3, z-image): single-shot decode below VAE_TILE_THRESHOLD latents
    per edge, feather-blended tiled decode (decode_tiled) above it.
    ``fns`` is the caller's jit cache (params ride as arguments, never
    as closure constants — closed-over weights bake into the HLO)."""
    _, hl, wl, _ = z.shape
    if max(hl, wl) <= VAE_TILE_THRESHOLD:
        fn = fns.get("vae_full")
        if fn is None:
            fn = jax.jit(
                lambda p, zt: jnp.clip(
                    decode(cfg, p, zt) * 0.5 + 0.5, 0.0, 1.0
                )
            )
            fns["vae_full"] = fn
        return fn(params, z)
    fn = fns.get("vae_tile")
    if fn is None:
        fn = jax.jit(lambda p, zt: decode(cfg, p, zt))
        fns["vae_tile"] = fn
    img = decode_tiled(
        cfg, params, z, _decode_fn=lambda zt: fn(params, zt)
    )
    return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)
