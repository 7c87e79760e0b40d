"""Flux transformer in jax: dual-stream MMDiT blocks + single-stream
blocks.

Semantics follow the reference FluxTransformer2DModel (reference
vllm_omni/diffusion/models/flux/flux_transformer.py:450-700): the
conditioning vector sums sinusoidal timestep, (optional) sinusoidal
guidance, and the pooled CLIP projection — each through its own MLP;
19 dual-stream blocks run joint [txt || img] attention with per-stream
AdaLN-zero modulation (shared structure with the Qwen-Image MMDiT, whose
block helpers this module reuses); 38 single-stream blocks then process
the concatenated sequence with a fused attention+MLP residual; an
AdaLN-continuous head projects the image tokens.

Both block families are stacked on a leading axis and run under
``lax.scan``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.diffusion.models.flux.config import FluxArchConfig
from ht_vllm_omni_tpu.diffusion.models.qwen_image.transformer import (
    _layer_norm,
    _mlp_gelu,
    _modulate,
    apply_rope_interleaved,
)
from ht_vllm_omni_tpu.models.layers import rms_norm
from ht_vllm_omni_tpu.ops.flash_attention import flash_attention


def _dt(cfg: FluxArchConfig):
    return jnp.dtype(cfg.dtype)


def init_params(cfg: FluxArchConfig, key: jax.Array) -> dict:
    dt = _dt(cfg)
    d = cfg.inner_dim
    nl, ns = cfg.num_layers, cfg.num_single_layers
    hd = cfg.attention_head_dim
    jd = cfg.joint_attention_dim
    mlp = 4 * d
    keys = iter(jax.random.split(key, 48))

    def w(shape, scale=None):
        scale = scale or (1.0 / math.sqrt(shape[-2] if len(shape) > 1 else 1))
        return (
            jax.random.normal(next(keys), shape, jnp.float32) * scale
        ).astype(dt)

    def z(shape):
        return jnp.zeros(shape, dt)

    p = {
        "img_in_w": w((cfg.in_channels, d)), "img_in_b": z((d,)),
        "txt_in_w": w((jd, d)), "txt_in_b": z((d,)),
        "t_emb_w1": w((256, d)), "t_emb_b1": z((d,)),
        "t_emb_w2": w((d, d)), "t_emb_b2": z((d,)),
        "pool_w1": w((cfg.pooled_projection_dim, d)), "pool_b1": z((d,)),
        "pool_w2": w((d, d)), "pool_b2": z((d,)),
        "norm_out_w": w((d, 2 * d)), "norm_out_b": z((2 * d,)),
        "proj_out_w": w((d, cfg.out_channels)),
        "proj_out_b": z((cfg.out_channels,)),
    }
    if cfg.guidance_embeds:
        p["g_emb_w1"] = w((256, d))
        p["g_emb_b1"] = z((d,))
        p["g_emb_w2"] = w((d, d))
        p["g_emb_b2"] = z((d,))
    # dual-stream blocks (same layout as the Qwen-Image MMDiT block)
    for s in ("img", "txt"):
        p[f"{s}_mod_w"] = w((nl, d, 6 * d))
        p[f"{s}_mod_b"] = z((nl, 6 * d))
        p[f"{s}_qkv_w"] = w((nl, d, 3 * d))
        p[f"{s}_qkv_b"] = z((nl, 3 * d))
        p[f"{s}_q_norm"] = jnp.ones((nl, hd), dt)
        p[f"{s}_k_norm"] = jnp.ones((nl, hd), dt)
        p[f"{s}_attn_out_w"] = w((nl, d, d))
        p[f"{s}_attn_out_b"] = z((nl, d))
        p[f"{s}_mlp_w1"] = w((nl, d, mlp))
        p[f"{s}_mlp_b1"] = z((nl, mlp))
        p[f"{s}_mlp_w2"] = w((nl, mlp, d))
        p[f"{s}_mlp_b2"] = z((nl, d))
    # single-stream blocks: AdaLN-zero-single (3 mods), fused qkv+mlp_in,
    # one output projection over [attn || gelu(mlp)]
    p.update(
        {
            "s_mod_w": w((ns, d, 3 * d)),
            "s_mod_b": z((ns, 3 * d)),
            "s_qkv_w": w((ns, d, 3 * d)),
            "s_qkv_b": z((ns, 3 * d)),
            "s_q_norm": jnp.ones((ns, hd), dt),
            "s_k_norm": jnp.ones((ns, hd), dt),
            "s_mlp_w": w((ns, d, 4 * d)),
            "s_mlp_b": z((ns, 4 * d)),
            "s_out_w": w((ns, 5 * d, d)),
            "s_out_b": z((ns, d)),
        }
    )
    return p


_DUAL_PREFIXES = (
    "img_mod", "txt_mod", "img_qkv", "txt_qkv", "img_q_norm", "img_k_norm",
    "txt_q_norm", "txt_k_norm", "img_attn_out", "txt_attn_out",
    "img_mlp", "txt_mlp",
)
_SINGLE_KEYS = (
    "s_mod_w", "s_mod_b", "s_qkv_w", "s_qkv_b", "s_q_norm", "s_k_norm",
    "s_mlp_w", "s_mlp_b", "s_out_w", "s_out_b",
)


def _sin_proj(t, w1, b1, w2, b2, dt):
    half = 128
    freqs = jnp.exp(
        -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = 1000.0 * t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    emb = emb.astype(dt)
    h = jnp.dot(emb, w1) + b1
    h = jax.nn.silu(h.astype(jnp.float32)).astype(dt)
    return jnp.dot(h, w2) + b2


def forward(
    cfg: FluxArchConfig,
    params: dict,
    img_tokens: jax.Array,  # [B, S_img, in_channels] packed 2x2 latents
    txt_embeds: jax.Array,  # [B, S_txt, joint_attention_dim]
    txt_lens: jax.Array,  # [B]
    pooled: jax.Array,  # [B, pooled_projection_dim]
    timestep: jax.Array,  # [B] sigma in [0, 1]
    guidance: jax.Array | None,  # [B] guidance scale (distilled models)
    img_shape: tuple[int, int, int],  # static (1, lat_h//2, lat_w//2)
) -> jax.Array:
    dt = _dt(cfg)
    b, s_img, _ = img_tokens.shape
    s_txt = txt_embeds.shape[1]
    nh, hd = cfg.num_attention_heads, cfg.attention_head_dim
    d = cfg.inner_dim

    img = jnp.dot(img_tokens.astype(dt), params["img_in_w"]) + (
        params["img_in_b"]
    )
    txt = jnp.dot(txt_embeds.astype(dt), params["txt_in_w"]) + (
        params["txt_in_b"]
    )

    # CombinedTimestepGuidanceTextProjEmbeddings: sum of three MLPs
    temb = _sin_proj(
        timestep, params["t_emb_w1"], params["t_emb_b1"],
        params["t_emb_w2"], params["t_emb_b2"], dt,
    )
    if cfg.guidance_embeds and guidance is not None:
        temb = temb + _sin_proj(
            guidance, params["g_emb_w1"], params["g_emb_b1"],
            params["g_emb_w2"], params["g_emb_b2"], dt,
        )
    ph = jax.nn.silu(
        (jnp.dot(pooled.astype(dt), params["pool_w1"]) + params["pool_b1"])
        .astype(jnp.float32)
    ).astype(dt)
    temb = temb + jnp.dot(ph, params["pool_w2"]) + params["pool_b2"]
    temb_act = jax.nn.silu(temb.astype(jnp.float32)).astype(dt)

    icos, isin, tcos, tsin = _flux_rope(cfg, img_shape, s_txt)
    joint_lens = (s_img + txt_lens).astype(jnp.int32)

    # ------------------------------------------------ dual-stream blocks
    def dual(carry, lp):
        img, txt = carry
        img_mod = jnp.dot(temb_act, lp["img_mod_w"]) + lp["img_mod_b"]
        txt_mod = jnp.dot(temb_act, lp["txt_mod_w"]) + lp["txt_mod_b"]
        img_mod1, img_mod2 = jnp.split(img_mod, 2, axis=-1)
        txt_mod1, txt_mod2 = jnp.split(txt_mod, 2, axis=-1)

        img_n, img_gate1 = _modulate(_layer_norm(img), img_mod1)
        txt_n, txt_gate1 = _modulate(_layer_norm(txt), txt_mod1)

        def qkv(x, w, bias, qn, kn, cos, sin):
            y = jnp.dot(x, w) + bias
            q, k, v = jnp.split(y, 3, axis=-1)
            q = q.reshape(b, -1, nh, hd)
            k = k.reshape(b, -1, nh, hd)
            v = v.reshape(b, -1, nh, hd)
            q = rms_norm(q, qn, 1e-6)
            k = rms_norm(k, kn, 1e-6)
            q = apply_rope_interleaved(q, cos, sin)
            k = apply_rope_interleaved(k, cos, sin)
            return q, k, v

        iq, ik, iv = qkv(
            img_n, lp["img_qkv_w"], lp["img_qkv_b"],
            lp["img_q_norm"], lp["img_k_norm"], icos, isin,
        )
        tq, tk, tv = qkv(
            txt_n, lp["txt_qkv_w"], lp["txt_qkv_b"],
            lp["txt_q_norm"], lp["txt_k_norm"], tcos, tsin,
        )
        q = jnp.concatenate([iq, tq], axis=1).transpose(0, 2, 1, 3)
        k = jnp.concatenate([ik, tk], axis=1).transpose(0, 2, 1, 3)
        v = jnp.concatenate([iv, tv], axis=1).transpose(0, 2, 1, 3)
        o = flash_attention(q, k, v, joint_lens, causal=False)
        o = o.transpose(0, 2, 1, 3).reshape(b, s_img + s_txt, d)
        o_img, o_txt = o[:, :s_img], o[:, s_img:]

        img = img + img_gate1 * (
            jnp.dot(o_img, lp["img_attn_out_w"]) + lp["img_attn_out_b"]
        ).astype(img.dtype)
        txt = txt + txt_gate1 * (
            jnp.dot(o_txt, lp["txt_attn_out_w"]) + lp["txt_attn_out_b"]
        ).astype(txt.dtype)

        img_n2, img_gate2 = _modulate(_layer_norm(img), img_mod2)
        img = img + img_gate2 * _mlp_gelu(
            img_n2, lp["img_mlp_w1"], lp["img_mlp_b1"],
            lp["img_mlp_w2"], lp["img_mlp_b2"],
        ).astype(img.dtype)
        txt_n2, txt_gate2 = _modulate(_layer_norm(txt), txt_mod2)
        txt = txt + txt_gate2 * _mlp_gelu(
            txt_n2, lp["txt_mlp_w1"], lp["txt_mlp_b1"],
            lp["txt_mlp_w2"], lp["txt_mlp_b2"],
        ).astype(txt.dtype)
        return (img, txt), None

    dual_tree = {
        k: v
        for k, v in params.items()
        if any(
            k == pfx or k.startswith(pfx + "_") for pfx in _DUAL_PREFIXES
        )
    }
    (img, txt), _ = jax.lax.scan(dual, (img, txt), dual_tree)

    # ------------------------------------------------ single-stream blocks
    x = jnp.concatenate([img, txt], axis=1)  # [B, S_img + S_txt, D]
    cos = jnp.concatenate([icos, tcos], axis=0)
    sin = jnp.concatenate([isin, tsin], axis=0)

    def single(x, lp):
        mod = jnp.dot(temb_act, lp["s_mod_w"]) + lp["s_mod_b"]
        xn, gate = _modulate(_layer_norm(x), mod)
        qkv_y = jnp.dot(xn, lp["s_qkv_w"]) + lp["s_qkv_b"]
        q, k, v = jnp.split(qkv_y, 3, axis=-1)
        q = rms_norm(q.reshape(b, -1, nh, hd), lp["s_q_norm"], 1e-6)
        k = rms_norm(k.reshape(b, -1, nh, hd), lp["s_k_norm"], 1e-6)
        v = v.reshape(b, -1, nh, hd)
        q = apply_rope_interleaved(q, cos, sin)
        k = apply_rope_interleaved(k, cos, sin)
        o = flash_attention(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            joint_lens, causal=False,
        ).transpose(0, 2, 1, 3).reshape(b, -1, d)
        mlp = jax.nn.gelu(
            (jnp.dot(xn, lp["s_mlp_w"]) + lp["s_mlp_b"]).astype(
                jnp.float32
            ),
            approximate=True,
        ).astype(x.dtype)
        fused = jnp.concatenate([o, mlp], axis=-1)  # [B, S, 5D]
        y = jnp.dot(fused, lp["s_out_w"]) + lp["s_out_b"]
        return x + gate * y.astype(x.dtype), None

    single_tree = {k: params[k] for k in _SINGLE_KEYS}
    x, _ = jax.lax.scan(single, x, single_tree)
    img = x[:, :s_img]

    head = jnp.dot(temb_act, params["norm_out_w"]) + params["norm_out_b"]
    scale, shift = jnp.split(head, 2, axis=-1)
    img = _layer_norm(img) * (1.0 + scale[:, None, :]) + shift[:, None, :]
    out = (
        jnp.dot(
            img, params["proj_out_w"], preferred_element_type=jnp.float32
        )
        + params["proj_out_b"].astype(jnp.float32)
    )
    return out


def _flux_rope(cfg: FluxArchConfig, img_shape, txt_len: int):
    """FluxPosEmbed tables (reference flux_transformer.py:420-447):
    image ids are (idx, y, x) from the origin — segment idx is 0 for the
    target grid and i for the i-th conditioning-image segment (Kontext
    sets image_ids[..., 0] = 1, pipeline_flux_kontext.py:421); text ids
    are all-zero, so text tokens rotate by identity on every axis."""
    from ht_vllm_omni_tpu.diffusion.models.qwen_image.transformer import (
        normalize_shapes,
    )

    shapes = normalize_shapes(img_shape)
    theta = cfg.rope_theta

    def axis_freqs(positions, dim):
        half = dim // 2
        inv = 1.0 / (
            theta ** (jnp.arange(0, half, dtype=jnp.float32) / half)
        )
        return positions[:, None].astype(jnp.float32) * inv

    d_f, d_h, d_w = cfg.axes_dims_rope
    grids = []
    for idx, (f, h, wd) in enumerate(shapes):
        ff = axis_freqs(idx + jnp.arange(f, dtype=jnp.float32), d_f)
        fh = axis_freqs(jnp.arange(h, dtype=jnp.float32), d_h)
        fw = axis_freqs(jnp.arange(wd, dtype=jnp.float32), d_w)
        grids.append(
            jnp.concatenate(
                [
                    jnp.broadcast_to(
                        ff[:, None, None, :], (f, h, wd, d_f // 2)
                    ),
                    jnp.broadcast_to(
                        fh[None, :, None, :], (f, h, wd, d_h // 2)
                    ),
                    jnp.broadcast_to(
                        fw[None, None, :, :], (f, h, wd, d_w // 2)
                    ),
                ],
                axis=-1,
            ).reshape(f * h * wd, -1)
        )
    grid = jnp.concatenate(grids, axis=0)
    txt = jnp.zeros(
        (txt_len, sum(cfg.axes_dims_rope) // 2), jnp.float32
    )
    return jnp.cos(grid), jnp.sin(grid), jnp.cos(txt), jnp.sin(txt)
