"""HunyuanVideo 1.5 transformer (jax).

Follows the reference HunyuanVideo15Transformer3DModel (reference
vllm_omni/diffusion/models/hunyuan_video/hunyuan_video_15_transformer.py):

- conditioning sources: a timestep-conditioned token refiner over MLLM
  text features (:226-272), a 3-linear GELU projection of ByT5 glyph
  features (:274-290), and an image-embed projection (:293-309), each
  tagged with a learned cond-type embedding;
- dual-stream MMDiT blocks (adaLN-zero on both streams, GEGLU FFNs);
  RoPE is applied ONLY to the video stream's q/k before concatenation
  (:311-318), 3-axis (frame, h, w) interleaved-pair tables;
- invalid conditioning tokens are excluded through a key-side attention
  mask (the reference reorders valid-first and masks — with key masking
  the order is attention-equivalent);
- AdaLayerNormContinuous output head; timesteps ride the diffusers
  0..1000 scale.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.diffusion.models.hunyuan_video.config import (
    HunyuanVideoArchConfig,
)


# ------------------------------------------------------------------ params
def init_params(cfg: HunyuanVideoArchConfig, key: jax.Array) -> dict:
    L, LR = cfg.num_layers, cfg.num_refiner_layers
    d = cfg.inner_dim
    mh = int(d * cfg.mlp_ratio)
    pin = cfg.patch_size_t * cfg.patch_size**2 * cfg.in_channels
    ks = iter(jax.random.split(key, 48 + 16 * (L + LR)))

    def w(shape, scale=0.02):
        return jax.random.normal(next(ks), shape, jnp.float32) * scale

    def stack(n, shape, scale=0.02):
        return jax.random.normal(
            next(ks), (n,) + shape, jnp.float32
        ) * scale

    return {
        "x_w": w((pin, d)),
        "x_b": jnp.zeros((d,)),
        # time embedding (Timesteps 256 -> MLP)
        "t_w1": w((256, d)), "t_b1": jnp.zeros((d,)),
        "t_w2": w((d, d)), "t_b2": jnp.zeros((d,)),
        # token refiner: pooled-text + timestep embedding
        "r_t_w1": w((256, d)), "r_t_b1": jnp.zeros((d,)),
        "r_t_w2": w((d, d)), "r_t_b2": jnp.zeros((d,)),
        "r_p_w1": w((cfg.text_embed_dim, d)), "r_p_b1": jnp.zeros((d,)),
        "r_p_w2": w((d, d)), "r_p_b2": jnp.zeros((d,)),
        "r_in_w": w((cfg.text_embed_dim, d)), "r_in_b": jnp.zeros((d,)),
        # refiner blocks (stacked): LN affine, plain attention w/ bias,
        # linear-silu FF, AdaNorm gates
        "r_ln1_w": jnp.ones((LR, d)), "r_ln1_b": jnp.zeros((LR, d)),
        "r_qkv_w": stack(LR, (d, 3 * d)), "r_qkv_b": jnp.zeros((LR, 3 * d)),
        "r_out_w": stack(LR, (d, d)), "r_out_b": jnp.zeros((LR, d)),
        "r_ln2_w": jnp.ones((LR, d)), "r_ln2_b": jnp.zeros((LR, d)),
        "r_ff1_w": stack(LR, (d, mh)), "r_ff1_b": jnp.zeros((LR, mh)),
        "r_ff2_w": stack(LR, (mh, d)), "r_ff2_b": jnp.zeros((LR, d)),
        "r_ada_w": stack(LR, (d, 2 * d)), "r_ada_b": jnp.zeros((LR, 2 * d)),
        # byt5 projection
        "b_ln_w": jnp.ones((cfg.text_embed_2_dim,)),
        "b_ln_b": jnp.zeros((cfg.text_embed_2_dim,)),
        "b_w1": w((cfg.text_embed_2_dim, 2048)), "b_b1": jnp.zeros((2048,)),
        "b_w2": w((2048, 2048)), "b_b2": jnp.zeros((2048,)),
        "b_w3": w((2048, d)), "b_b3": jnp.zeros((d,)),
        # image projection
        "i_ln_in_w": jnp.ones((cfg.image_embed_dim,)),
        "i_ln_in_b": jnp.zeros((cfg.image_embed_dim,)),
        "i_w1": w((cfg.image_embed_dim, cfg.image_embed_dim)),
        "i_b1": jnp.zeros((cfg.image_embed_dim,)),
        "i_w2": w((cfg.image_embed_dim, d)), "i_b2": jnp.zeros((d,)),
        "i_ln_out_w": jnp.ones((d,)), "i_ln_out_b": jnp.zeros((d,)),
        "cond_type": w((3, d)),
        # main dual-stream blocks
        "ada_w": stack(L, (d, 6 * d)), "ada_b": jnp.zeros((L, 6 * d)),
        "ada_c_w": stack(L, (d, 6 * d)), "ada_c_b": jnp.zeros((L, 6 * d)),
        "qkv_w": stack(L, (d, 3 * d)), "qkv_b": jnp.zeros((L, 3 * d)),
        "add_qkv_w": stack(L, (d, 3 * d)),
        "add_qkv_b": jnp.zeros((L, 3 * d)),
        "qn": jnp.ones((L, cfg.attention_head_dim)),
        "kn": jnp.ones((L, cfg.attention_head_dim)),
        "add_qn": jnp.ones((L, cfg.attention_head_dim)),
        "add_kn": jnp.ones((L, cfg.attention_head_dim)),
        "out_w": stack(L, (d, d)), "out_b": jnp.zeros((L, d)),
        "add_out_w": stack(L, (d, d)), "add_out_b": jnp.zeros((L, d)),
        "ff1_w": stack(L, (d, 2 * mh)), "ff1_b": jnp.zeros((L, 2 * mh)),
        "ff2_w": stack(L, (mh, d)), "ff2_b": jnp.zeros((L, d)),
        "ffc1_w": stack(L, (d, 2 * mh)), "ffc1_b": jnp.zeros((L, 2 * mh)),
        "ffc2_w": stack(L, (mh, d)), "ffc2_b": jnp.zeros((L, d)),
        # output head
        "o_ada_w": w((d, 2 * d)), "o_ada_b": jnp.zeros((2 * d,)),
        "o_w": w((d, cfg.patch_size_t * cfg.patch_size**2
                  * cfg.out_channels)),
        "o_b": jnp.zeros(
            (cfg.patch_size_t * cfg.patch_size**2 * cfg.out_channels,)
        ),
    }


# ------------------------------------------------------------------- model
def _ln(x, w=None, b=None, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    if w is not None:
        out = out * w + b
    return out.astype(x.dtype)


def _rms(x, w, eps=1e-6):
    v = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
    return (w * (x * jax.lax.rsqrt(v + eps))).astype(x.dtype)


def _sinus(t, dim=256):
    half = dim // 2
    freqs = jnp.exp(
        -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], -1)


def rope_tables(cfg: HunyuanVideoArchConfig, f: int, h: int, w: int):
    """3-axis rope over the (frame, h, w) grid; [S, head_dim//2]."""
    sizes = (
        f // cfg.patch_size_t, h // cfg.patch_size, w // cfg.patch_size
    )
    grids = np.meshgrid(*[np.arange(s) for s in sizes], indexing="ij")
    cs, ss = [], []
    for i, d_ax in enumerate(cfg.rope_axes_dim):
        inv = 1.0 / (
            cfg.rope_theta
            ** (np.arange(0, d_ax, 2, dtype=np.float64) / d_ax)
        )
        fr = grids[i].reshape(-1)[:, None] * inv[None]
        cs.append(np.cos(fr).astype(np.float32))
        ss.append(np.sin(fr).astype(np.float32))
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


def _geglu(x, w, b, w2, b2):
    h, gate = jnp.split(x @ w + b, 2, -1)
    return (h * jax.nn.gelu(gate, approximate=False)) @ w2 + b2


def _refine_text(cfg, p, text, text_mask, t):
    """Token refiner (reference :226-272): masked-mean pooled text +
    timestep -> temb; LN-attention blocks with AdaNorm gates."""
    d = cfg.inner_dim
    nh, hd = cfg.num_attention_heads, cfg.attention_head_dim
    b, s, _ = text.shape
    mf = text_mask.astype(jnp.float32)[..., None]
    pooled = jnp.sum(text * mf, axis=1) / jnp.maximum(
        jnp.sum(mf, axis=1), 1e-6
    )
    temb = jax.nn.silu(_sinus(t) @ p["r_t_w1"] + p["r_t_b1"])
    temb = temb @ p["r_t_w2"] + p["r_t_b2"]
    pe = jax.nn.silu(pooled @ p["r_p_w1"] + p["r_p_b1"])
    temb = temb + (pe @ p["r_p_w2"] + p["r_p_b2"])

    h = text @ p["r_in_w"] + p["r_in_b"]
    keymask = jnp.where(
        text_mask[:, None, None, :] > 0, 0.0, jnp.finfo(jnp.float32).min
    )
    for li in range(cfg.num_refiner_layers):
        n = _ln(h, p["r_ln1_w"][li], p["r_ln1_b"][li])
        qkv = n @ p["r_qkv_w"][li] + p["r_qkv_b"][li]
        q, k, v = jnp.split(qkv, 3, -1)
        q = q.reshape(b, s, nh, hd)
        k = k.reshape(b, s, nh, hd)
        v = v.reshape(b, s, nh, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (hd**-0.5)
        att = jax.nn.softmax(
            scores.astype(jnp.float32) + keymask, -1
        ).astype(h.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, s, d)
        gates = jax.nn.silu(temb) @ p["r_ada_w"][li] + p["r_ada_b"][li]
        g_msa, g_mlp = jnp.split(gates[:, None], 2, -1)
        h = h + (o @ p["r_out_w"][li] + p["r_out_b"][li]) * g_msa
        n = _ln(h, p["r_ln2_w"][li], p["r_ln2_b"][li])
        ff = jax.nn.silu(n @ p["r_ff1_w"][li] + p["r_ff1_b"][li])
        h = h + (ff @ p["r_ff2_w"][li] + p["r_ff2_b"][li]) * g_mlp
    return h


def forward(
    cfg: HunyuanVideoArchConfig,
    p: dict,
    latents: jax.Array,       # [B, C_in, F, H, W]
    text: jax.Array,          # [B, S_t, text_embed_dim] MLLM features
    text_mask: jax.Array,     # [B, S_t]
    text2: jax.Array,         # [B, S_b, text_embed_2_dim] ByT5 features
    text2_mask: jax.Array,    # [B, S_b]
    image_embeds: jax.Array,  # [B, S_i, image_embed_dim] (zeros = t2v)
    timestep: jax.Array,      # [B] diffusers scale (0..1000)
) -> jax.Array:
    b, c, f, hh, ww = latents.shape
    d = cfg.inner_dim
    nh, hd = cfg.num_attention_heads, cfg.attention_head_dim
    pt, ps = cfg.patch_size_t, cfg.patch_size

    # patchify video -> tokens
    x = latents.reshape(b, c, f // pt, pt, hh // ps, ps, ww // ps, ps)
    x = x.transpose(0, 2, 4, 6, 3, 5, 7, 1)
    s_vid = (f // pt) * (hh // ps) * (ww // ps)
    x = x.reshape(b, s_vid, pt * ps * ps * c)
    x = x @ p["x_w"] + p["x_b"]

    temb = jax.nn.silu(_sinus(timestep) @ p["t_w1"] + p["t_b1"])
    temb = temb @ p["t_w2"] + p["t_b2"]
    silu_t = jax.nn.silu(temb)

    # conditioning streams + cond-type tags
    txt = _refine_text(cfg, p, text, text_mask, timestep)
    txt = txt + p["cond_type"][0][None, None]
    b5 = _ln(text2, p["b_ln_w"], p["b_ln_b"])
    b5 = jax.nn.gelu(b5 @ p["b_w1"] + p["b_b1"], approximate=False)
    b5 = jax.nn.gelu(b5 @ p["b_w2"] + p["b_b2"], approximate=False)
    b5 = b5 @ p["b_w3"] + p["b_b3"]
    b5 = b5 + p["cond_type"][1][None, None]
    ie = _ln(image_embeds, p["i_ln_in_w"], p["i_ln_in_b"])
    ie = jax.nn.gelu(ie @ p["i_w1"] + p["i_b1"], approximate=False)
    ie = ie @ p["i_w2"] + p["i_b2"]
    ie = _ln(ie, p["i_ln_out_w"], p["i_ln_out_b"])
    ie = ie + p["cond_type"][2][None, None]
    # t2v: all-zero image embeds are masked out entirely
    img_valid = jnp.any(
        jnp.abs(image_embeds) > 0, axis=(1, 2), keepdims=False
    )
    img_mask = jnp.broadcast_to(
        img_valid[:, None], (b, ie.shape[1])
    ).astype(text_mask.dtype)

    enc = jnp.concatenate([ie, b5, txt], axis=1)
    enc_mask = jnp.concatenate([img_mask, text2_mask, text_mask], axis=1)
    s_enc = enc.shape[1]

    cos, sin = rope_tables(cfg, f, hh, ww)
    # key-side mask: video tokens always visible, invalid cond masked
    keymask = jnp.concatenate(
        [jnp.ones((b, s_vid), enc_mask.dtype), enc_mask], axis=1
    )
    bias = jnp.where(
        keymask[:, None, None, :] > 0, 0.0, jnp.finfo(jnp.float32).min
    )

    for li in range(cfg.num_layers):
        ada = silu_t @ p["ada_w"][li] + p["ada_b"][li]
        sh_m, sc_m, g_m, sh_f, sc_f, g_f = jnp.split(ada[:, None], 6, -1)
        adc = silu_t @ p["ada_c_w"][li] + p["ada_c_b"][li]
        csh_m, csc_m, cg_m, csh_f, csc_f, cg_f = jnp.split(
            adc[:, None], 6, -1
        )
        nx = _ln(x) * (1 + sc_m) + sh_m
        ne = _ln(enc) * (1 + csc_m) + csh_m

        qkv = nx @ p["qkv_w"][li] + p["qkv_b"][li]
        q, k, v = jnp.split(qkv, 3, -1)
        q = _rms(q.reshape(b, s_vid, nh, hd), p["qn"][li])
        k = _rms(k.reshape(b, s_vid, nh, hd), p["kn"][li])
        v = v.reshape(b, s_vid, nh, hd)
        q = _rope_apply(q, cos, sin)
        k = _rope_apply(k, cos, sin)
        aqkv = ne @ p["add_qkv_w"][li] + p["add_qkv_b"][li]
        aq, ak, av = jnp.split(aqkv, 3, -1)
        aq = _rms(aq.reshape(b, s_enc, nh, hd), p["add_qn"][li])
        ak = _rms(ak.reshape(b, s_enc, nh, hd), p["add_kn"][li])
        av = av.reshape(b, s_enc, nh, hd)
        jq = jnp.concatenate([q, aq], 1)
        jk = jnp.concatenate([k, ak], 1)
        jv = jnp.concatenate([v, av], 1)
        scores = jnp.einsum("bqhd,bkhd->bhqk", jq, jk) * (hd**-0.5)
        att = jax.nn.softmax(
            scores.astype(jnp.float32) + bias, -1
        ).astype(x.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", att, jv).reshape(
            b, s_vid + s_enc, d
        )
        ox, oe = o[:, :s_vid], o[:, s_vid:]
        x = x + (ox @ p["out_w"][li] + p["out_b"][li]) * g_m
        enc = enc + (oe @ p["add_out_w"][li] + p["add_out_b"][li]) * cg_m

        nx = _ln(x) * (1 + sc_f) + sh_f
        x = x + _geglu(
            nx, p["ff1_w"][li], p["ff1_b"][li],
            p["ff2_w"][li], p["ff2_b"][li],
        ) * g_f
        ne = _ln(enc) * (1 + csc_f) + csh_f
        enc = enc + _geglu(
            ne, p["ffc1_w"][li], p["ffc1_b"][li],
            p["ffc2_w"][li], p["ffc2_b"][li],
        ) * cg_f

    ada = silu_t @ p["o_ada_w"] + p["o_ada_b"]
    scale, shift = jnp.split(ada, 2, -1)
    x = _ln(x) * (1 + scale)[:, None] + shift[:, None]
    x = x @ p["o_w"] + p["o_b"]

    # unpatchify to [B, C_out, F, H, W]
    co = cfg.out_channels
    x = x.reshape(b, f // pt, hh // ps, ww // ps, co, pt, ps, ps)
    x = x.transpose(0, 4, 1, 5, 2, 6, 3, 7)
    return x.reshape(b, co, f, hh, ww)
