"""DreamID-Omni fusion trunk (jax): two Wan models joined block-wise.

Follows the reference FusionModel (reference vllm_omni/diffusion/models/
dreamid_omni/fusion.py): a video Wan trunk and an audio Wan trunk run
in lockstep; inside every block's cross-attention step, each modality
ADDS an extra attention over the other modality through injected
``k_fusion``/``v_fusion`` projections with a fusion pre-norm and RMS
k-norm (:36-67, :120-140).  Per the reference ordering (:180-283), both
modalities first run modulated self-attention, then the audio fuses
against the post-self-attention video while the video fuses against the
PRE-cross-attention audio snapshot.

Both trunks reuse the Wan parameter layout
(diffusion/models/wan_video/transformer.py); audio tokens ride the 3D
rope with a (frames, 1, 1) grid.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.diffusion.models.wan_video import transformer as wan
from ht_vllm_omni_tpu.diffusion.models.wan_video.config import (
    WanVideoArchConfig,
)


def init_fusion_params(
    cfg: WanVideoArchConfig, key: jax.Array
) -> dict:
    """Injected fusion projections for one trunk (one set per layer)."""
    d, nl = cfg.inner_dim, cfg.num_layers
    k1, k2 = jax.random.split(key)
    scale = 1.0 / math.sqrt(d)
    return {
        "kf_w": jax.random.normal(k1, (nl, d, d), jnp.float32) * scale,
        "kf_b": jnp.zeros((nl, d)),
        "vf_w": jax.random.normal(k2, (nl, d, d), jnp.float32) * scale,
        "vf_b": jnp.zeros((nl, d)),
        "fn_g": jnp.ones((nl, d)),
        "fn_b": jnp.zeros((nl, d)),
        "kf_norm": jnp.ones((nl, d)),
    }


def _embed_tokens(cfg, params, latents, timestep, text, text_lens):
    """Patch-embed + condition-embed one trunk's inputs (the prologue of
    wan.forward, kept in sync with it)."""
    b, c, f, h, w_ = latents.shape
    pt, ph, pw = cfg.patch_size
    pf, phh, pww = f // pt, h // ph, w_ // pw
    s = pf * phh * pww
    d = cfg.inner_dim
    dt = params["patch_w"].dtype

    x = latents.astype(dt).transpose(0, 2, 3, 4, 1)
    x = x.reshape(b, pf, pt, phh, ph, pww, pw, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(b, s, pt * ph * pw * c)
    pw_flat = params["patch_w"].reshape(pt * ph * pw * c, d)
    x = (
        jnp.dot(x, pw_flat, preferred_element_type=jnp.float32)
        + params["patch_b"].astype(jnp.float32)
    ).astype(dt)

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
    txt_mask = jnp.arange(txt.shape[1])[None, :] < text_lens[:, None]
    cos, sin = wan.rope_3d(cfg, pf, phh, pww)
    return x, temb, mod_base, txt, txt_mask, (cos, sin), (pf, phh, pww)


def _self_attn(cfg, lp, hidden, mod, rope):
    b, s, d = hidden.shape
    nh, hd = cfg.num_attention_heads, cfg.attention_head_dim
    eps = cfg.eps
    dt = hidden.dtype
    cos, sin = rope
    sh, sc, g = mod[:, :, 0], mod[:, :, 1], mod[:, :, 2]
    nx = (wan._layer_norm(hidden, eps) * (1 + sc) + sh).astype(dt)
    qkv = jnp.dot(nx, lp["qkv_w"]) + lp["qkv_b"]
    q, k, v = jnp.split(qkv, 3, -1)
    from ht_vllm_omni_tpu.models.layers import rms_norm

    q = rms_norm(q, lp["q_norm"], eps).reshape(b, s, nh, hd)
    k = rms_norm(k, lp["k_norm"], eps).reshape(b, s, nh, hd)
    v = v.reshape(b, s, nh, hd)
    q = wan.apply_rope_interleaved(q, cos, sin)
    k = wan.apply_rope_interleaved(k, cos, sin)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) / math.sqrt(hd)
    probs = jax.nn.softmax(scores, -1)
    o = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32))
    o = o.reshape(b, s, d)
    o = jnp.dot(o.astype(dt), lp["attn_out_w"]) + lp["attn_out_b"]
    return (
        hidden.astype(jnp.float32) + o.astype(jnp.float32) * g
    ).astype(dt)


def _fused_cross_ffn(
    cfg, lp, fp, hidden, mod, rope, other, other_rope, txt, txt_mask
):
    """Text cross-attention + fusion attention over the other modality +
    modulated FFN (single_fusion_cross_attention_ffn_forward)."""
    b, s, d = hidden.shape
    nh, hd = cfg.num_attention_heads, cfg.attention_head_dim
    eps = cfg.eps
    dt = hidden.dtype
    from ht_vllm_omni_tpu.models.layers import rms_norm

    if "norm2_g" in lp:
        nx = wan._layer_norm(
            hidden, eps, lp["norm2_g"], lp["norm2_b"]
        ).astype(dt)
    else:
        nx = hidden
    q = rms_norm(jnp.dot(nx, lp["xq_w"]) + lp["xq_b"], lp["xq_norm"], eps)
    k = rms_norm(jnp.dot(txt, lp["xk_w"]) + lp["xk_b"], lp["xk_norm"], eps)
    v = jnp.dot(txt, lp["xv_w"]) + lp["xv_b"]
    s_txt = txt.shape[1]
    q = q.reshape(b, s, nh, hd)
    k = k.reshape(b, s_txt, nh, hd)
    v = v.reshape(b, s_txt, nh, hd)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) / math.sqrt(hd)
    logits = jnp.where(txt_mask[:, None, None, :], logits, -1e30)
    o = jnp.einsum(
        "bhqk,bkhd->bqhd", jax.nn.softmax(logits, -1),
        v.astype(jnp.float32),
    ).reshape(b, s, d)

    # fusion attention: rope'd q against the other modality's rope'd
    # k_fusion / plain v_fusion (fusion.py:120-140)
    ns = wan._layer_norm(other, eps, fp["fn_g"], fp["fn_b"]).astype(dt)
    kt = rms_norm(
        jnp.dot(ns, fp["kf_w"]) + fp["kf_b"], fp["kf_norm"], eps
    )
    vt = jnp.dot(ns, fp["vf_w"]) + fp["vf_b"]
    s_o = other.shape[1]
    qf = wan.apply_rope_interleaved(
        q, rope[0], rope[1]
    )
    kt = wan.apply_rope_interleaved(
        kt.reshape(b, s_o, nh, hd), other_rope[0], other_rope[1]
    )
    vt = vt.reshape(b, s_o, nh, hd)
    fl = jnp.einsum(
        "bqhd,bkhd->bhqk", qf.astype(jnp.float32), kt.astype(jnp.float32)
    ) / math.sqrt(hd)
    of = jnp.einsum(
        "bhqk,bkhd->bqhd", jax.nn.softmax(fl, -1), vt.astype(jnp.float32)
    ).reshape(b, s, d)
    o = o + of

    o = jnp.dot(o.astype(dt), lp["xattn_out_w"]) + lp["xattn_out_b"]
    hidden = hidden + o.astype(dt)

    sh, sc, g = mod[:, :, 3], mod[:, :, 4], mod[:, :, 5]
    nx = (wan._layer_norm(hidden, eps) * (1 + sc) + sh).astype(dt)
    ff = wan._gelu_tanh(jnp.dot(nx, lp["ffn_w1"]) + lp["ffn_b1"])
    ff = jnp.dot(ff.astype(dt), lp["ffn_w2"]) + lp["ffn_b2"]
    return (
        hidden.astype(jnp.float32) + ff.astype(jnp.float32) * g
    ).astype(dt)


def forward(
    vcfg: WanVideoArchConfig,
    acfg: WanVideoArchConfig,
    params: dict,   # {"video", "audio", "video_fusion", "audio_fusion"}
    vid_latents: jax.Array,    # [B, C, F, H, W]
    audio_latents: jax.Array,  # [B, C, F_a, 1, 1] (1D sequence as grid)
    timestep: jax.Array,       # [B]
    vid_text: jax.Array,
    vid_text_lens: jax.Array,
    audio_text: jax.Array,
    audio_text_lens: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    vp, ap = params["video"], params["audio"]
    vx, vtemb, vmod_base, vtxt, vtm, vrope, vgrid = _embed_tokens(
        vcfg, vp, vid_latents, timestep, vid_text, vid_text_lens
    )
    ax, atemb, amod_base, atxt, atm, arope, agrid = _embed_tokens(
        acfg, ap, audio_latents, timestep, audio_text, audio_text_lens
    )

    for li in range(vcfg.num_layers):
        vlp = {k: v[li] for k, v in vp.items() if k in wan._BLOCK_KEYS}
        alp = {k: v[li] for k, v in ap.items() if k in wan._BLOCK_KEYS}
        vfp = {k: v[li] for k, v in params["video_fusion"].items()}
        afp = {k: v[li] for k, v in params["audio_fusion"].items()}
        vmod = vmod_base.astype(jnp.float32) + vlp["mod_table"].astype(
            jnp.float32
        )[None, None]
        amod = amod_base.astype(jnp.float32) + alp["mod_table"].astype(
            jnp.float32
        )[None, None]

        ax = _self_attn(acfg, alp, ax, amod, arope)
        vx = _self_attn(vcfg, vlp, vx, vmod, vrope)
        og_audio = ax
        ax = _fused_cross_ffn(
            acfg, alp, afp, ax, amod, arope, vx, vrope, atxt, atm
        )
        vx = _fused_cross_ffn(
            vcfg, vlp, vfp, vx, vmod, vrope, og_audio, arope, vtxt, vtm
        )

    def head(cfg, p, hidden, temb, grid, shape):
        eps = cfg.eps
        dt = hidden.dtype
        te = temb.astype(jnp.float32)[:, None, :]
        ot = p["out_table"].astype(jnp.float32)
        shift = ot[0][None, None] + te
        scale = ot[1][None, None] + te
        h = (wan._layer_norm(hidden, eps) * (1 + scale) + shift).astype(dt)
        h = jnp.dot(h, p["proj_out_w"]) + p["proj_out_b"]
        b = hidden.shape[0]
        pf, phh, pww = grid
        pt, ph, pw = cfg.patch_size
        c = cfg.out_channels
        h = h.reshape(b, pf, phh, pww, c, pt, ph, pw)
        h = h.transpose(0, 4, 1, 5, 2, 6, 3, 7)
        return h.reshape(b, c, pf * pt, phh * ph, pww * pw)

    v_out = head(
        vcfg, vp, vx, vtemb, vgrid, vid_latents.shape
    )
    a_out = head(
        acfg, ap, ax, atemb, agrid, audio_latents.shape
    )
    return v_out, a_out
