"""HunyuanImage-3 unified AR-MoE trunk (jax).

Follows the reference HunyuanImage3Model (reference vllm_omni/diffusion/
models/hunyuan_image_3/hunyuan_image_3_transformer.py): ONE decoder
serves text (causal) and image (full-attention block) tokens.  For
image generation the sequence is

    [text prompt ..., <timestep>, <img> x (h*w)]

where the image placeholders carry UNet-patch-embedded noisy latents
(+ per-step time conditioning) and the timestep slot carries a
sinusoidal timestep embedding (:831-1023 of the pipeline file).

TPU-first structure: the text prefix is encoded ONCE and its per-layer
K/V reused across all denoise steps; each step re-runs only the
[timestep, image...] rows against the frozen text K/V (the reference
reaches the same reuse through its ImageKVCacheManager :842).  Rotary
is the 2D scheme of build_2d_rope (:322-363): per position a (y, x)
pair, even channels rotating with y, odd with x; text uses y = x =
linear index, image tokens use a centred grid.  MoE is top-k routed
experts (renormalised, :1441-1538) over TPU grouped GEMMs
(lax.ragged_dot) plus an always-on shared MLP.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.diffusion.models.hunyuan_image3.config import (
    HunyuanImage3ArchConfig,
)


# ------------------------------------------------------------------ init
def init_params(cfg: HunyuanImage3ArchConfig, key: jax.Array) -> dict:
    L, h, d = cfg.num_hidden_layers, cfg.hidden_size, cfg.head_dim
    nq, nk = cfg.num_attention_heads, cfg.num_key_value_heads
    e, mi, si = cfg.num_experts, cfg.moe_intermediate_size, (
        cfg.intermediate_size * cfg.num_shared_expert
    )
    ks = iter(jax.random.split(key, 48))

    def w(shape, scale=0.02):
        return jax.random.normal(next(ks), shape, jnp.float32) * scale

    def temb_mlp():
        return {
            "w1": w((256, h)), "b1": jnp.zeros((h,)),
            "w2": w((h, h)), "b2": jnp.zeros((h,)),
        }

    def resblock(cin, cout, zero_out=True):
        return {
            "n1_g": jnp.ones((cin,)), "n1_b": jnp.zeros((cin,)),
            "c1": w((3, 3, cin, cout)), "c1_b": jnp.zeros((cout,)),
            "emb_w": w((h, 2 * cout)), "emb_b": jnp.zeros((2 * cout,)),
            "n2_g": jnp.ones((cout,)), "n2_b": jnp.zeros((cout,)),
            "c2": (jnp.zeros((3, 3, cout, cout)) if zero_out
                   else w((3, 3, cout, cout))),
            "c2_b": jnp.zeros((cout,)),
            "skip": None if cin == cout else w((1, 1, cin, cout)),
            "skip_b": None if cin == cout else jnp.zeros((cout,)),
        }

    ph = cfg.patch_embed_hidden_dim
    p = {
        "embed": w((cfg.vocab_size, h)),
        "ln1": jnp.ones((L, h)), "ln2": jnp.ones((L, h)),
        "wq": w((L, h, nq * d)), "wk": w((L, h, nk * d)),
        "wv": w((L, h, nk * d)), "wo": w((L, nq * d, h)),
        "router": w((L, h, e)),
        "egate": w((L, e, h, mi)), "eup": w((L, e, h, mi)),
        "edown": w((L, e, mi, h)),
        "sgate": w((L, h, si)), "sup": w((L, h, si)),
        "sdown": w((L, si, h)),
        "norm_f": jnp.ones((h,)),
        # timestep embedders (reference pipeline __init__ :108-129)
        "time_embed": temb_mlp(),      # patch-embed conditioning
        "timestep_emb": temb_mlp(),    # the <timestep> sequence slot
        "time_embed_2": temb_mlp(),    # final-layer conditioning
        # UNetDown patch embed: conv3x3 in->ph, ResBlock ph->h
        "pe_conv": w((3, 3, cfg.latent_channels, ph)),
        "pe_conv_b": jnp.zeros((ph,)),
        "pe_res": resblock(ph, h),
        # UNetUp final layer: ResBlock h->ph, out GN+SiLU+conv ph->C
        "fl_res": resblock(h, ph),
        "fl_n_g": jnp.ones((ph,)), "fl_n_b": jnp.zeros((ph,)),
        "fl_conv": w((3, 3, ph, cfg.latent_channels)),
        "fl_conv_b": jnp.zeros((cfg.latent_channels,)),
    }
    if cfg.use_qk_norm:
        p["q_norm"] = jnp.ones((L, d))
        p["k_norm"] = jnp.ones((L, d))
    return p


# ----------------------------------------------------------- primitives
def _rms(x, w, eps):
    v = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
    return (w * (x * jax.lax.rsqrt(v + eps))).astype(x.dtype)


def timestep_embedding(t, dim=256, max_period=10000.0):
    """Sinusoidal embedding [B, dim] (reference :2784-2806)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], -1)


def time_embed(p, t):
    """TimestepEmbedder: sinusoid -> Linear -> GELU -> Linear
    (reference :2809-2842)."""
    x = timestep_embedding(t) @ p["w1"] + p["b1"]
    return jax.nn.gelu(x) @ p["w2"] + p["b2"]


def _group_norm(x, g, b, groups=32):
    """GroupNorm over NHWC: stats per (group of contiguous channels)
    across H, W and the in-group channels."""
    c = x.shape[-1]
    groups = min(groups, c)
    xr = x.reshape(x.shape[:-1] + (groups, c // groups)).astype(
        jnp.float32
    )  # [B, H, W, G, Cg]
    mean = xr.mean((-1, -3, -4), keepdims=True)
    var = jnp.var(xr, (-1, -3, -4), keepdims=True)
    xr = (xr - mean) * jax.lax.rsqrt(var + 1e-5)
    return xr.reshape(x.shape) * g + b


def _conv2d(x, w, b):
    pad = (w.shape[0] - 1) // 2
    y = jax.lax.conv_general_dilated(
        x.astype(w.dtype), w, (1, 1),
        [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b


def _res_block(p, x, emb):
    """Adaptive-GroupNorm ResBlock (reference ResBlock :2845-2935,
    up/down paths are identity in the reference)."""
    h = _conv2d(jax.nn.silu(_group_norm(x, p["n1_g"], p["n1_b"])),
                p["c1"], p["c1_b"])
    eo = jax.nn.silu(emb) @ p["emb_w"] + p["emb_b"]
    scale, shift = jnp.split(eo, 2, -1)
    h = _group_norm(h, p["n2_g"], p["n2_b"]) * (
        1.0 + scale[:, None, None]
    ) + shift[:, None, None]
    h = _conv2d(jax.nn.silu(h), p["c2"], p["c2_b"])
    skip = x if p["skip"] is None else _conv2d(x, p["skip"], p["skip_b"])
    return skip + h


def patch_embed(cfg, p, lat, temb):
    """UNetDown (:2938-2988): latents [B, h, w, C] + t-emb [B, H] ->
    tokens [B, h*w, H]."""
    x = _conv2d(lat, p["pe_conv"], p["pe_conv_b"])
    x = _res_block(p["pe_res"], x, temb)
    b, th, tw, hdim = x.shape
    return x.reshape(b, th * tw, hdim), th, tw


def final_layer(cfg, p, x, temb, th, tw):
    """UNetUp with out_norm (:2991-3069): tokens [B, th*tw, H] ->
    velocity [B, th, tw, C]."""
    b = x.shape[0]
    x = x.reshape(b, th, tw, -1)
    x = _res_block(p["fl_res"], x, temb)
    x = jax.nn.silu(_group_norm(x, p["fl_n_g"], p["fl_n_b"]))
    return _conv2d(x, p["fl_conv"], p["fl_conv_b"]).astype(jnp.float32)


# ------------------------------------------------------------------ rope
def build_rope_2d(cfg, s_text: int, grid: tuple[int, int]) -> np.ndarray:
    """cos/sin tables [S, head_dim/2] for the gen-image sequence
    [text..., <timestep>, img grid] (reference build_2d_rope :322-363:
    even channel pairs rotate with y, odd with x; image grid centred at
    beta = L + (h*w - h)/2 etc.; text and the timestep slot use
    y = x = linear index)."""
    d = cfg.head_dim
    ht, wt = grid
    n_img = ht * wt
    # text + timestep token: linear
    lin = np.arange(s_text + 1, dtype=np.float64)
    y = [lin]
    x = [lin]
    ll = s_text + 1
    beta_y = ll + (n_img - ht) / 2
    beta_x = ll + (n_img - wt) / 2
    gy, gx = np.meshgrid(
        beta_y + np.arange(ht), beta_x + np.arange(wt), indexing="ij"
    )
    y.append(gy.reshape(-1))
    x.append(gx.reshape(-1))
    y = np.concatenate(y)
    x = np.concatenate(x)
    theta = 1.0 / (
        cfg.rope_theta ** (np.arange(0, d, 2, dtype=np.float64) / d)
    )
    theta = theta.reshape(-1, 2)  # [d/4, 2]
    pos = np.stack([y, x], -1)[:, None, :]  # [S, 1, 2]
    idx = (pos * theta[None]).reshape(len(y), d // 2)
    return (np.cos(idx).astype(np.float32),
            np.sin(idx).astype(np.float32))


def _apply_rope(x, cos, sin):
    """Neox-style halves rotation; cos/sin [S, d/2] broadcast to d."""
    d = x.shape[-1]
    half = d // 2
    c = jnp.concatenate([cos, cos], -1)[None, :, None, :]
    s = jnp.concatenate([sin, sin], -1)[None, :, None, :]
    xf = x.astype(jnp.float32)
    rot = jnp.concatenate([-xf[..., half:], xf[..., :half]], -1)
    return (xf * c + rot * s).astype(x.dtype)


# ------------------------------------------------------------------- moe
def _moe(cfg, p, li, x, ep_axis=None):
    """Top-k routed experts over grouped GEMMs + plain shared MLP
    (reference HunYuanSparseMoeBlock :1441-1538; the grouped-GEMM
    dispatch matches models/qwen2.py's EP-ready MoE).

    Expert parallelism: with ``ep_axis`` set (inside shard_map), the
    expert leaves (egate/eup/edown, router stays replicated) arrive
    sharded over the axis; each shard evaluates its LOCAL experts
    against the globally-routed assignment (expert ids offset by
    shard * local_E; foreign tokens route to an empty group) and the
    routed partial psums across the axis — same design as the AR side's
    qwen2._mlp EP."""
    t, h = x.shape
    logits = jnp.dot(x, p["router"][li], preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, -1)
    k = cfg.moe_topk
    top_w, top_i = jax.lax.top_k(probs, k)
    if k > 1:  # renormalize=top_k > 1 in the reference
        top_w = top_w / jnp.sum(top_w, -1, keepdims=True)
    tk = t * k
    e_flat = top_i.reshape(tk).astype(jnp.int32)
    local_e = p["egate"].shape[1]
    if ep_axis is not None:
        # map global expert ids into this shard's local range; foreign
        # assignments park in group local_e (zero-weighted below)
        off = jax.lax.axis_index(ep_axis) * local_e
        rel = e_flat - off
        mine = jnp.logical_and(rel >= 0, rel < local_e)
        e_loc = jnp.where(mine, rel, local_e)
    else:
        mine = jnp.ones((tk,), bool)
        e_loc = e_flat
    order = jnp.argsort(e_loc)
    tok = order // k
    xs = x[tok]
    gs = jnp.bincount(e_loc, length=local_e)
    gg = jax.lax.ragged_dot(
        xs, p["egate"][li], gs, preferred_element_type=jnp.float32
    )
    uu = jax.lax.ragged_dot(
        xs, p["eup"][li], gs, preferred_element_type=jnp.float32
    )
    act = (jax.nn.silu(gg) * uu).astype(x.dtype)
    rows = jax.lax.ragged_dot(
        act, p["edown"][li], gs, preferred_element_type=jnp.float32
    )
    wsort = jnp.where(mine, top_w.reshape(tk), 0.0)[order]
    acc = jnp.zeros((t, h), jnp.float32)
    acc = acc.at[tok].add(rows * wsort[:, None])
    if ep_axis is not None:
        acc = jax.lax.psum(acc, ep_axis)
    # shared expert: plain SwiGLU, no gate (use_mixed_mlp_moe);
    # ep-replicated like the AR side's shared expert
    sg = jax.nn.silu(x @ p["sgate"][li]) * (x @ p["sup"][li])
    return acc + sg @ p["sdown"][li]


# ----------------------------------------------------------------- trunk
def trunk_forward(cfg, p, x, cos, sin, mask, text_kv=None):
    """x [B, S_q, H]; cos/sin [S_q, d/2] for the query rows; mask
    [S_q, S_k] bool (True = attend).  ``text_kv`` (k, v) each
    [L, B, S_t, nk, d] is the frozen prompt cache prepended on the key
    side.  Returns (hidden [B, S_q, H], (k, v) of THESE rows)."""
    b, sq, hdim = x.shape
    nq, nk, d = (
        cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim,
    )
    eps = cfg.rms_norm_eps
    h = x
    ks, vs = [], []
    for li in range(cfg.num_hidden_layers):
        n = _rms(h, p["ln1"][li], eps)
        q = (n @ p["wq"][li]).reshape(b, sq, nq, d)
        k = (n @ p["wk"][li]).reshape(b, sq, nk, d)
        v = (n @ p["wv"][li]).reshape(b, sq, nk, d)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)
        if cfg.use_qk_norm:  # per-head RMS AFTER rope (reference :1676)
            q = _rms(q, p["q_norm"][li], eps)
            k = _rms(k, p["k_norm"][li], eps)
        ks.append(k)
        vs.append(v)
        if text_kv is not None:
            k = jnp.concatenate([text_kv[0][li], k], 1)
            v = jnp.concatenate([text_kv[1][li], v], 1)
        if nq != nk:
            k = jnp.repeat(k, nq // nk, 2)
            v = jnp.repeat(v, nq // nk, 2)
        scores = jnp.einsum(
            "bthd,bshd->bhts", q.astype(jnp.float32),
            k.astype(jnp.float32),
        ) / math.sqrt(d)
        scores = jnp.where(mask[None, None], scores, -1e30)
        o = jnp.einsum(
            "bhts,bshd->bthd", jax.nn.softmax(scores, -1),
            v.astype(jnp.float32),
        ).reshape(b, sq, nq * d)
        h = h + (o.astype(h.dtype) @ p["wo"][li])
        n = _rms(h, p["ln2"][li], eps)
        h = h + _moe(cfg, p, li, n.reshape(-1, hdim)).reshape(
            b, sq, hdim
        ).astype(h.dtype)
    return _rms(h, p["norm_f"], eps), (jnp.stack(ks), jnp.stack(vs))


# ------------------------------------------------------------- programs
def gen_image_masks(s_text: int, n_img: int):
    """(first-step mask [S,S], later-step mask [1+n_img, S]) with
    S = s_text + 1 + n_img: causal everywhere, full attention inside
    the image block (reference _prepare_attention_mask_for_generation,
    pipeline_hunyuan_image_3.py:656-676)."""
    s = s_text + 1 + n_img
    m = np.tril(np.ones((s, s), bool))
    m[s_text + 1:, s_text + 1:] = True  # image block: full
    return m, m[s_text:]


def denoise_first(cfg, p, text_ids, latents, t, cos, sin, mask):
    """Step 0: full [text, timestep, image] forward.  Returns
    (velocity [B, th, tw, C], text_kv)."""
    b = text_ids.shape[0]
    s_text = text_ids.shape[1]
    temb = time_embed(p["time_embed"], t)
    img_seq, th, tw = patch_embed(cfg, p, latents, temb)
    ts_tok = time_embed(p["timestep_emb"], t)[:, None]
    x = jnp.concatenate([p["embed"][text_ids], ts_tok, img_seq], 1)
    h, (k, v) = trunk_forward(cfg, p, x, cos, sin, mask)
    text_kv = (k[:, :, :s_text], v[:, :, :s_text])
    temb2 = time_embed(p["time_embed_2"], t)
    pred = final_layer(cfg, p, h[:, s_text + 1:], temb2, th, tw)
    return pred, text_kv


def denoise_step(cfg, p, latents, t, text_kv, cos_q, sin_q, mask_q):
    """Steps 1..N: only [timestep, image] rows against the frozen text
    K/V.  cos_q/sin_q are the table rows from s_text on."""
    temb = time_embed(p["time_embed"], t)
    img_seq, th, tw = patch_embed(cfg, p, latents, temb)
    ts_tok = time_embed(p["timestep_emb"], t)[:, None]
    x = jnp.concatenate([ts_tok, img_seq], 1)
    h, _ = trunk_forward(cfg, p, x, cos_q, sin_q, mask_q, text_kv)
    temb2 = time_embed(p["time_embed_2"], t)
    return final_layer(cfg, p, h[:, 1:], temb2, th, tw)
