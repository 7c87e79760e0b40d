"""Z-Image transformer (jax): Lumina-style single-stream DiT.

Follows the reference ZImageTransformer2DModel (reference
vllm_omni/diffusion/models/z_image/z_image_transformer.py:559-977):

- patchified image tokens -> x_embedder -> ``noise_refiner`` blocks
  (adaLN-modulated, image-only);
- caption features -> RMSNorm + linear -> ``context_refiner`` blocks
  (unmodulated);
- [image ; caption] unified sequence -> main blocks (modulated) ->
  adaLN final layer -> unpatchify;
- blocks are sandwich-normed (RMSNorm after attention/FFN output too),
  adaLN emits 4 chunks (scale/gate x attn/mlp) with tanh'd gates
  (:435-482);
- 3-axis RoPE with theta 256 in the interleaved convention: caption
  tokens at frame positions 1..cap_len, image tokens at frame offset
  cap_len_padded + 1 with (h, w) grid coordinates (:774-875), padding
  tokens at the (0,0,0) origin.

Static shapes: one image grid per call, caption padded to a fixed
bucket (SEQ_MULTI_OF); batch = CFG branches.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.diffusion.models.z_image.config import (
    SEQ_MULTI_OF,
    ZImageArchConfig,
)


# ------------------------------------------------------------------ params
def _block_init(cfg: ZImageArchConfig, ks, modulated: bool) -> dict:
    def w(shape, scale=0.02):
        return jax.random.normal(next(ks), shape, jnp.float32) * scale

    d, hd = cfg.dim, cfg.head_dim
    nq, nk = cfg.n_heads, cfg.n_kv_heads
    p = {
        "qkv_w": w((d, (nq + 2 * nk) * hd)),
        "q_norm": jnp.ones((hd,)),
        "k_norm": jnp.ones((hd,)),
        "out_w": w((nq * hd, d)),
        "w13": w((d, 2 * cfg.ffn_hidden)),
        "w2": w((cfg.ffn_hidden, d)),
        "att_n1": jnp.ones((d,)),
        "ffn_n1": jnp.ones((d,)),
        "att_n2": jnp.ones((d,)),
        "ffn_n2": jnp.ones((d,)),
    }
    if modulated:
        p["ada_w"] = w((cfg.adaln_dim, 4 * d))
        p["ada_b"] = jnp.zeros((4 * d,))
    return p


def init_params(cfg: ZImageArchConfig, key: jax.Array) -> dict:
    n_blocks = cfg.n_layers + 2 * cfg.n_refiner_layers
    ks = iter(jax.random.split(key, 32 + 12 * n_blocks))

    def w(shape, scale=0.02):
        return jax.random.normal(next(ks), shape, jnp.float32) * scale

    d = cfg.dim
    pin = cfg.patch_size * cfg.patch_size * cfg.in_channels
    return {
        "x_emb_w": w((pin, d)),
        "x_emb_b": jnp.zeros((d,)),
        "cap_norm": jnp.ones((cfg.cap_feat_dim,)),
        "cap_w": w((cfg.cap_feat_dim, d)),
        "cap_b": jnp.zeros((d,)),
        "x_pad": w((d,)),
        "cap_pad": w((d,)),
        "t_w1": w((256, 1024)),
        "t_b1": jnp.zeros((1024,)),
        "t_w2": w((1024, cfg.adaln_dim)),
        "t_b2": jnp.zeros((cfg.adaln_dim,)),
        "noise_refiner": [
            _block_init(cfg, ks, True) for _ in range(cfg.n_refiner_layers)
        ],
        "context_refiner": [
            _block_init(cfg, ks, False)
            for _ in range(cfg.n_refiner_layers)
        ],
        "layers": [
            _block_init(cfg, ks, True) for _ in range(cfg.n_layers)
        ],
        "final_ada_w": w((cfg.adaln_dim, d)),
        "final_ada_b": jnp.zeros((d,)),
        "final_w": w((d, pin)),
        "final_b": jnp.zeros((pin,)),
    }


def load_hf_state(cfg: ZImageArchConfig, state: dict) -> dict:
    """Map reference/diffusers weight names onto the jax layout
    (z_image_transformer.py:978 load_weights; to_qkv may be pre-fused
    or split as to_q/to_k/to_v, FFN as w13 or w1/w3)."""

    def g(name):
        return jnp.asarray(np.asarray(state[name], np.float32))

    def block(prefix, modulated):
        if f"{prefix}.attention.to_qkv.weight" in state:
            qkv = g(f"{prefix}.attention.to_qkv.weight").T
        else:
            qkv = jnp.concatenate(
                [
                    g(f"{prefix}.attention.to_{n}.weight").T
                    for n in ("q", "k", "v")
                ],
                axis=1,
            )
        if f"{prefix}.feed_forward.w13.weight" in state:
            w13 = g(f"{prefix}.feed_forward.w13.weight").T
        else:
            w13 = jnp.concatenate(
                [
                    g(f"{prefix}.feed_forward.w1.weight").T,
                    g(f"{prefix}.feed_forward.w3.weight").T,
                ],
                axis=1,
            )
        p = {
            "qkv_w": qkv,
            "q_norm": g(f"{prefix}.attention.norm_q.weight"),
            "k_norm": g(f"{prefix}.attention.norm_k.weight"),
            "out_w": g(f"{prefix}.attention.to_out.0.weight").T,
            "w13": w13,
            "w2": g(f"{prefix}.feed_forward.w2.weight").T,
            "att_n1": g(f"{prefix}.attention_norm1.weight"),
            "ffn_n1": g(f"{prefix}.ffn_norm1.weight"),
            "att_n2": g(f"{prefix}.attention_norm2.weight"),
            "ffn_n2": g(f"{prefix}.ffn_norm2.weight"),
        }
        if modulated:
            p["ada_w"] = g(f"{prefix}.adaLN_modulation.0.weight").T
            p["ada_b"] = g(f"{prefix}.adaLN_modulation.0.bias")
        return p

    ps = f"{cfg.patch_size}-1"
    return {
        "x_emb_w": g(f"all_x_embedder.{ps}.weight").T,
        "x_emb_b": g(f"all_x_embedder.{ps}.bias"),
        "cap_norm": g("cap_embedder.0.weight"),
        "cap_w": g("cap_embedder.1.weight").T,
        "cap_b": g("cap_embedder.1.bias"),
        "x_pad": g("x_pad_token")[0],
        "cap_pad": g("cap_pad_token")[0],
        "t_w1": g("t_embedder.mlp.0.weight").T,
        "t_b1": g("t_embedder.mlp.0.bias"),
        "t_w2": g("t_embedder.mlp.2.weight").T,
        "t_b2": g("t_embedder.mlp.2.bias"),
        "noise_refiner": [
            block(f"noise_refiner.{i}", True)
            for i in range(cfg.n_refiner_layers)
        ],
        "context_refiner": [
            block(f"context_refiner.{i}", False)
            for i in range(cfg.n_refiner_layers)
        ],
        "layers": [
            block(f"layers.{i}", True) for i in range(cfg.n_layers)
        ],
        "final_ada_w": g(f"all_final_layer.{ps}.adaLN_modulation.1.weight").T,
        "final_ada_b": g(f"all_final_layer.{ps}.adaLN_modulation.1.bias"),
        "final_w": g(f"all_final_layer.{ps}.linear.weight").T,
        "final_b": g(f"all_final_layer.{ps}.linear.bias"),
    }


# ------------------------------------------------------------------- model
def _rms(x, w, eps):
    v = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
    return (w * (x * jax.lax.rsqrt(v + eps))).astype(x.dtype)


def _rope_tables(cfg: ZImageArchConfig, ids: np.ndarray):
    """ids [S, 3] -> (cos, sin) [S, head_dim//2] in axis-concat order."""
    outs_c, outs_s = [], []
    for ax, d in enumerate(cfg.axes_dims):
        inv = 1.0 / (
            cfg.rope_theta
            ** (np.arange(0, d, 2, dtype=np.float64) / d)
        )
        f = np.asarray(ids[:, ax], np.float64)[:, None] * inv[None]
        outs_c.append(np.cos(f).astype(np.float32))
        outs_s.append(np.sin(f).astype(np.float32))
    return (
        jnp.asarray(np.concatenate(outs_c, -1)),
        jnp.asarray(np.concatenate(outs_s, -1)),
    )


def _apply_rope(x, cos, sin):
    """Interleaved-pair rotary; x [B, S, H, D], cos/sin [S, D//2]."""
    orig = x.dtype
    xf = x.astype(jnp.float32)
    a, b = xf[..., 0::2], xf[..., 1::2]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out = jnp.stack([a * c - b * s, a * s + b * c], -1)
    return out.reshape(x.shape).astype(orig)


def _block(cfg: ZImageArchConfig, p, x, cos, sin, adaln=None):
    b, s, d = x.shape
    nq, nk, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    if adaln is not None:
        mod = adaln @ p["ada_w"] + p["ada_b"]
        sc_msa, g_msa, sc_mlp, g_mlp = jnp.split(mod[:, None], 4, -1)
        g_msa, g_mlp = jnp.tanh(g_msa), jnp.tanh(g_mlp)
        sc_msa, sc_mlp = 1.0 + sc_msa, 1.0 + sc_mlp
    else:
        sc_msa = g_msa = sc_mlp = g_mlp = None

    h = _rms(x, p["att_n1"], cfg.norm_eps)
    if sc_msa is not None:
        h = h * sc_msa
    qkv = h @ p["qkv_w"]
    q, k, v = jnp.split(
        qkv, [nq * hd, nq * hd + nk * hd], axis=-1
    )
    q = _rms(q.reshape(b, s, nq, hd), p["q_norm"], 1e-5)
    k = _rms(k.reshape(b, s, nk, hd), p["k_norm"], 1e-5)
    v = v.reshape(b, s, nk, hd)
    q = _apply_rope(q, cos, sin)
    k = _apply_rope(k, cos, sin)
    if nq != nk:
        k = jnp.repeat(k, nq // nk, axis=2)
        v = jnp.repeat(v, nq // nk, axis=2)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (hd**-0.5)
    att = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(x.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, s, nq * hd)
    o = _rms(o @ p["out_w"], p["att_n2"], cfg.norm_eps)
    x = x + (g_msa * o if g_msa is not None else o)

    h = _rms(x, p["ffn_n1"], cfg.norm_eps)
    if sc_mlp is not None:
        h = h * sc_mlp
    w1, w3 = jnp.split(h @ p["w13"], 2, -1)
    ff = _rms(
        (jax.nn.silu(w1) * w3) @ p["w2"], p["ffn_n2"], cfg.norm_eps
    )
    return x + (g_mlp * ff if g_mlp is not None else ff)


def _t_embed(cfg: ZImageArchConfig, p, t: jax.Array) -> jax.Array:
    half = 128
    freqs = jnp.exp(
        -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], -1)
    h = jax.nn.silu(emb @ p["t_w1"] + p["t_b1"])
    return h @ p["t_w2"] + p["t_b2"]


def position_ids(
    cfg: ZImageArchConfig, lat_h: int, lat_w: int, cap_pad_len: int
) -> tuple[np.ndarray, np.ndarray]:
    """(cap_ids [cap_pad_len, 3], img_ids [n_img, 3]) — caption tokens
    at frame 1.., image grid at frame cap_pad_len + 1."""
    cap = np.zeros((cap_pad_len, 3), np.int64)
    cap[:, 0] = 1 + np.arange(cap_pad_len)
    ht, wt = lat_h // cfg.patch_size, lat_w // cfg.patch_size
    img = np.zeros((ht * wt, 3), np.int64)
    img[:, 0] = cap_pad_len + 1
    grid_h, grid_w = np.meshgrid(
        np.arange(ht), np.arange(wt), indexing="ij"
    )
    img[:, 1] = grid_h.reshape(-1)
    img[:, 2] = grid_w.reshape(-1)
    return cap, img


def patchify(cfg: ZImageArchConfig, lat: jax.Array) -> jax.Array:
    """[B, C, H, W] -> [B, (H/p)*(W/p), p*p*C] in the reference's
    (f h w) x (pf ph pw c) ordering."""
    b, c, h, w = lat.shape
    ps = cfg.patch_size
    x = lat.reshape(b, c, h // ps, ps, w // ps, ps)
    x = x.transpose(0, 2, 4, 3, 5, 1)
    return x.reshape(b, (h // ps) * (w // ps), ps * ps * c)


def unpatchify(cfg: ZImageArchConfig, tokens: jax.Array, h: int, w: int):
    b, _, _ = tokens.shape
    ps = cfg.patch_size
    c = cfg.in_channels
    x = tokens.reshape(b, h // ps, w // ps, ps, ps, c)
    x = x.transpose(0, 5, 1, 3, 2, 4)
    return x.reshape(b, c, h, w)


def forward(
    cfg: ZImageArchConfig,
    p: dict,
    img_tokens: jax.Array,  # [B, S_img, p*p*C] patchified latents
    cap_feats: jax.Array,   # [B, S_cap, cap_feat_dim] (padded)
    cap_lens: jax.Array,    # [B] valid caption lengths
    t: jax.Array,           # [B] model time in [0, 1]
    img_shape: tuple[int, int],  # static (lat_h, lat_w)
) -> jax.Array:
    """Velocity prediction [B, S_img, p*p*C]."""
    b, s_img, _ = img_tokens.shape
    s_cap = cap_feats.shape[1]
    if s_cap % SEQ_MULTI_OF:
        raise ValueError(f"caption length must be padded to {SEQ_MULTI_OF}")
    lat_h, lat_w = img_shape

    adaln = _t_embed(cfg, p, t * cfg.t_scale)

    x = img_tokens @ p["x_emb_w"] + p["x_emb_b"]
    cap_ids, img_ids = position_ids(cfg, lat_h, lat_w, s_cap)
    # pad the image sequence to a SEQ_MULTI_OF multiple with the learned
    # pad token at the (0,0,0) rope origin — the reference applies NO
    # attention mask, so pad tokens participate and parity requires them
    img_pad = (-s_img) % SEQ_MULTI_OF
    if img_pad:
        x = jnp.concatenate(
            [x, jnp.broadcast_to(p["x_pad"], (b, img_pad, cfg.dim))],
            axis=1,
        )
        img_ids = np.concatenate(
            [img_ids, np.zeros((img_pad, 3), np.int64)], axis=0
        )
    xc, xs = _rope_tables(cfg, img_ids)
    cc, cs = _rope_tables(cfg, cap_ids)

    for bp in p["noise_refiner"]:
        x = _block(cfg, bp, x, xc, xs, adaln)

    cap = _rms(cap_feats, p["cap_norm"], cfg.norm_eps)
    cap = cap @ p["cap_w"] + p["cap_b"]
    # true padding rows embed the learned cap_pad token
    pad_mask = (
        jnp.arange(s_cap)[None, :] >= cap_lens[:, None]
    )
    cap = jnp.where(pad_mask[..., None], p["cap_pad"][None, None], cap)
    for bp in p["context_refiner"]:
        cap = _block(cfg, bp, cap, cc, cs)

    uni = jnp.concatenate([x, cap], axis=1)
    ucos = jnp.concatenate([xc, cc], axis=0)
    usin = jnp.concatenate([xs, cs], axis=0)
    for bp in p["layers"]:
        uni = _block(cfg, bp, uni, ucos, usin, adaln)

    ada = jax.nn.silu(adaln) @ p["final_ada_w"] + p["final_ada_b"]
    scale = 1.0 + ada[:, None]
    xf = uni[:, :s_img].astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    h = ((xf - mu) * jax.lax.rsqrt(var + 1e-6)) * scale
    return h @ p["final_w"] + p["final_b"]
