"""MammothModa2 DiT (jax): Lumina2-style modulated transformer.

Follows the reference Transformer2DModel (reference vllm_omni/diffusion/
models/mammoth_moda2/mammothmoda2_dit_model.py):

- blocks are LuminaRMSNormZero-modulated (scale on the attn input, tanh
  gates on the attn/FFN outputs, post RMSNorms on each delta, :407-492);
- GQA attention with per-head RMS q/k-norm and REAL 3-axis rotary
  (rope_real.py: per axis, interleaved pair rotation — GPT-J style);
- three refiner stacks: context (unmodulated, over the condition
  tokens), noise (modulated, over the image tokens) (:712-729);
- a SimpleQFormer condenses the AR image-condition hiddens into a fixed
  query count before they join the text condition
  (pipeline_mammothmoda2_dit.py:181-189);
- joint sequence = [condition tokens, image tokens]; output through
  LuminaLayerNormContinuous (:106-151).

Position ids (rope_real.py:168-210): condition tokens get linear ids on
all three axes; image tokens get (pe_shift, row, col).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.diffusion.models.mammoth_moda2.config import (
    MammothDiTArchConfig,
)


# ------------------------------------------------------------------ init
def _block_params(cfg, key, modulation=True):
    d, fd = cfg.hidden_size, cfg.ffn_dim
    nq, nk, hd = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim
    ks = iter(jax.random.split(key, 12))

    def w(shape):
        return jax.random.normal(next(ks), shape, jnp.float32) * 0.02

    p = {
        "wq": w((d, nq * hd)), "wk": w((d, nk * hd)),
        "wv": w((d, nk * hd)), "wo": w((nq * hd, d)),
        "q_norm": jnp.ones((hd,)), "k_norm": jnp.ones((hd,)),
        "w1": w((d, fd)), "w3": w((d, fd)), "w2": w((fd, d)),
        "norm2": jnp.ones((d,)), "ffn_norm1": jnp.ones((d,)),
        "ffn_norm2": jnp.ones((d,)),
    }
    if modulation:
        p["ada_w"] = w((cfg.adaln_dim, 4 * d))
        p["ada_b"] = jnp.zeros((4 * d,))
        p["norm1"] = jnp.ones((d,))
    else:
        p["norm1"] = jnp.ones((d,))
    return p


def _qformer_params(cfg, key):
    d = cfg.hidden_size
    ks = iter(jax.random.split(key, 8 + 4 * cfg.qformer_layers))

    def w(shape):
        return jax.random.normal(next(ks), shape, jnp.float32) * 0.02

    layers = []
    for _ in range(cfg.qformer_layers):
        layers.append({
            "ln_q1": jnp.ones((d,)),
            "sa_in_w": w((d, 3 * d)), "sa_in_b": jnp.zeros((3 * d,)),
            "sa_out_w": w((d, d)), "sa_out_b": jnp.zeros((d,)),
            "ln_q2": jnp.ones((d,)),
            "ca_in_w": w((d, 3 * d)), "ca_in_b": jnp.zeros((3 * d,)),
            "ca_out_w": w((d, d)), "ca_out_b": jnp.zeros((d,)),
            "ln_ffn": jnp.ones((d,)),
            "f1": w((d, 4 * d)), "f3": w((d, 4 * d)), "f2": w((4 * d, d)),
        })
    return {
        "in_norm": jnp.ones((d,)),
        "in_w": w((d, d)), "in_b": jnp.zeros((d,)),
        "query": w((cfg.qformer_queries, d)),
        "layers": layers,
    }


def init_params(cfg: MammothDiTArchConfig, key: jax.Array) -> dict:
    d, p2c = cfg.hidden_size, (
        cfg.patch_size * cfg.patch_size * cfg.in_channels
    )
    ks = iter(jax.random.split(key, 16 + cfg.num_layers
                               + 3 * cfg.num_refiner_layers))

    def w(shape):
        return jax.random.normal(next(ks), shape, jnp.float32) * 0.02

    return {
        "x_embed_w": w((p2c, d)), "x_embed_b": jnp.zeros((d,)),
        # Lumina2CombinedTimestepCaptionEmbedding (:152-186)
        "t_w1": w((256, cfg.adaln_dim)), "t_b1": jnp.zeros(
            (cfg.adaln_dim,)
        ),
        "t_w2": w((cfg.adaln_dim, cfg.adaln_dim)),
        "t_b2": jnp.zeros((cfg.adaln_dim,)),
        "cap_norm": jnp.ones((cfg.text_feat_dim,)),
        "cap_w": w((cfg.text_feat_dim, d)), "cap_b": jnp.zeros((d,)),
        "context_refiner": [
            _block_params(cfg, next(ks), modulation=False)
            for _ in range(cfg.num_refiner_layers)
        ],
        "noise_refiner": [
            _block_params(cfg, next(ks), modulation=True)
            for _ in range(cfg.num_refiner_layers)
        ],
        "layers": [
            _block_params(cfg, next(ks), modulation=True)
            for _ in range(cfg.num_layers)
        ],
        "qformer": _qformer_params(cfg, next(ks)),
        # LuminaLayerNormContinuous (elementwise_affine=False)
        "out_cond_w": w((cfg.adaln_dim, d)), "out_cond_b": jnp.zeros(
            (d,)
        ),
        "out_w": w((d, p2c)), "out_b": jnp.zeros((p2c,)),
    }


# ------------------------------------------------------------ primitives
def _rms(x, w, eps=1e-5):
    v = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
    return (w * (x * jax.lax.rsqrt(v + eps))).astype(x.dtype)


def _ln_noaffine(x, eps=1e-6):
    m = x.mean(-1, keepdims=True)
    v = jnp.var(x, -1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps)


def rope_tables(cfg, n_text: int, grid: tuple[int, int]) -> np.ndarray:
    """cos/sin [S, head_dim] for [text cond..., image grid] (reference
    rope_real.py: text linear on all 3 axes; image (pe_shift, row, col);
    interleaved-pair duplication)."""
    ht, wt = grid
    s = n_text + ht * wt
    ids = np.zeros((s, 3), np.float64)
    ids[:n_text] = np.arange(n_text)[:, None]
    rows, cols = np.meshgrid(np.arange(ht), np.arange(wt), indexing="ij")
    ids[n_text:, 0] = n_text
    ids[n_text:, 1] = rows.reshape(-1)
    ids[n_text:, 2] = cols.reshape(-1)
    cos_list, sin_list = [], []
    for ax, dim in enumerate(cfg.axes_dim_rope):
        f = 1.0 / (
            cfg.rope_theta ** (np.arange(0, dim, 2, dtype=np.float64)
                               / dim)
        )
        ang = ids[:, ax : ax + 1] * f[None]
        cos_list.append(np.repeat(np.cos(ang), 2, axis=-1))
        sin_list.append(np.repeat(np.sin(ang), 2, axis=-1))
    return (
        np.concatenate(cos_list, -1).astype(np.float32),
        np.concatenate(sin_list, -1).astype(np.float32),
    )


def _apply_rope(x, cos, sin):
    """Interleaved pair rotation (reference apply_real_rotary_emb)."""
    shp = x.shape
    xf = x.astype(jnp.float32).reshape(*shp[:-1], shp[-1] // 2, 2)
    c = cos.reshape(*cos.shape[:-1], -1, 2)[..., 0]
    s = sin.reshape(*sin.shape[:-1], -1, 2)[..., 0]
    # broadcast over heads: cos [S, d/2] -> [S, 1, d/2]
    c, s = c[:, None], s[:, None]
    x1, x2 = xf[..., 0], xf[..., 1]
    out = jnp.stack([x1 * c - x2 * s, x1 * s + x2 * c], -1)
    return out.reshape(shp).astype(x.dtype)


def _attention(cfg, p, x, cos, sin):
    s, d = x.shape
    nq, nk, hd = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim
    q = _rms((x @ p["wq"]).reshape(s, nq, hd), p["q_norm"])
    k = _rms((x @ p["wk"]).reshape(s, nk, hd), p["k_norm"])
    v = (x @ p["wv"]).reshape(s, nk, hd)
    q = _apply_rope(q, cos, sin)
    k = _apply_rope(k, cos, sin)
    if nq != nk:
        k = jnp.repeat(k, nq // nk, 1)
        v = jnp.repeat(v, nq // nk, 1)
    sc = jnp.einsum(
        "qhd,khd->hqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) / math.sqrt(hd)
    o = jnp.einsum(
        "hqk,khd->qhd", jax.nn.softmax(sc, -1), v.astype(jnp.float32)
    )
    return o.reshape(s, nq * hd) @ p["wo"]


def _ffn(p, x):
    return (
        jax.nn.silu(x @ p["w1"]) * (x @ p["w3"])
    ) @ p["w2"]


def block(cfg, p, x, cos, sin, temb=None):
    """One TransformerBlock (reference :457-492); x [S, D],
    temb [adaln_dim] or None for unmodulated blocks."""
    eps = cfg.norm_eps
    if temb is not None:
        mod = jax.nn.silu(temb) @ p["ada_w"] + p["ada_b"]
        sc_msa, g_msa, sc_mlp, g_mlp = jnp.split(mod, 4, -1)
        n = _rms(x, p["norm1"], eps) * (1 + sc_msa[None])
        a = _attention(cfg, p, n, cos, sin)
        x = x + jnp.tanh(g_msa)[None] * _rms(a, p["norm2"], eps)
        f = _ffn(p, _rms(x, p["ffn_norm1"], eps) * (1 + sc_mlp[None]))
        x = x + jnp.tanh(g_mlp)[None] * _rms(f, p["ffn_norm2"], eps)
    else:
        a = _attention(cfg, p, _rms(x, p["norm1"], eps), cos, sin)
        x = x + _rms(a, p["norm2"], eps)
        f = _ffn(p, _rms(x, p["ffn_norm1"], eps))
        x = x + _rms(f, p["ffn_norm2"], eps)
    return x


# ----------------------------------------------------------------- model
def timestep_embed(p, t):
    """Timesteps(flip_sin_to_cos) + TimestepEmbedding (:152-186);
    t scalar in [0, 1] -> [adaln_dim]."""
    half = 128
    freqs = jnp.exp(
        -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    )
    ang = t.astype(jnp.float32) * freqs
    emb = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)])
    h = jax.nn.silu(emb @ p["t_w1"] + p["t_b1"])
    return h @ p["t_w2"] + p["t_b2"]


def qformer(cfg, p, x):
    """SimpleQFormerImageRefiner (:188-275): condition tokens [T, D] ->
    [num_queries, D]."""
    kv = _rms(x, p["in_norm"], cfg.norm_eps) @ p["in_w"] + p["in_b"]
    q = p["query"]
    nh = max(1, cfg.hidden_size // 128)
    while cfg.hidden_size % nh:
        nh -= 1
    hd = cfg.hidden_size // nh

    def mha(qq, kk, vv, in_w, in_b, out_w, out_b):
        d = cfg.hidden_size
        wq, wk, wv = jnp.split(in_w, 3, -1)
        bq, bk, bv = jnp.split(in_b, 3)
        qh = (qq @ wq + bq).reshape(-1, nh, hd)
        kh = (kk @ wk + bk).reshape(-1, nh, hd)
        vh = (vv @ wv + bv).reshape(-1, nh, hd)
        sc = jnp.einsum("qhd,khd->hqk", qh, kh) / math.sqrt(hd)
        o = jnp.einsum("hqk,khd->qhd", jax.nn.softmax(sc, -1), vh)
        return o.reshape(-1, d) @ out_w + out_b

    for lp in p["layers"]:
        n = _rms(q, lp["ln_q1"], cfg.norm_eps)
        q = q + mha(n, n, n, lp["sa_in_w"], lp["sa_in_b"],
                    lp["sa_out_w"], lp["sa_out_b"])
        n = _rms(q, lp["ln_q2"], cfg.norm_eps)
        q = q + mha(n, kv, kv, lp["ca_in_w"], lp["ca_in_b"],
                    lp["ca_out_w"], lp["ca_out_b"])
        n = _rms(q, lp["ln_ffn"], cfg.norm_eps)
        q = q + (jax.nn.silu(n @ lp["f1"]) * (n @ lp["f3"])) @ lp["f2"]
    return q


def forward(cfg, p, latents, t, cond, cos, sin):
    """latents [H_l, W_l, C]; t scalar [0,1]; cond [T, D] (already
    hidden_size-projected condition tokens, may be T=0); cos/sin
    [T + n_img, head_dim].  Returns velocity [H_l, W_l, C]."""
    ps = cfg.patch_size
    hl, wl, c = latents.shape
    ht, wt = hl // ps, wl // ps
    n_text = cond.shape[0]

    temb = timestep_embed(p, t)
    # patchify [ht*wt, p*p*c]
    x = latents.reshape(ht, ps, wt, ps, c)
    x = jnp.einsum("hpwqc->hwpqc", x).reshape(ht * wt, ps * ps * c)
    img = x @ p["x_embed_w"] + p["x_embed_b"]

    cos_t, sin_t = cos[:n_text], sin[:n_text]
    cos_i, sin_i = cos[n_text:], sin[n_text:]
    if n_text > 0:  # CFG's unconditional branch runs with NO condition
        for lp in p["context_refiner"]:
            cond = block(cfg, lp, cond, cos_t, sin_t)
    for lp in p["noise_refiner"]:
        img = block(cfg, lp, img, cos_i, sin_i, temb)

    h = jnp.concatenate([cond, img], 0) if n_text > 0 else img
    for lp in p["layers"]:
        h = block(cfg, lp, h, cos, sin, temb)

    # LuminaLayerNormContinuous (elementwise_affine=False, eps 1e-6)
    scale = jax.nn.silu(temb) @ p["out_cond_w"] + p["out_cond_b"]
    h = _ln_noaffine(h) * (1 + scale[None])
    out = (h @ p["out_w"] + p["out_b"])[n_text:]

    out = out.reshape(ht, wt, ps, ps, c)
    return jnp.einsum("hwpqc->hpwqc", out).reshape(hl, wl, c)
