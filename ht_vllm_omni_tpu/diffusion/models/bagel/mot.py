"""Bagel Qwen2 Mixture-of-Transformers trunk (jax).

Follows the reference Qwen2MoT (reference vllm_omni/diffusion/models/
bagel/bagel_transformer.py): every layer holds TWO parameter sets —
understanding (text/ViT tokens) and generation (VAE latent tokens) —
and each token is routed to its modality's qkv/o, MLP and norms
(PackedAttentionMoT :287-640, Qwen2MoTDecoderLayer :640-747); q/k RMS
norms are shared between the modes.  Attention is joint over the packed
[prompt ; <soi> ; vae tokens ; <eoi>] sequence: prompt tokens attend
causally among themselves, generation-step tokens attend to the whole
sequence (the cached-KV + non-causal query block of the reference,
expressed as one masked attention)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.diffusion.models.bagel.config import BagelArchConfig


def init_params(cfg: BagelArchConfig, key: jax.Array) -> dict:
    L, h, d = cfg.num_hidden_layers, cfg.hidden_size, cfg.head_dim
    nq, nk = cfg.num_attention_heads, cfg.num_key_value_heads
    inter = cfg.intermediate_size
    ks = iter(jax.random.split(key, 16))

    def w(shape, scale=0.02):
        return jax.random.normal(next(ks), shape, jnp.float32) * scale

    p = {
        "embed": w((cfg.vocab_size, h)),
        "norm_f": jnp.ones((h,)),
        # timestep embedding (TimestepEmbedder: sinus 256 -> mlp)
        "t_w1": w((256, h)), "t_b1": jnp.zeros((h,)),
        "t_w2": w((h, h)), "t_b2": jnp.zeros((h,)),
        # latent <-> llm projections + learned 2D pos embed
        "vae2llm_w": w((cfg.patch_latent_dim, h)),
        "vae2llm_b": jnp.zeros((h,)),
        "llm2vae_w": w((h, cfg.patch_latent_dim)),
        "llm2vae_b": jnp.zeros((cfg.patch_latent_dim,)),
        "latent_pos": w((cfg.max_latent_size * cfg.max_latent_size, h)),
    }
    for mode in ("und", "gen"):
        p.update({
            f"ln1_{mode}": jnp.ones((L, h)),
            f"ln2_{mode}": jnp.ones((L, h)),
            f"wqkv_{mode}": w((L, h, (nq + 2 * nk) * d)),
            f"bqkv_{mode}": jnp.zeros((L, (nq + 2 * nk) * d)),
            f"wo_{mode}": w((L, nq * d, h)),
            f"wg_{mode}": w((L, h, inter)),
            f"wu_{mode}": w((L, h, inter)),
            f"wd_{mode}": w((L, inter, h)),
        })
    p["q_norm"] = jnp.ones((L, d))
    p["k_norm"] = jnp.ones((L, d))
    return p


def _rms(x, w, eps):
    v = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
    return (w * (x * jax.lax.rsqrt(v + eps))).astype(x.dtype)


def _rope(positions, dim, theta):
    half = dim // 2
    inv = 1.0 / (theta ** (jnp.arange(half, dtype=jnp.float32) / half))
    f = positions[:, None].astype(jnp.float32) * inv[None]
    emb = jnp.concatenate([f, f], -1)
    return jnp.cos(emb), jnp.sin(emb)


def _apply_rope(x, cos, sin):
    half = x.shape[-1] // 2
    xf = x.astype(jnp.float32)
    rot = jnp.concatenate([-xf[..., half:], xf[..., :half]], -1)
    return (
        xf * cos[:, None, :] + rot * sin[:, None, :]
    ).astype(x.dtype)


def _routed(x, mask, w_und, w_gen, fn):
    """Apply fn with und params where mask==0 and gen params where 1."""
    return jnp.where(mask[:, None], fn(x, w_gen), fn(x, w_und))


def sinus_t(t, dim=256):
    half = dim // 2
    freqs = jnp.exp(
        -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], -1)


def forward(
    cfg: BagelArchConfig,
    p: dict,
    x: jax.Array,          # [S, H] packed token embeddings
    positions: jax.Array,  # [S] rope positions
    gen_mask: jax.Array,   # [S] 1 where token is a VAE/gen token
    prompt_len: int,       # static: prompt tokens [0, prompt_len)
) -> jax.Array:
    """One MoT pass; returns final hidden [S, H].

    Mask: rows < prompt_len are causal among themselves; rows >=
    prompt_len (the generation block) attend everywhere."""
    s = x.shape[0]
    nq, nk, d = (
        cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim,
    )
    eps = cfg.rms_norm_eps
    cos, sin = _rope(positions, d, cfg.rope_theta)

    idx = jnp.arange(s)
    causal = idx[None, :] <= idx[:, None]
    is_gen_row = idx >= prompt_len
    allowed = jnp.where(is_gen_row[:, None], True, causal)
    bias = jnp.where(allowed, 0.0, jnp.finfo(jnp.float32).min)

    h = x
    gm = gen_mask.astype(bool)
    for li in range(cfg.num_hidden_layers):
        n = jnp.where(
            gm[:, None],
            _rms(h, p["ln1_gen"][li], eps),
            _rms(h, p["ln1_und"][li], eps),
        )
        qkv = jnp.where(
            gm[:, None],
            n @ p["wqkv_gen"][li] + p["bqkv_gen"][li],
            n @ p["wqkv_und"][li] + p["bqkv_und"][li],
        )
        q, k, v = jnp.split(qkv, [nq * d, (nq + nk) * d], -1)
        q = _rms(q.reshape(s, nq, d), p["q_norm"][li], eps)
        k = _rms(k.reshape(s, nk, d), p["k_norm"][li], eps)
        v = v.reshape(s, nk, d)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)
        if nq != nk:
            k = jnp.repeat(k, nq // nk, axis=1)
            v = jnp.repeat(v, nq // nk, axis=1)
        scores = jnp.einsum("qhd,khd->hqk", q, k) * (d**-0.5)
        att = jax.nn.softmax(
            scores.astype(jnp.float32) + bias[None], -1
        ).astype(h.dtype)
        o = jnp.einsum("hqk,khd->qhd", att, v).reshape(s, nq * d)
        o = jnp.where(
            gm[:, None], o @ p["wo_gen"][li], o @ p["wo_und"][li]
        )
        h = h + o

        n = jnp.where(
            gm[:, None],
            _rms(h, p["ln2_gen"][li], eps),
            _rms(h, p["ln2_und"][li], eps),
        )

        def mlp(nx, mode):
            g = nx @ p[f"wg_{mode}"][li]
            u = nx @ p[f"wu_{mode}"][li]
            return (jax.nn.silu(g) * u) @ p[f"wd_{mode}"][li]

        h = h + jnp.where(gm[:, None], mlp(n, "gen"), mlp(n, "und"))

    return _rms(h, p["norm_f"], eps)
