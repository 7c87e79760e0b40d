"""MiMo-Audio local transformers (jax).

Follows the reference MiMoAudioLLMForConditionalGeneration's local
machinery (reference vllm_omni/model_executor/models/mimo_audio/
mimo_audio_llm.py):

- ``local_decode``: per global decode step, the trunk hidden state
  (downcast to the local width) seeds a small causal transformer that
  emits ``group_size`` frames of ``audio_channels`` RVQ codes under the
  delay pattern — channel c is live on iterations
  [delay[c], delay[c]+group_size) (base_local_forward :787-839).
  Sampling is the reference MiMoSampler greedy path with the empty id
  removed (:93-106).
- ``reembed``: the generated codes re-embed (per-channel embeddings,
  empty -> 0), pass through the NON-causal input-local transformer and
  concatenate over the group into one trunk-width vector
  (_generate_speech_tokens_and_audio_embeddings :952-1008) — the
  feedback that replaces the <|empty|> token embedding on the next
  global step.

Everything is shape-static and scan-friendly so the hooks run inside
the runner's compiled decode chunk (worker/step_adapter.py).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.models.mimo_audio.config import (
    MiMoAudioAdapterConfig,
    MiMoLocalCfg,
)


# ------------------------------------------------------------------ init
def _trunk_params(cfg: MiMoLocalCfg, key: jax.Array) -> dict:
    L, d = cfg.layers, cfg.dim
    ks = iter(jax.random.split(key, 12))

    def w(shape):
        return jax.random.normal(next(ks), shape, jnp.float32) * 0.02

    return {
        "ln1": jnp.ones((L, d)), "ln2": jnp.ones((L, d)),
        "wq": w((L, d, d)), "wk": w((L, d, d)), "wv": w((L, d, d)),
        "wo": w((L, d, d)),
        "wg": w((L, d, cfg.ffn)), "wu": w((L, d, cfg.ffn)),
        "wd": w((L, cfg.ffn, d)),
        "norm_f": jnp.ones((d,)),
    }


def init_params(acfg: MiMoAudioAdapterConfig, key: jax.Array) -> dict:
    ks = iter(jax.random.split(key, 12))

    def w(shape):
        return jax.random.normal(next(ks), shape, jnp.float32) * 0.02

    c, vmax = acfg.audio_channels, acfg.max_vocab
    din, dl = acfg.input_local.dim, acfg.local.dim
    # per-channel embeddings padded to the max vocab; rows past the
    # channel's own vocab (and its empty/padding id) stay zero
    emb = w((c, vmax, din))
    for i in range(c):
        emb = emb.at[i, acfg.speech_empty_ids[i]].set(0.0)
        if acfg.speech_vocab_sizes[i] < vmax:
            emb = emb.at[i, acfg.speech_vocab_sizes[i]:].set(0.0)
    p = {
        "speech_emb": emb,
        "lm_heads": w((c, dl, vmax)),
        "hs_downcast": w((acfg.llm_hidden, dl)),
        "group_downcast": w((acfg.group_size * din, acfg.llm_hidden)),
        "local": _trunk_params(acfg.local, next(ks)),
        "input_local": _trunk_params(acfg.input_local, next(ks)),
    }
    if din != dl:
        p["emb_to_local"] = w((din, dl))
    return p


# ----------------------------------------------------------------- trunk
def _rms(x, w, eps):
    v = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
    return (w * (x * jax.lax.rsqrt(v + eps))).astype(x.dtype)


def _rope_tab(cfg: MiMoLocalCfg, pos):
    half = cfg.head_dim // 2
    inv = 1.0 / (
        cfg.rope_theta ** (jnp.arange(half, dtype=jnp.float32) / half)
    )
    f = pos.astype(jnp.float32)[:, None] * inv
    emb = jnp.concatenate([f, f], -1)
    return jnp.cos(emb), jnp.sin(emb)


def _apply_rope(x, cos, sin):
    half = x.shape[-1] // 2
    xf = x.astype(jnp.float32)
    rot = jnp.concatenate([-xf[..., half:], xf[..., :half]], -1)
    return (xf * cos[None, :, None] + rot * sin[None, :, None]).astype(
        x.dtype
    )


def trunk_forward(cfg: MiMoLocalCfg, p, x, causal: bool):
    """Full (non-cached) forward: x [B, T, D] -> [B, T, D]."""
    b, tt, d = x.shape
    nh, hd = cfg.heads, cfg.head_dim
    cos, sin = _rope_tab(cfg, jnp.arange(tt))
    h = x
    for li in range(cfg.layers):
        n = _rms(h, p["ln1"][li], cfg.eps)
        q = _apply_rope((n @ p["wq"][li]).reshape(b, tt, nh, hd), cos, sin)
        k = _apply_rope((n @ p["wk"][li]).reshape(b, tt, nh, hd), cos, sin)
        v = (n @ p["wv"][li]).reshape(b, tt, nh, hd)
        s = jnp.einsum(
            "bthd,bshd->bhts", q.astype(jnp.float32),
            k.astype(jnp.float32),
        ) / math.sqrt(hd)
        if causal:
            mask = jnp.tril(jnp.ones((tt, tt), bool))
            s = jnp.where(mask[None, None], s, -1e30)
        o = jnp.einsum(
            "bhts,bshd->bthd", jax.nn.softmax(s, -1),
            v.astype(jnp.float32),
        ).reshape(b, tt, d)
        h = h + (o.astype(h.dtype) @ p["wo"][li])
        n = _rms(h, p["ln2"][li], cfg.eps)
        h = h + (jax.nn.silu(n @ p["wg"][li]) * (n @ p["wu"][li])) @ (
            p["wd"][li]
        )
    return _rms(h, p["norm_f"], cfg.eps)


def _trunk_step(cfg: MiMoLocalCfg, p, x, kv_k, kv_v, t):
    """One-token causal step against a dense in-scan cache.

    x [B, D]; kv_k/kv_v [L, B, T_max, D] (rope'd); writes row t."""
    b, d = x.shape
    nh, hd = cfg.heads, cfg.head_dim
    t_max = kv_k.shape[2]
    cos, sin = _rope_tab(cfg, jnp.asarray([0]) * 0 + t)  # [1, hd]
    h = x[:, None]  # [B, 1, D]
    for li in range(cfg.layers):
        n = _rms(h, p["ln1"][li], cfg.eps)
        q = _apply_rope((n @ p["wq"][li]).reshape(b, 1, nh, hd), cos, sin)
        k = _apply_rope((n @ p["wk"][li]).reshape(b, 1, nh, hd), cos, sin)
        v = (n @ p["wv"][li]).reshape(b, 1, d)
        kv_k = kv_k.at[li].set(
            jax.lax.dynamic_update_slice(
                kv_k[li], k.reshape(b, 1, d), (0, t, 0)
            )
        )
        kv_v = kv_v.at[li].set(
            jax.lax.dynamic_update_slice(kv_v[li], v, (0, t, 0))
        )
        kr = kv_k[li].reshape(b, t_max, nh, hd)
        vr = kv_v[li].reshape(b, t_max, nh, hd)
        s = jnp.einsum(
            "bthd,bshd->bhts", q.astype(jnp.float32),
            kr.astype(jnp.float32),
        ) / math.sqrt(hd)
        live = jnp.arange(t_max)[None, None, None, :] <= t
        s = jnp.where(live, s, -1e30)
        o = jnp.einsum(
            "bhts,bshd->bthd", jax.nn.softmax(s, -1),
            vr.astype(jnp.float32),
        ).reshape(b, 1, d)
        h = h + (o.astype(h.dtype) @ p["wo"][li])
        n = _rms(h, p["ln2"][li], cfg.eps)
        h = h + (jax.nn.silu(n @ p["wg"][li]) * (n @ p["wu"][li])) @ (
            p["wd"][li]
        )
    return _rms(h[:, 0], p["norm_f"], cfg.eps), kv_k, kv_v


# ----------------------------------------------------------- local decode
def local_decode(acfg: MiMoAudioAdapterConfig, p, seed_emb):
    """seed_emb [S, D_local] (downcast trunk hidden) -> codes
    [S, group_size, channels] int32, greedy under the delay pattern."""
    s = seed_emb.shape[0]
    lc = acfg.local
    g, c = acfg.group_size, acfg.audio_channels
    iters = acfg.delay_iters
    kv_k = jnp.zeros((lc.layers, s, iters, lc.dim), jnp.float32)
    kv_v = jnp.zeros_like(kv_k)
    vmax = acfg.max_vocab
    vocab = jnp.asarray(acfg.speech_vocab_sizes)
    empty = jnp.asarray(acfg.speech_empty_ids)
    delay = jnp.asarray(acfg.delay_pattern)
    col = jnp.arange(vmax)
    # [C, Vmax] column mask: channel's own vocab minus its empty id
    allow = (col[None] < vocab[:, None]) & (col[None] != empty[:, None])

    def step(carry, t):
        x, kv_k, kv_v, codes = carry
        h, kv_k, kv_v = _trunk_step(lc, p["local"], x, kv_k, kv_v, t)
        logits = jnp.einsum("sd,cdv->scv", h, p["lm_heads"])  # [S, C, V]
        logits = jnp.where(allow[None], logits, -jnp.inf)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)  # [S, C]
        live = (delay <= t) & (t < delay + g)  # [C]
        tok = jnp.where(live[None], tok, empty[None])
        # write codes[s, t - delay[c], c] where live
        frame = jnp.clip(t - delay, 0, g - 1)  # [C]
        onehot = (
            jnp.arange(g)[None, :, None] == frame[None, None, :]
        ) & live[None, None, :]
        codes = jnp.where(onehot, tok[:, None, :], codes)
        # next input: sum of live channels' embeddings
        emb = jnp.einsum(
            "scd->sd",
            jnp.take_along_axis(
                p["speech_emb"][None], tok[:, :, None, None], 2
            )[:, :, 0]  # [S, C, D_in]
            * live[None, :, None],
        )
        if "emb_to_local" in p:
            emb = emb @ p["emb_to_local"]
        return (emb.astype(seed_emb.dtype), kv_k, kv_v, codes), None

    codes0 = jnp.broadcast_to(
        empty[None, None], (s, g, c)
    ).astype(jnp.int32)
    (_, _, _, codes), _ = jax.lax.scan(
        step, (seed_emb, kv_k, kv_v, codes0), jnp.arange(iters)
    )
    return codes


def reembed(acfg: MiMoAudioAdapterConfig, p, codes):
    """codes [S, G, C] -> feedback embedding [S, H_llm] (reference
    _generate_speech_tokens_and_audio_embeddings :952-1008)."""
    s = codes.shape[0]
    g, c = acfg.group_size, acfg.audio_channels
    empty = jnp.asarray(acfg.speech_empty_ids)
    # [S, G, C, D_in] channel embeds, empty frames -> 0
    emb = jnp.take_along_axis(
        p["speech_emb"][None, None], codes[..., None, None], 3
    )[..., 0, :]
    emb = emb * (codes[..., None] != empty[None, None, :, None])
    frames = emb.sum(2)  # [S, G, D_in]
    h = trunk_forward(acfg.input_local, p["input_local"], frames,
                      causal=False)
    return h.reshape(s, -1) @ p["group_downcast"]
