"""Voxtral TTS flow-matching acoustic transformer (jax).

Expands one talker hidden state into one audio frame of
``[semantic, acoustic x N]`` codes, exactly following the reference
FlowMatchingAudioTransformer (reference vllm_omni/model_executor/models/
voxtral_tts/voxtral_tts_audio_generation.py:393-607):

- semantic code: masked argmax over ``semantic_codebook_output`` logits
  ([EMPTY_AUDIO] banned, ids past the real codebook banned);
- acoustic codes: ``decode_iters``-point Euler flow matching over
  ``n_acoustic_codebook`` continuous values with classifier-free
  guidance (cond = projected llm hidden, uncond = zeros), then FSQ
  quantization to ``acoustic_codebook_size`` levels.

The per-frame RNG key is derived deterministically from the frame's
sequence position (``frame_keys``), so the in-loop decode feedback
(worker step adapter) and the stage-edge code recomputation produce
byte-identical codes.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.models.voxtral_tts.config import (
    AcousticFlowConfig,
    EMPTY_AUDIO,
    END_AUDIO,
    NUM_SPECIAL,
)


# ------------------------------------------------------------------ params


def init_params(
    cfg: AcousticFlowConfig,
    key: jax.Array,
    llm_hidden_size: int | None = None,
) -> dict:
    """Random params in the jax layout ([in, out] matmul weights)."""
    h = llm_hidden_size or cfg.input_dim
    ks = iter(jax.random.split(key, 16 + 9 * cfg.n_layers))

    def w(shape, scale=0.02):
        return (
            jax.random.normal(next(ks), shape, jnp.float32) * scale
        )

    L, d, hd = cfg.n_layers, cfg.dim, cfg.head_dim
    nq, nk = cfg.n_heads, cfg.n_kv_heads
    p = {
        "time_inv_freq": jnp.exp(
            -math.log(10000.0)
            * jnp.arange(d // 2, dtype=jnp.float32)
            / (d // 2)
        ),
        "w_input": w((cfg.n_acoustic_codebook, d)),
        "w_time": w((d, d)),
        "w_llm": w((cfg.input_dim, d)),
        # the semantic head reads the raw llm hidden (reference applies
        # semantic_codebook_output directly to llm_hidden, which pins
        # its in-features to the llm dim)
        "w_sem_out": w((cfg.input_dim, cfg.padded_semantic_size)),
        "w_ac_out": w((d, cfg.n_acoustic_codebook)),
        "norm": jnp.ones((d,), jnp.float32),
        "ln1": jnp.ones((L, d), jnp.float32),
        "ln2": jnp.ones((L, d), jnp.float32),
        "wq": w((L, d, nq * hd)),
        "wk": w((L, d, nk * hd)),
        "wv": w((L, d, nk * hd)),
        "wo": w((L, nq * hd, d)),
        "w1": w((L, d, cfg.hidden_dim)),
        "w3": w((L, d, cfg.hidden_dim)),
        "w2": w((L, cfg.hidden_dim, d)),
        # MultiVocabEmbeddings table for the trunk's next-step input
        # (reference voxtral_tts_audio_tokenizer.py:427-450)
        "mm_embed": w((cfg.mm_vocab_size, h)),
    }
    return p


def load_torch_state(cfg: AcousticFlowConfig, state: dict) -> dict:
    """Map a reference-format torch state dict onto the jax layout.

    Accepts acoustic-transformer names (``input_projection.weight``,
    ``layers.{i}.attention.wq.weight``, ...) plus the tokenizer-side
    ``audio_token_embedding.embeddings.weight``."""

    def g(name):
        v = state[name]
        return jnp.asarray(np.asarray(v, np.float32))

    L = cfg.n_layers
    stk = lambda fmt, T=True: jnp.stack(
        [
            g(fmt.format(i)).T if T else g(fmt.format(i))
            for i in range(L)
        ]
    )
    p = {
        "time_inv_freq": g("time_embedding.inv_freq"),
        "w_input": g("input_projection.weight").T,
        "w_time": g("time_projection.weight").T,
        "w_llm": g("llm_projection.weight").T,
        "w_sem_out": g("semantic_codebook_output.weight").T,
        "w_ac_out": g("acoustic_codebook_output.weight").T,
        "norm": g("norm.weight"),
        "ln1": stk("layers.{}.attention_norm.weight", T=False),
        "ln2": stk("layers.{}.ffn_norm.weight", T=False),
        "wq": stk("layers.{}.attention.wq.weight"),
        "wk": stk("layers.{}.attention.wk.weight"),
        "wv": stk("layers.{}.attention.wv.weight"),
        "wo": stk("layers.{}.attention.wo.weight"),
        "w1": stk("layers.{}.feed_forward.w1.weight"),
        "w3": stk("layers.{}.feed_forward.w3.weight"),
        "w2": stk("layers.{}.feed_forward.w2.weight"),
    }
    if "audio_token_embedding.embeddings.weight" in state:
        p["mm_embed"] = g("audio_token_embedding.embeddings.weight")
    return p


# ------------------------------------------------------------------ model


def _rms(x, w, eps):
    v = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
    return (w * (x * jax.lax.rsqrt(v + eps))).astype(x.dtype)


def _block(cfg: AcousticFlowConfig, p, li: int, x: jax.Array):
    """One bidirectional (maskless) acoustic transformer block over the
    3-token sequence [x_t, t_emb, llm]."""
    b, s, _ = x.shape
    nq, nk, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    h = _rms(x, p["ln1"][li], cfg.norm_eps)
    q = (h @ p["wq"][li]).reshape(b, s, nq, hd)
    k = (h @ p["wk"][li]).reshape(b, s, nk, hd)
    v = (h @ p["wv"][li]).reshape(b, s, nk, hd)
    k = jnp.repeat(k, nq // nk, axis=2)
    v = jnp.repeat(v, nq // nk, axis=2)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (hd**-0.5)
    attn = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(x.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, s, nq * hd)
    x = x + o @ p["wo"][li]
    h = _rms(x, p["ln2"][li], cfg.norm_eps)
    return x + (jax.nn.silu(h @ p["w1"][li]) * (h @ p["w3"][li])) @ p["w2"][li]


def time_embedding(cfg: AcousticFlowConfig, p, t: jax.Array) -> jax.Array:
    """Sinusoidal time embedding; t is [B, 1]."""
    emb = t @ p["time_inv_freq"][None, :]
    return jnp.concatenate([jnp.cos(emb), jnp.sin(emb)], axis=-1)


def predict_velocity(cfg, p, x_t, llm, t_emb):
    """One velocity evaluation (voxtral_tts_audio_generation.py:558)."""
    toks = jnp.stack(
        [
            x_t @ p["w_input"],
            t_emb @ p["w_time"],
            llm @ p["w_llm"],
        ],
        axis=1,
    )
    h = toks
    for li in range(cfg.n_layers):
        h = _block(cfg, p, li, h)
    h = _rms(h, p["norm"], cfg.norm_eps)
    return h[:, 0] @ p["w_ac_out"]


def decode_frames(
    cfg: AcousticFlowConfig, p, llm_hidden: jax.Array, keys: jax.Array
) -> jax.Array:
    """Expand llm hidden states [n, D] into codes [n, 1 + n_acoustic].

    ``keys`` is an [n]-stack of jax PRNG keys (one per frame; see
    ``frame_keys``)."""
    n = llm_hidden.shape[0]
    x = llm_hidden.astype(jnp.float32)

    sem_logits = x @ p["w_sem_out"]
    neg = jnp.finfo(jnp.float32).min
    sem_logits = sem_logits.at[:, EMPTY_AUDIO].set(neg)
    sem_logits = sem_logits.at[
        :, NUM_SPECIAL + cfg.semantic_codebook_size :
    ].set(neg)
    sem = jnp.argmax(sem_logits, axis=-1).astype(jnp.int32)

    is_end = sem == END_AUDIO
    x0 = cfg.noise_scale * jax.vmap(
        lambda k: jax.random.normal(k, (cfg.n_acoustic_codebook,))
    )(keys)

    ts = jnp.linspace(0.0, 1.0, cfg.decode_iters)
    llm2 = jnp.concatenate([x, jnp.zeros_like(x)], axis=0)

    def euler(sampled, i):
        t = ts[i]
        dt = ts[i + 1] - ts[i]
        t_emb = time_embedding(cfg, p, jnp.full((n, 1), t))
        v = predict_velocity(
            cfg,
            p,
            jnp.concatenate([sampled, sampled], axis=0),
            llm2,
            jnp.concatenate([t_emb, t_emb], axis=0),
        )
        v = cfg.cfg_alpha * v[:n] + (1.0 - cfg.cfg_alpha) * v[n:]
        return sampled + v * dt, None

    sampled, _ = jax.lax.scan(
        euler, x0, jnp.arange(cfg.decode_iters - 1)
    )
    sampled = jnp.clip(sampled, -1.0, 1.0)
    scaled = (sampled + 1.0) / 2.0 * (cfg.acoustic_codebook_size - 1)
    ac = jnp.rint(scaled).astype(jnp.int32)
    ac = jnp.where(is_end[:, None], EMPTY_AUDIO, ac) + NUM_SPECIAL
    return jnp.concatenate([sem[:, None], ac], axis=1)


def frame_keys(seed: int, positions: jax.Array) -> jax.Array:
    """Deterministic per-frame PRNG keys from sequence positions."""
    base = jax.random.PRNGKey(seed)
    return jax.vmap(lambda t: jax.random.fold_in(base, t))(positions)


def mm_embed(cfg: AcousticFlowConfig, p, codes: jax.Array) -> jax.Array:
    """Sum of per-codebook embeddings -> next trunk input embedding
    (reference MultiVocabEmbeddings + .sum(dim=1),
    voxtral_tts_audio_tokenizer.py:985)."""
    sizes = np.asarray(cfg.codebook_sizes, np.int32)
    offs = jnp.asarray(
        np.concatenate([[0], np.cumsum(sizes)[:-1]]), jnp.int32
    )
    return jnp.sum(p["mm_embed"][codes + offs[None, :]], axis=1)


def next_token(codes: jax.Array, eos_id: int, audio_tok_id: int):
    """Forced text-vocab token stream (fake_logits_for_audio_tokens,
    voxtral_tts_audio_generation.py:986): EOS once the semantic head
    emits [END_AUDIO], the audio placeholder otherwise."""
    return jnp.where(
        codes[:, 0] == END_AUDIO, eos_id, audio_tok_id
    ).astype(jnp.int32)
