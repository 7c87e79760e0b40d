"""On-device batched sampler (greedy / temperature / top-k / top-p).

Static-shape design for XLA: the full vocab is reduced to a fixed TOPK
candidate set with lax.top_k, then per-request top-k / top-p masks and a
Gumbel-max draw pick the token — no host round-trip, no dynamic shapes.
Per-slot PRNG keys live on device and are split every step.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

# candidate pool size; requests asking for top_k > this are clamped.
TOPK_CANDIDATES = 64
# per-slot logit_bias capacity (OpenAI caps requests at 300 entries;
# 64 covers practical use — the API layer truncates with a warning)
MAX_LOGIT_BIAS = 64
# alternatives returned per sampled token (logprobs mode)
MAX_TOP_LOGPROBS = 5


@dataclasses.dataclass
class SamplingTensors:
    """Per-slot device arrays describing how to sample each row."""

    temperature: jax.Array  # [B] f32; 0 => greedy
    top_k: jax.Array  # [B] int32; <=0 => disabled
    top_p: jax.Array  # [B] f32
    # OpenAI logit_bias: per-slot sparse additive bias.  ids are token
    # ids with >= vocab_size as padding (the scatter drops them — the
    # sentinel must be positive: negative ids WRAP, paged_attention.py:788)
    bias_ids: jax.Array | None = None  # [B, MAX_LOGIT_BIAS] int32
    bias_val: jax.Array | None = None  # [B, MAX_LOGIT_BIAS] f32
    # min_p nucleus floor: candidates with prob < min_p * max_prob drop
    # (vLLM-style; 0 = off)
    min_p: jax.Array | None = None  # [B] f32

    @staticmethod
    def from_params(params_list, pad_to: int) -> "SamplingTensors":
        temp = np.zeros(pad_to, np.float32)
        tk = np.zeros(pad_to, np.int32)
        tp = np.ones(pad_to, np.float32)
        mp = np.zeros(pad_to, np.float32)
        any_bias = any(
            getattr(sp, "logit_bias", None) for sp in params_list
        )
        b_ids = (
            np.full((pad_to, MAX_LOGIT_BIAS), 1 << 30, np.int32)
            if any_bias else None
        )
        b_val = (
            np.zeros((pad_to, MAX_LOGIT_BIAS), np.float32)
            if any_bias else None
        )
        for i, sp in enumerate(params_list):
            temp[i] = sp.temperature
            tk[i] = sp.top_k if sp.top_k > 0 else TOPK_CANDIDATES
            tp[i] = sp.top_p
            mp[i] = getattr(sp, "min_p", 0.0) or 0.0
            lb = getattr(sp, "logit_bias", None)
            if lb:
                for j, (tok, val) in enumerate(
                    list(lb.items())[:MAX_LOGIT_BIAS]
                ):
                    b_ids[i, j] = int(tok)
                    b_val[i, j] = float(val)
        return SamplingTensors(
            jnp.asarray(temp), jnp.asarray(tk), jnp.asarray(tp),
            jnp.asarray(b_ids) if any_bias else None,
            jnp.asarray(b_val) if any_bias else None,
            jnp.asarray(mp),
        )


def apply_logit_bias(
    logits: jax.Array,  # [B, V] f32
    bias_ids: jax.Array | None,  # [B, NB] int32 (>= V = padding)
    bias_val: jax.Array | None,  # [B, NB] f32
) -> jax.Array:
    """Sparse additive logit bias BEFORE candidate selection (so a
    promoted token can enter the top-k pool and a banned one leaves the
    greedy argmax)."""
    if bias_ids is None:
        return logits
    b = logits.shape[0]
    return logits.at[
        jnp.arange(b)[:, None], bias_ids
    ].add(bias_val, mode="drop")


def sample_tokens(
    logits: jax.Array,  # [B, V] f32
    tensors: SamplingTensors,
    keys: jax.Array,  # [B] PRNG keys (jax.random.key dtype)
) -> jax.Array:
    """Returns sampled token ids [B] int32.

    Candidates come from lax.approx_max_k (TPU hardware top-k; ~3x faster
    than exact top_k at 150k vocab, recall > 0.95 which is noise relative
    to sampling randomness).  The greedy path uses an exact argmax so
    temperature=0 is bit-deterministic.
    """
    batch, _ = logits.shape
    logits = apply_logit_bias(
        logits, tensors.bias_ids, tensors.bias_val
    )
    top_logits, top_idx = jax.lax.approx_max_k(logits, TOPK_CANDIDATES)
    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    temp = jnp.maximum(tensors.temperature, 1e-6)[:, None]
    scaled = top_logits / temp

    rank = jnp.arange(TOPK_CANDIDATES)[None, :]
    mask = rank < jnp.clip(tensors.top_k, 1, TOPK_CANDIDATES)[:, None]

    # top-p over the (descending) candidate distribution
    probs = jax.nn.softmax(jnp.where(mask, scaled, -jnp.inf), axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens while cumulative prob of *previous* tokens < top_p
    keep = (cum - probs) < tensors.top_p[:, None]
    mask = jnp.logical_and(mask, keep)
    if tensors.min_p is not None:
        # min_p floor relative to the (temperature-scaled) max prob —
        # candidates are descending, so column 0 holds the max
        floor = tensors.min_p[:, None] * probs[:, :1]
        mask = jnp.logical_and(mask, probs >= floor)

    masked = jnp.where(mask, scaled, -jnp.inf)
    gumbel = _batched_gumbel(keys, (batch, TOPK_CANDIDATES))
    choice = jnp.argmax(masked + gumbel, axis=-1)
    sampled = jnp.take_along_axis(top_idx, choice[:, None], axis=1)[:, 0]
    return jnp.where(
        tensors.temperature == 0.0, greedy_tok, sampled
    ).astype(jnp.int32)


def _batched_gumbel(keys: jax.Array, shape: tuple[int, int]) -> jax.Array:
    def one(key):
        return jax.random.gumbel(key, (shape[1],))

    return jax.vmap(one)(keys)


def split_keys(keys: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Advance per-slot keys one step: returns (new_state, step_keys)."""
    splits = jax.vmap(lambda k: jax.random.split(k, 2))(keys)
    return splits[:, 0], splits[:, 1]


def make_slot_keys(seeds: np.ndarray) -> jax.Array:
    return jax.vmap(jax.random.PRNGKey)(jnp.asarray(seeds, jnp.uint32))


def apply_repetition_penalty(
    logits: jax.Array,  # [B, V] f32
    seen: jax.Array,  # [B, V] bool — prompt + generated tokens so far
    penalty: jax.Array,  # [B] f32; 1.0 = off
) -> jax.Array:
    """HF-style repetition penalty (reference samplers apply it over
    prompt AND output tokens): seen tokens' logits divide by p when
    positive, multiply when negative.  Vectorized [B, V] where — the
    seen mask lives on device and is maintained by the prefill/decode
    programs (worker/model_runner.py)."""
    p = penalty[:, None]
    penalized = jnp.where(logits > 0, logits / p, logits * p)
    return jnp.where(seen & (p != 1.0), penalized, logits)


def apply_presence_frequency(
    logits: jax.Array,  # [B, V] f32
    seen: jax.Array,  # [B, V] bool — tokens generated so far
    presence: jax.Array,  # [B] f32 (0 = off)
    counts: jax.Array | None,  # [B, V] int32 output-token counts
    frequency: jax.Array | None,  # [B] f32 (0 = off)
) -> jax.Array:
    """OpenAI presence/frequency penalties: subtract ``presence`` from
    every token already generated and ``frequency * count`` per
    occurrence (additive, unlike the multiplicative HF repetition
    penalty above — both can be active)."""
    out = logits - presence[:, None] * seen.astype(logits.dtype)
    if counts is not None and frequency is not None:
        out = out - frequency[:, None] * counts.astype(logits.dtype)
    return out
