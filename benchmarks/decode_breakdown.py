"""Decompose decode-chunk time: layers+attention vs logits+sampling.

Run on the real chip: python benchmarks/decode_breakdown.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.config import ModelArchConfig
from ht_vllm_omni_tpu.models import qwen2
from ht_vllm_omni_tpu.sample.sampler import (
    SamplingTensors,
    sample_tokens,
    split_keys,
)

S, K, PAGE = 8, 256, 128
cfg = ModelArchConfig()  # 0.5B bf16 defaults
L = cfg.num_hidden_layers
F = cfg.num_key_value_heads * cfg.head_dim

params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
nslots = 1024 * PAGE // PAGE * PAGE  # 1024 pages worth of rows
kv_cache = jnp.zeros((L, 1024 * PAGE, 2 * F), jnp.bfloat16)
block_tables = jnp.asarray(
    np.arange(S * 8, dtype=np.int32).reshape(S, 8)
)
seq_lens0 = jnp.full((S,), 64, jnp.int32)
positions0 = jnp.full((S,), 64, jnp.int32)
tokens0 = jnp.full((S,), 5, jnp.int32)
keys0 = jax.vmap(jax.random.PRNGKey)(jnp.arange(S, dtype=jnp.uint32))
st = SamplingTensors(
    jnp.zeros((S,), jnp.float32),
    jnp.full((S,), 64, jnp.int32),
    jnp.ones((S,), jnp.float32),
)


def timeit(name, fn, *args):
    out = fn(*args)
    jax.tree.map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, out,
    )
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        jax.tree.map(
            lambda x: x.block_until_ready()
            if hasattr(x, "block_until_ready") else x, out,
        )
    dt = (time.time() - t0) / reps
    print(f"{name:34s} {dt*1e3/K:7.3f} ms/step  {dt*1e3:8.1f} ms/chunk")
    return dt


@jax.jit
def chunk_layers_only(params, kv_cache, tokens, positions):
    fresh = jnp.zeros((L, S * K, 2 * F), jnp.bfloat16)
    written = jnp.zeros((S, K), bool)

    def step(carry, j):
        tokens, pos, fresh, written = carry
        written = written.at[:, j].set(True)
        x = qwen2.embed_tokens(params, tokens)
        h, fresh = qwen2.decode(
            cfg, params, kv_cache, fresh, x, pos, j, written,
            block_tables, seq_lens0, page_size=PAGE, chunk_steps=K,
        )
        # fake next token from hidden without the lm_head
        nxt = (h[:, 0] * 0).astype(jnp.int32) + 7
        return (nxt, pos + 1, fresh, written), nxt

    (_, _, _, _), outs = jax.lax.scan(
        step, (tokens, positions, fresh, written),
        jnp.arange(K, dtype=jnp.int32),
    )
    return outs


@jax.jit
def chunk_logits_sample_only(params, keys, hidden):
    def step(carry, h):
        keys, _ = carry
        logits = qwen2.compute_logits(cfg, params, h)
        keys, sk = split_keys(keys)
        tok = sample_tokens(logits, st, sk)
        return (keys, tok), tok

    (_, _), outs = jax.lax.scan(
        step, (keys, jnp.zeros((S,), jnp.int32)), hidden
    )
    return outs


@jax.jit
def chunk_full(params, kv_cache, tokens, positions, keys):
    fresh = jnp.zeros((L, S * K, 2 * F), jnp.bfloat16)
    written = jnp.zeros((S, K), bool)

    def step(carry, j):
        keys, tokens, pos, fresh, written = carry
        written = written.at[:, j].set(True)
        x = qwen2.embed_tokens(params, tokens)
        h, fresh = qwen2.decode(
            cfg, params, kv_cache, fresh, x, pos, j, written,
            block_tables, seq_lens0, page_size=PAGE, chunk_steps=K,
        )
        logits = qwen2.compute_logits(cfg, params, h)
        keys, sk = split_keys(keys)
        tok = sample_tokens(logits, st, sk)
        return (keys, tok, pos + 1, fresh, written), tok

    (_, _, _, _, _), outs = jax.lax.scan(
        step, (keys, tokens, positions, fresh, written),
        jnp.arange(K, dtype=jnp.int32),
    )
    return outs


hidden_seq = jax.random.normal(
    jax.random.PRNGKey(1), (K, S, cfg.hidden_size), jnp.bfloat16
)

print(f"model: {cfg.num_hidden_layers}L hidden={cfg.hidden_size} "
      f"vocab={cfg.vocab_size} tie={cfg.tie_word_embeddings}")
t_l = timeit("layers+paged-attn only", chunk_layers_only, params,
             kv_cache, tokens0, positions0)
t_s = timeit("logits+sampling only", chunk_logits_sample_only, params,
             keys0, hidden_seq)
t_f = timeit("full step", chunk_full, params, kv_cache, tokens0,
             positions0, keys0)
print(f"sum parts {1e3*(t_l+t_s)/K:.3f} ms/step vs full "
      f"{1e3*t_f/K:.3f} ms/step")
