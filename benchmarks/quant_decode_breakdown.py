"""Where does an int4/int8 decode step spend its time?

Times (a) the engine's real decode chunk, (b) the paged-attention kernel
alone at the same shapes, (c) quantized lm_head logits + sampling alone —
each via dependency-chained scans so the tunnel round-trip cancels.

Run on the real chip: python benchmarks/quant_decode_breakdown.py [int4]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.config import (
    CacheConfig, EngineConfig, ModelArchConfig, SchedulerConfig,
)
from ht_vllm_omni_tpu.engine.llm_engine import LLMEngine
from ht_vllm_omni_tpu.sampling_params import SamplingParams

QUANT = sys.argv[1] if len(sys.argv) > 1 else "int4"
S, K = 8, 256
import dataclasses

cfg = dataclasses.replace(ModelArchConfig(), quantization=QUANT)
rng = np.random.default_rng(0)
prompts = [list(rng.integers(0, 1000, size=32)) for _ in range(S)]
sp = SamplingParams(temperature=0.0, max_tokens=K, ignore_eos=True)

eng = LLMEngine(
    EngineConfig(
        model=cfg,
        cache=CacheConfig(page_size=128, num_pages=1024),
        scheduler=SchedulerConfig(max_num_seqs=S, max_model_len=2048),
    ),
    decode_horizon=K,
)
eng.generate(prompts, sp)  # warm
t0 = time.time()
outs = eng.generate(prompts, sp)
dt = time.time() - t0
n_tok = sum(len(o.outputs[0].token_ids) for o in outs)
print(f"engine {QUANT}: {n_tok/dt:8.1f} tok/s  "
      f"{dt/ (n_tok/S) * 1e3:6.3f} ms/step")

r = eng.runner
L = cfg.num_hidden_layers
F = cfg.num_key_value_heads * cfg.head_dim


def marginal(name, make_fn, n_short=32, n_long=256):
    ts = {}
    for n in (n_short, n_long):
        fn = jax.jit(make_fn(n))
        fn().block_until_ready()
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            fn().block_until_ready()
        ts[n] = (time.time() - t0) / reps
    per = (ts[n_long] - ts[n_short]) / (n_long - n_short)
    print(f"{name:42s} {per*1e6:8.1f} us/iter")
    return per


# (b) paged attention alone: one launch per (layer-step); chained via q
from ht_vllm_omni_tpu.ops.paged_attention import paged_decode_attention

kv_cacheL = jnp.zeros((L, 1024 * 128, 2 * F), jnp.bfloat16)
tables = jnp.asarray(np.arange(S * 8, dtype=np.int32).reshape(S, 8))
lens = jnp.full((S,), 256, jnp.int32)
q0 = jnp.zeros((S, cfg.num_attention_heads, cfg.head_dim), jnp.bfloat16)


def mk_attn(n):
    def run():
        def body(q, j):
            o = paged_decode_attention(
                q, kv_cacheL, j % L, tables, lens, page_size=128,
                kv_heads=cfg.num_key_value_heads,
                sm_scale=cfg.head_dim ** -0.5,
            )
            return (o + 1e-6).astype(q.dtype), None

        q, _ = jax.lax.scan(body, q0, jnp.arange(n))
        return q

    return run


attn_per = marginal("paged_decode_attention (1 layer)", mk_attn)
print(f"  -> x{L} layers = {attn_per*L*1e6:8.1f} us/step")

# (c) logits + sampling alone with the ENGINE's (quantized) lm head
from ht_vllm_omni_tpu.models import qwen2
from ht_vllm_omni_tpu.sample.sampler import (
    SamplingTensors, sample_tokens,
)

st = SamplingTensors(
    jnp.zeros((S,), jnp.float32), jnp.full((S,), 64, jnp.int32),
    jnp.ones((S,), jnp.float32),
)
keys0 = jax.vmap(jax.random.PRNGKey)(jnp.arange(S, dtype=jnp.uint32))
h0 = jnp.zeros((S, cfg.hidden_size), jnp.bfloat16)
params = r.params


def mk_logits(n):
    def run():
        def body(carry, _):
            h, keys = carry
            logits = qwen2.compute_logits(cfg, params, h)
            keys2 = keys
            tok = sample_tokens(logits, st, keys2)
            h = h + tok[:, None].astype(jnp.bfloat16) * 1e-9
            return (h, keys2), None

        (h, _), _ = jax.lax.scan(body, (h0, keys0), jnp.arange(n))
        return h

    return run


lg_per = marginal("compute_logits + sample", mk_logits)

# (c2) logits matmul only
def mk_logits_only(n):
    def run():
        def body(h, _):
            logits = qwen2.compute_logits(cfg, params, h)
            return h + logits[:, :1].astype(jnp.bfloat16) * 1e-9, None

        h, _ = jax.lax.scan(body, h0, jnp.arange(n))
        return h

    return run


lo_per = marginal("compute_logits only", mk_logits_only)

print(f"\nsummary ({QUANT}): attn {attn_per*L*1e6:.0f} us + "
      f"logits+sample {lg_per*1e6:.0f} us "
      f"(logits {lo_per*1e6:.0f} us) per step")
