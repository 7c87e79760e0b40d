"""int8 KV cache: engine runs end-to-end, cache is int8, outputs track fp."""

import numpy as np

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelArchConfig,
    SchedulerConfig,
)
from ht_vllm_omni_tpu.engine.llm_engine import LLMEngine
from ht_vllm_omni_tpu.models import qwen2
from ht_vllm_omni_tpu.sampling_params import SamplingParams


def _cfg():
    return ModelArchConfig(
        model_type="qwen2", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, dtype="float32", tie_word_embeddings=True,
        eos_token_id=1,
    )


def _engine(params, kv_dtype="auto"):
    return LLMEngine(
        EngineConfig(
            model=_cfg(),
            cache=CacheConfig(
                page_size=16, num_pages=64, kv_cache_dtype=kv_dtype,
                kv_scale_k=0.02, kv_scale_v=0.02,
            ),
            scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=128),
        ),
        params=params,
        decode_horizon=4,
    )


def test_int8_kv_cache_runs_and_tracks_fp():
    params = qwen2.init_params(_cfg(), jax.random.PRNGKey(23))
    prompt = [7, 3, 11, 30]
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    fp = _engine(params).generate([prompt], sp)[0].outputs[0].token_ids

    e8 = _engine(params, "int8")
    assert e8.runner.kv_cache.dtype == jnp.int8
    # rows padded to whole int8 tiles (2F=128 -> 512)
    assert e8.runner.kv_cache.shape[-1] == 512
    q8 = e8.generate([prompt], sp)[0].outputs[0].token_ids
    assert len(q8) == 12
    # first tokens track the fp path (per-tensor int8 noise is small)
    assert q8[0] == fp[0]
    agree = sum(a == b for a, b in zip(q8, fp))
    assert agree >= 6, (q8, fp)


def test_int8_kv_with_chunked_prefill():
    params = qwen2.init_params(_cfg(), jax.random.PRNGKey(23))
    prompt = list(range(2, 50))
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    e = LLMEngine(
        EngineConfig(
            model=_cfg(),
            cache=CacheConfig(
                page_size=16, num_pages=64, kv_cache_dtype="int8",
                kv_scale_k=0.02, kv_scale_v=0.02,
            ),
            scheduler=SchedulerConfig(
                max_num_seqs=4, max_model_len=128, prefill_chunk_size=16
            ),
        ),
        params=params,
        decode_horizon=4,
    )
    out = e.generate([prompt], sp)[0]
    assert len(out.outputs[0].token_ids) == 8


def test_fp8_kv_cache_runs_and_tracks_fp():
    params = qwen2.init_params(_cfg(), jax.random.PRNGKey(23))
    prompt = [7, 3, 11, 30]
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    fp = _engine(params).generate([prompt], sp)[0].outputs[0].token_ids

    ef = _engine(params, "fp8")
    assert ef.runner.kv_cache.dtype == jnp.float8_e4m3fn
    got = ef.generate([prompt], sp)[0].outputs[0].token_ids
    assert len(got) == 12
    n = sum(1 for a, b in zip(fp, got) if a == b)
    # e4m3 has more mantissa than the int8 grid at these scales
    assert n >= 8, (fp, got)
