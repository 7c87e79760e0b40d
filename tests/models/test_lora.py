"""LoRA adapters on the AR engine: activation changes outputs, zero-B
adapters are identity, LRU eviction works, composes with int8 weights."""

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
from ht_vllm_omni_tpu.lora import LoRAManager
from ht_vllm_omni_tpu.lora.manager import init_random_adapter
from ht_vllm_omni_tpu.models import qwen2
from ht_vllm_omni_tpu.quantization import quantize_params
from ht_vllm_omni_tpu.sampling_params import SamplingParams


def _cfg():
    return ModelArchConfig(
        model_type="qwen2", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, dtype="float32", tie_word_embeddings=True,
        eos_token_id=1,
    )


def _engine(params):
    return LLMEngine(
        EngineConfig(
            model=_cfg(),
            cache=CacheConfig(page_size=16, num_pages=64),
            scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=128),
        ),
        params=params,
        decode_horizon=4,
    )


def test_zero_adapter_is_identity_and_nonzero_changes_output():
    base = qwen2.init_params(_cfg(), jax.random.PRNGKey(31))
    mgr = LoRAManager(base)
    mgr.register("zero", init_random_adapter(base, rank=4, seed=1))
    prompt = [5, 9, 2]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)

    want = _engine(dict(base)).generate([prompt], sp)[0].outputs[0].token_ids
    # B initialised to zero -> adapter is a no-op
    with_zero = _engine(mgr.params_with("zero")).generate([prompt], sp)[0]
    assert with_zero.outputs[0].token_ids == want

    # non-zero B changes generation
    hot = init_random_adapter(base, rank=4, seed=2)
    hot = {
        k: (jax.random.normal(jax.random.PRNGKey(3), v.shape) * 0.3
            if k.endswith(":lora_b") else v)
        for k, v in hot.items()
    }
    mgr.register("hot", hot)
    with_hot = _engine(mgr.params_with("hot")).generate([prompt], sp)[0]
    assert with_hot.outputs[0].token_ids != want


def test_lru_eviction():
    base = qwen2.init_params(_cfg(), jax.random.PRNGKey(31))
    mgr = LoRAManager(base, max_cached=2)
    for i in range(3):
        mgr.register(f"a{i}", init_random_adapter(base, rank=2, seed=i))
    assert "a0" not in mgr._cache and "a2" in mgr._cache


def test_lora_over_int8_base():
    base = qwen2.init_params(_cfg(), jax.random.PRNGKey(31))
    q = quantize_params(base, "int8")
    mgr = LoRAManager(q)
    mgr.register("z", init_random_adapter(base, rank=4))
    out = _engine(mgr.params_with("z")).generate(
        [[4, 5]], SamplingParams(temperature=0.0, max_tokens=6,
                                 ignore_eos=True)
    )[0]
    assert len(out.outputs[0].token_ids) == 6
