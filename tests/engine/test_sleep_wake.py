import jax

from ht_vllm_omni_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelArchConfig,
    SchedulerConfig,
)
from ht_vllm_omni_tpu.engine.llm_engine import LLMEngine
from ht_vllm_omni_tpu.models import qwen2
from ht_vllm_omni_tpu.sampling_params import SamplingParams


def test_sleep_wake_roundtrip():
    cfg = ModelArchConfig(
        model_type="qwen2", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, dtype="float32", tie_word_embeddings=True,
        eos_token_id=1,
    )
    params = qwen2.init_params(cfg, jax.random.PRNGKey(41))
    engine = LLMEngine(
        EngineConfig(
            model=cfg,
            cache=CacheConfig(page_size=16, num_pages=64),
            scheduler=SchedulerConfig(max_num_seqs=2, max_model_len=64),
        ),
        params=params,
        decode_horizon=4,
    )
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    want = engine.generate([[5, 6]], sp)[0].outputs[0].token_ids

    engine.sleep(level=2)
    assert engine.runner.kv_cache is None and engine.runner.params is None
    engine.wake()
    got = engine.generate([[5, 6]], sp)[0].outputs[0].token_ids
    assert got == want
