"""TP/DP sharding on the virtual 8-device CPU mesh: greedy generation
must match the single-device engine exactly."""

import jax
import pytest

from ht_vllm_omni_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelArchConfig,
    ParallelConfig,
    SchedulerConfig,
)
from ht_vllm_omni_tpu.engine.llm_engine import LLMEngine
from ht_vllm_omni_tpu.models import qwen2
from ht_vllm_omni_tpu.sampling_params import SamplingParams


def _cfg():
    return ModelArchConfig(
        model_type="qwen2",
        vocab_size=64,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        dtype="float32",
        tie_word_embeddings=True,
        eos_token_id=1,
    )


def _engine(tp=1, dp=1):
    cfg = _cfg()
    params = qwen2.init_params(cfg, jax.random.PRNGKey(11))
    return LLMEngine(
        EngineConfig(
            model=cfg,
            cache=CacheConfig(page_size=16, num_pages=64),
            scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=128),
            parallel=ParallelConfig(
                tensor_parallel_size=tp, data_parallel_size=dp
            ),
        ),
        params=params,
        decode_horizon=5,
    )


@pytest.mark.parametrize("tp", [2])
def test_tp_matches_single_device(tp):
    assert len(jax.devices()) >= tp
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    prompts = [[2, 3, 4], [9, 8, 7, 6, 5]]
    ref = _engine(tp=1).generate(prompts, sp)
    got = _engine(tp=tp).generate(prompts, sp)
    for r, g in zip(ref, got):
        assert r.outputs[0].token_ids == g.outputs[0].token_ids


def test_tp_rejects_indivisible_heads():
    with pytest.raises(ValueError, match="kv heads"):
        _engine(tp=4)  # 2 kv heads not divisible by 4


def test_moe_expert_parallel_matches_single_device():
    """Experts sharded over the tp axis (EP): greedy output identical."""
    cfg_kwargs = dict(
        model_type="qwen3_moe", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, dtype="float32", qk_norm=True,
        attention_bias=False, tie_word_embeddings=True, eos_token_id=1,
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=16,
    )

    def mk(tp):
        cfg = ModelArchConfig(**cfg_kwargs)
        params = qwen2.init_params(cfg, jax.random.PRNGKey(29))
        return LLMEngine(
            EngineConfig(
                model=cfg,
                cache=CacheConfig(page_size=16, num_pages=64),
                scheduler=SchedulerConfig(max_num_seqs=2, max_model_len=64),
                parallel=ParallelConfig(tensor_parallel_size=tp),
            ),
            params=params,
            decode_horizon=4,
        )

    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    want = mk(1).generate([[3, 7, 9]], sp)[0].outputs[0].token_ids
    got = mk(2).generate([[3, 7, 9]], sp)[0].outputs[0].token_ids
    assert got == want
