"""Dedicated expert-parallel mesh axis on the virtual 8-device CPU mesh.

The reference carves an EP group out of world \\ pp (RankGenerator,
parallel_state.py:256-263,854-864) so MoE models can spread experts
wider than attention's tp.  Here the mesh gains an "ep" axis: expert
leaves shard over (ep, tp), dense layers stay tp-sharded/ep-replicated,
and the routed partial is psum'd over ep inside qwen2._mlp.  Greedy
generation under ep2 x tp2 (and ep4 x tp1) must match the single-device
engine exactly.
"""

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
from ht_vllm_omni_tpu.parallel.mesh import MeshConfig, make_mesh, validate_tp
from ht_vllm_omni_tpu.sampling_params import SamplingParams


def _moe_cfg(num_experts=8, shared=False):
    return ModelArchConfig(
        model_type="qwen3_moe",
        vocab_size=64,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        dtype="float32",
        tie_word_embeddings=True,
        eos_token_id=1,
        num_experts=num_experts,
        num_experts_per_tok=2,
        moe_intermediate_size=48,
        norm_topk_prob=True,
        shared_expert_intermediate_size=32 if shared else 0,
    )


def _engine(cfg, tp=1, ep=1, dp=1):
    params = qwen2.init_params(cfg, jax.random.PRNGKey(11))
    return LLMEngine(
        EngineConfig(
            model=cfg,
            cache=CacheConfig(page_size=16, num_pages=64),
            scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=128),
            parallel=ParallelConfig(
                tensor_parallel_size=tp,
                data_parallel_size=dp,
                expert_parallel_size=ep,
            ),
        ),
        params=params,
        decode_horizon=5,
    )


PROMPTS = [[2, 3, 4], [9, 8, 7, 6, 5]]


@pytest.mark.parametrize(
    "tp,ep,shared", [(2, 2, False), (1, 4, False), (2, 2, True)]
)
def test_ep_matches_single_device(tp, ep, shared):
    assert len(jax.devices()) >= tp * ep
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    cfg = _moe_cfg(shared=shared)
    ref = _engine(_moe_cfg(shared=shared)).generate(PROMPTS, sp)
    got = _engine(cfg, tp=tp, ep=ep).generate(PROMPTS, sp)
    for r, g in zip(ref, got):
        assert r.outputs[0].token_ids == g.outputs[0].token_ids


def test_ep_mesh_shape_and_validation():
    mesh = make_mesh(MeshConfig(2, 1, 1, 2))
    assert mesh.shape == {"dp": 1, "pp": 1, "ep": 2, "tp": 2}
    # 30B-A3B-like divisibility: 128 experts over ep4 x tp2
    cfg = _moe_cfg(num_experts=128)
    validate_tp(cfg, tp=2, ep=4)
    with pytest.raises(ValueError):
        validate_tp(_moe_cfg(num_experts=6), tp=2, ep=2)
    dense = ModelArchConfig(
        model_type="qwen2", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, dtype="float32",
    )
    with pytest.raises(ValueError):
        validate_tp(dense, tp=1, ep=2)
