"""FSDP / HSDP-equivalent weight sharding (reference distributed/hsdp.py:30):
params shard over the dp axis and are all-gathered just-in-time inside the
layer scan.  Greedy generation must match the replicated-weights engine
exactly, and each device must hold only 1/dp of every stacked weight."""

import jax
import numpy as np
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


def _engine(dp=1, tp=1, weight_sharding="replicated"):
    cfg = _cfg()
    params = qwen2.init_params(cfg, jax.random.PRNGKey(11))
    return LLMEngine(
        EngineConfig(
            model=cfg,
            cache=CacheConfig(page_size=16, num_pages=8),
            scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=128),
            parallel=ParallelConfig(
                data_parallel_size=dp,
                tensor_parallel_size=tp,
                weight_sharding=weight_sharding,
            ),
        ),
        params=params,
        decode_horizon=5,
    )


def test_fsdp_matches_replicated():
    assert len(jax.devices()) >= 4
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    prompts = [[2, 3, 4], [9, 8, 7, 6, 5], [5, 4, 3], [7, 7, 8, 9]]
    ref = _engine(dp=1).generate(prompts, sp)
    eng = _engine(dp=2, tp=2, weight_sharding="fsdp")
    got = eng.generate(prompts, sp)
    for r, g in zip(ref, got):
        assert r.outputs[0].token_ids == g.outputs[0].token_ids

    # each device holds a (dp x tp)-sharded slice of wq: [L, H/dp, F/tp]
    wq = eng.runner.params["wq"]
    l, h, f = wq.shape
    shard_shape = wq.sharding.shard_shape(wq.shape)
    assert shard_shape == (l, h // 2, f // 2)


@pytest.mark.parametrize("quant", ["int8", "fp8"])
def test_fsdp_composes_with_int8_fp8(quant):
    """int8/fp8 weight-only quantization under fsdp: the [L, K, N]
    quantized leaves shard over dp and gather just-in-time like their
    bf16 twins (per-channel scales stay whole) — greedy output must
    match the replicated quantized engine exactly."""
    import dataclasses

    cfg = dataclasses.replace(_cfg(), quantization=quant)
    params = qwen2.init_params(cfg, jax.random.PRNGKey(11))

    def mk(sharding):
        return LLMEngine(
            EngineConfig(
                model=cfg,
                cache=CacheConfig(page_size=16, num_pages=16),
                scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=64),
                parallel=ParallelConfig(
                    data_parallel_size=2, weight_sharding=sharding
                ),
            ),
            params=dict(params),
            decode_horizon=4,
        )

    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    prompts = [[2, 3, 4], [9, 8, 7]]
    ref = mk("replicated").generate(prompts, sp)
    eng = mk("fsdp")
    got = eng.generate(prompts, sp)
    for r, g in zip(ref, got):
        assert r.outputs[0].token_ids == g.outputs[0].token_ids
    # the quantized leaf really is dp-sharded
    suffix = ":q8" if quant == "int8" else ":f8"
    wq = eng.runner.params["wq" + suffix]
    assert wq.sharding.shard_shape(wq.shape)[1] == wq.shape[1] // 2


def test_fsdp_rejects_packed_int4():
    import dataclasses

    cfg = dataclasses.replace(_cfg(), quantization="int4")
    with pytest.raises(NotImplementedError):
        LLMEngine(
            EngineConfig(
                model=cfg,
                cache=CacheConfig(page_size=16, num_pages=16),
                scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=64),
                parallel=ParallelConfig(
                    data_parallel_size=2, weight_sharding="fsdp"
                ),
            ),
            params=qwen2.init_params(cfg, jax.random.PRNGKey(0)),
        )
