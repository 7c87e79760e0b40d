"""Engine-level parity of the fused decode-stack path (HT_FUSED_STACK=1
forces the ops/fused_stack kernel in interpret mode) against the default
scanned decode_direct path.

Token-for-token equality is NOT asserted beyond the first decode step:
the two paths round the residual stream through differently-ordered
flash accumulations (ops/fused_stack.py module note), and at toy scale
(64-vocab random weights) a ~1e-3 logit jitter can flip a greedy
argmax.  What is deterministic: the first decode step consumes
identical inputs, so its hidden state and sampled token must agree."""

import numpy as np

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


def _mk_engine(params):
    cfg = ModelArchConfig(
        model_type="qwen2",
        vocab_size=64,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        dtype="bfloat16",
        attention_bias=True,
        tie_word_embeddings=True,
        eos_token_id=-1,
    )
    return LLMEngine(
        EngineConfig(
            model=cfg,
            cache=CacheConfig(page_size=16, num_pages=64),
            scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=128),
        ),
        params=dict(params),
    )


def _generate(engine):
    sp = SamplingParams(
        temperature=0.0, max_tokens=8, ignore_eos=True,
        return_hidden_states=True,
    )
    outs = engine.generate(
        [[2, 5, 9], list(range(3, 30)), [11, 4]], sp
    )
    return [
        (o.outputs[0].token_ids, np.asarray(o.outputs[0].hidden_states))
        for o in outs
    ]


def test_fused_engine_matches_direct(monkeypatch):
    cfg = ModelArchConfig(
        model_type="qwen2", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        dtype="bfloat16", attention_bias=True,
        tie_word_embeddings=True,
    )
    params = qwen2.init_params(cfg, jax.random.PRNGKey(7))

    monkeypatch.setenv("HT_FUSED_STACK", "0")
    ref = _generate(_mk_engine(params))

    monkeypatch.setenv("HT_FUSED_STACK", "1")
    eng = _mk_engine(params)
    assert eng.runner.fused_kw is not None, "fused path not built"
    got = _generate(eng)

    for (rt, rh), (gt, gh) in zip(ref, got):
        # identical inputs -> first decode step must agree
        assert gt[0] == rt[0]
        assert len(gt) == len(rt)
        np.testing.assert_allclose(
            gh[0], rh[0], atol=5e-2, rtol=5e-2
        )


def test_fused_stack_gate_respects_env(monkeypatch):
    cfg = ModelArchConfig(
        model_type="qwen2", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        dtype="bfloat16", attention_bias=True,
        tie_word_embeddings=True,
    )
    params = qwen2.init_params(cfg, jax.random.PRNGKey(7))
    # opt-in only: off unless HT_FUSED_STACK=1 (measured slower than
    # the scanned decode path — ops/fused_stack.py module note)
    monkeypatch.delenv("HT_FUSED_STACK", raising=False)
    assert _mk_engine(params).runner.fused_kw is None
