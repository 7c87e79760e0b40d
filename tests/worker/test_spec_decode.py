"""Speculative decoding (Medusa-style draft heads + in-kernel
multi-query verification): greedy output must EXACTLY equal normal
decode, regardless of draft quality — acceptance only changes how many
target forwards run, never what they compute."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def _engine(params, spec_draft=0, horizon=6):
    return LLMEngine(
        EngineConfig(
            model=_cfg(),
            cache=CacheConfig(page_size=16, num_pages=64),
            scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=128),
            spec_num_draft=spec_draft,
        ),
        params=dict(params),
        decode_horizon=horizon,
    )


PROMPTS = [[2, 3, 4], [9, 8, 7, 6, 5], [11, 30]]


@pytest.mark.parametrize("head_mode", ["random", "repetition"])
def test_spec_greedy_equals_normal(head_mode):
    params = qwen2.init_params(_cfg(), jax.random.PRNGKey(5))
    sp = SamplingParams(temperature=0.0, max_tokens=21, ignore_eos=True)
    want = [
        o.outputs[0].token_ids
        for o in _engine(params).generate(PROMPTS, sp)
    ]

    spec_params = dict(params)
    if head_mode == "repetition":
        # heads = lm_head: proposals repeat the current token, which a
        # tiny random model's greedy loops accept often — exercises the
        # multi-token acceptance path for real
        lm = params["embed"].T  # tied embeddings
        spec_params["spec_heads"] = jnp.stack([lm, lm, lm])
    eng = _engine(spec_params, spec_draft=3)
    got = [
        o.outputs[0].token_ids for o in eng.generate(PROMPTS, sp)
    ]
    assert got == want


def test_spec_respects_stop_tokens():
    params = qwen2.init_params(_cfg(), jax.random.PRNGKey(6))
    sp = SamplingParams(temperature=0.0, max_tokens=40)
    want = [
        o.outputs[0].token_ids
        for o in _engine(params).generate(PROMPTS, sp)
    ]
    got = [
        o.outputs[0].token_ids
        for o in _engine(params, spec_draft=2).generate(PROMPTS, sp)
    ]
    assert got == want


def test_spec_falls_back_when_sampling():
    """Mixed batch with temperature > 0 uses the normal chunk (seeded
    sampling must be reproducible vs the plain engine)."""
    params = qwen2.init_params(_cfg(), jax.random.PRNGKey(7))
    sp = SamplingParams(temperature=0.8, max_tokens=10, seed=3,
                        ignore_eos=True)
    want = _engine(params).generate([PROMPTS[0]], sp)[0].outputs[0].token_ids
    got = _engine(params, spec_draft=3).generate(
        [PROMPTS[0]], sp
    )[0].outputs[0].token_ids
    assert got == want


def _engine_method(params, method, spec_draft=3, horizon=6):
    return LLMEngine(
        EngineConfig(
            model=_cfg(),
            cache=CacheConfig(page_size=16, num_pages=64),
            scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=128),
            spec_num_draft=spec_draft,
            spec_method=method,
        ),
        params=dict(params),
        decode_horizon=horizon,
    )


def test_ngram_spec_greedy_equals_normal():
    """Prompt-lookup (ngram) proposals never change greedy output —
    emitted tokens are target argmaxes regardless of proposal quality."""
    params = qwen2.init_params(_cfg(), jax.random.PRNGKey(5))
    sp = SamplingParams(temperature=0.0, max_tokens=23, ignore_eos=True)
    want = [
        o.outputs[0].token_ids
        for o in _engine(params).generate(PROMPTS, sp)
    ]
    got = [
        o.outputs[0].token_ids
        for o in _engine_method(params, "ngram").generate(PROMPTS, sp)
    ]
    assert got == want


def test_ngram_spec_across_requests_and_lengths():
    """Slot reuse across requests must not leak one sequence's history
    ring into the next (priming resets per request)."""
    params = qwen2.init_params(_cfg(), jax.random.PRNGKey(7))
    sp = SamplingParams(temperature=0.0, max_tokens=17, ignore_eos=True)
    eng = _engine_method(params, "ngram")
    first = [
        o.outputs[0].token_ids for o in eng.generate(PROMPTS, sp)
    ]
    # different prompts through the SAME engine (slots reused)
    prompts2 = [[7, 7, 7, 7], [1, 2], [40, 41, 42, 43, 44, 45]]
    got2 = [
        o.outputs[0].token_ids for o in eng.generate(prompts2, sp)
    ]
    want2 = [
        o.outputs[0].token_ids
        for o in _engine(params).generate(prompts2, sp)
    ]
    assert got2 == want2
    # and rerunning the first batch still matches
    again = [
        o.outputs[0].token_ids for o in eng.generate(PROMPTS, sp)
    ]
    assert again == first


def test_ngram_history_ring_bookkeeping():
    """The ngram history ring primes with the prompt and appends every
    emitted token (absolute count keeps growing past the ring size)."""
    import numpy as np

    params = qwen2.init_params(_cfg(), jax.random.PRNGKey(5))
    sp = SamplingParams(temperature=0.0, max_tokens=40, ignore_eos=True)
    eng = _engine_method(params, "ngram", horizon=8)
    out = eng.generate([[2, 3, 4]], sp)[0]
    toks = out.outputs[0].token_ids
    assert len(toks) == 40
    hist_len = int(np.asarray(eng.runner.spec_hist_len)[0])
    assert hist_len == 3 + 40, hist_len
    hist = np.asarray(eng.runner.spec_history)[0]
    # the ring holds the emitted stream: token i sits at slot i % HLEN
    for i, t in enumerate([2, 3, 4] + toks):
        assert hist[i % eng.runner.SPEC_HIST_LEN] == t, i
