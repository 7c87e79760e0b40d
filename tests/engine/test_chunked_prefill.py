"""Chunked prefill through the engine: long prompts split into chunks
produce the exact same greedy tokens as unchunked prefill."""

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


def _engine(params, chunk=None):
    cfg = ModelArchConfig(
        model_type="qwen2", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, dtype="float32", tie_word_embeddings=True,
        eos_token_id=1,
    )
    return LLMEngine(
        EngineConfig(
            model=cfg,
            cache=CacheConfig(page_size=16, num_pages=64),
            scheduler=SchedulerConfig(
                max_num_seqs=4, max_model_len=256,
                prefill_chunk_size=chunk,
            ),
        ),
        params=params,
        decode_horizon=4,
    )


def _params():
    cfg = ModelArchConfig(
        model_type="qwen2", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, dtype="float32", tie_word_embeddings=True,
        eos_token_id=1,
    )
    return qwen2.init_params(cfg, jax.random.PRNGKey(17))


def test_chunked_prefill_matches_whole():
    params = _params()
    prompt = list(range(2, 60))  # 58 tokens
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    want = _engine(params).generate([prompt], sp)[0].outputs[0].token_ids
    # chunk size 16 -> 4 chunks (16,16,16,10)
    got = _engine(params, chunk=16).generate([prompt], sp)[0]
    assert got.outputs[0].token_ids == want


def test_chunked_prefill_with_hidden_states():
    params = _params()
    prompt = list(range(2, 40))
    sp = SamplingParams(
        temperature=0.0, max_tokens=6, ignore_eos=True,
        return_hidden_states=True,
    )
    whole = _engine(params).generate([prompt], sp)[0]
    chunked = _engine(params, chunk=16).generate([prompt], sp)[0]
    assert chunked.outputs[0].token_ids == whole.outputs[0].token_ids
    import numpy as np

    np.testing.assert_allclose(
        chunked.outputs[0].hidden_states, whole.outputs[0].hidden_states,
        atol=2e-5, rtol=2e-5,
    )


def test_mixed_chunked_and_decode_batch():
    """A long chunked prompt admitted while another request decodes."""
    params = _params()
    e = _engine(params, chunk=16)
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    short = e.add_request([5, 6, 7], sp)
    long_p = list(range(2, 50))
    long_r = e.add_request(long_p, SamplingParams(
        temperature=0.0, max_tokens=12, ignore_eos=True))
    results = {}
    while e.has_unfinished_requests():
        for out in e.step():
            if out.finished:
                results[out.request_id] = out.outputs[0].token_ids
    ref = _engine(params).generate(
        [[5, 6, 7], long_p],
        SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True),
    )
    assert results[short] == ref[0].outputs[0].token_ids
    assert results[long_r] == ref[1].outputs[0].token_ids


def test_logprobs_returned_and_consistent():
    """SamplingParams.logprobs (previously declared but unwired): every
    generated token gets a logprob; greedy tokens must be the argmax of
    their own top-alternatives list, and chunk logprobs must be valid
    log-probabilities."""
    import math

    import jax

    from ht_vllm_omni_tpu.models import qwen2

    eng = _engine(_params())
    sp = SamplingParams(
        temperature=0.0, max_tokens=10, ignore_eos=True, logprobs=3
    )
    out = eng.generate([[3, 5, 7]], sp)[0].outputs[0]
    lps = out.logprobs
    assert lps is not None and len(lps) == len(out.token_ids)
    for tok, entry in zip(out.token_ids, lps):
        assert entry["token_id"] == tok
        assert entry["logprob"] is not None
        assert entry["logprob"] <= 1e-5  # log prob <= 0
        assert math.isfinite(entry["logprob"])
        assert len(entry["top_token_ids"]) == 3
        # greedy: the sampled token IS the top-1 alternative
        assert entry["top_token_ids"][0] == tok
        assert abs(entry["top_logprobs"][0] - entry["logprob"]) < 1e-4
