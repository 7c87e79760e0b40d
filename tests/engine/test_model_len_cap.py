"""Decode-horizon look-ahead at the max_model_len boundary.

Regression: the horizon page look-ahead (`step_plan` target
``num_computed + horizon``) allocated pages PAST the model-len cap, so
a request decoding up to max_model_len grew more pages than the
runner's fixed-width block table (cdiv(max_model_len, page_size)) and
crashed host-side in ``sync_tables`` ("could not broadcast ... (33,)
into shape (32,)").  Hit in production by any long TTS/chat generation
that runs to the cap — found driving /v1/audio/speech end-to-end.
"""

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

CFG = ModelArchConfig(
    model_type="qwen2", vocab_size=64, hidden_size=32,
    intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
    num_key_value_heads=2, dtype="float32", tie_word_embeddings=True,
    eos_token_id=1,
)


def _engine(max_model_len=64, horizon=48, max_num_seqs=2):
    return LLMEngine(
        EngineConfig(
            model=CFG,
            cache=CacheConfig(page_size=16, num_pages=64),
            scheduler=SchedulerConfig(
                max_num_seqs=max_num_seqs, max_model_len=max_model_len
            ),
        ),
        params=qwen2.init_params(CFG, jax.random.PRNGKey(3)),
        decode_horizon=horizon,
    )


def test_decode_to_cap_with_large_horizon():
    eng = _engine()
    sp = SamplingParams(temperature=0.0, max_tokens=1000, ignore_eos=True)
    outs = eng.generate([[2, 3, 4, 5, 6, 7, 8, 9]], sp)
    toks = outs[0].outputs[0].token_ids
    # prompt 8 + 56 generated == max_model_len, and no page-table overrun
    assert len(toks) == 64 - 8
    sched = eng.scheduler
    assert not sched.has_unfinished()


def test_cap_pages_never_exceed_table_width():
    eng = _engine(max_model_len=48, horizon=64)
    sp = SamplingParams(temperature=0.0, max_tokens=999, ignore_eos=True)
    rid = eng.add_request([1, 2, 3], sp)
    max_pages = -(-48 // 16)
    while eng.has_unfinished_requests():
        eng.step()
        req = eng.scheduler.requests.get(rid)
        if req is not None:
            assert len(req.page_ids) <= max_pages, len(req.page_ids)


def test_two_requests_to_cap_interleaved():
    eng = _engine(max_model_len=64, horizon=32)
    sp = SamplingParams(temperature=0.0, max_tokens=500, ignore_eos=True)
    outs = eng.generate([[2, 3], [4, 5, 6]], sp)
    assert len(outs[0].outputs[0].token_ids) == 62
    assert len(outs[1].outputs[0].token_ids) == 61
