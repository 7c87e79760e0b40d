"""End-to-end guided decoding through the engine: regex- and JSON-
constrained generation with a byte-level toy tokenizer."""

import json

import jax
import numpy as np

from ht_vllm_omni_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelArchConfig,
    SchedulerConfig,
)
from ht_vllm_omni_tpu.engine.llm_engine import LLMEngine
from ht_vllm_omni_tpu.models import qwen2
from ht_vllm_omni_tpu.sampling_params import SamplingParams


class ByteTokenizer:
    """token id = byte value (0-255); 256 = eos."""

    def encode(self, text):
        return list(text.encode("latin-1"))

    def decode(self, ids):
        return bytes(i for i in ids if 0 <= i < 256).decode(
            "latin-1", errors="ignore"
        )


def _engine(seed=0):
    cfg = ModelArchConfig(
        model_type="qwen2", vocab_size=257, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        dtype="float32", tie_word_embeddings=True,
        eos_token_id=256,
    )
    params = qwen2.init_params(cfg, jax.random.PRNGKey(seed))
    return LLMEngine(
        EngineConfig(
            model=cfg,
            cache=CacheConfig(page_size=16, num_pages=64),
            scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=128),
        ),
        params=params,
        tokenizer=ByteTokenizer(),
        decode_horizon=8,
    )


def test_guided_regex_engine():
    eng = _engine()
    sp = SamplingParams(
        temperature=0.8, seed=7, max_tokens=24,
        guided_regex=r"(yes|no|maybe)",
    )
    outs = eng.generate([[10, 20, 30]], sp)
    text = ByteTokenizer().decode(outs[0].outputs[0].token_ids)
    assert text in ("yes", "no", "maybe"), repr(text)


def test_guided_json_schema_engine():
    eng = _engine(seed=3)
    schema = {
        "type": "object",
        "properties": {
            "ok": {"type": "boolean"},
            "n": {"type": "integer"},
        },
        "required": ["ok", "n"],
    }
    sp = SamplingParams(
        temperature=0.9, seed=11, max_tokens=96,
        guided_json=schema,
    )
    outs = eng.generate([[5, 6]], sp)
    text = ByteTokenizer().decode(outs[0].outputs[0].token_ids)
    obj = json.loads(text)
    assert isinstance(obj["ok"], bool) and isinstance(obj["n"], int)


def test_guided_two_requests_batched():
    eng = _engine(seed=5)
    sp1 = SamplingParams(
        temperature=1.0, seed=1, max_tokens=16,
        guided_regex=r"[ab]{3}",
    )
    sp2 = SamplingParams(
        temperature=1.0, seed=2, max_tokens=16,
        guided_regex=r"\d\d",
    )
    ids = [
        eng.add_request([1, 2, 3], sp1),
        eng.add_request([4, 5], sp2),
    ]
    done = {}
    for _ in range(200):
        for out in eng.step():
            if out.finished:
                done[out.request_id] = ByteTokenizer().decode(
                    out.outputs[0].token_ids
                )
        if len(done) == 2:
            break
    assert len(done) == 2
    t1, t2 = done[ids[0]], done[ids[1]]
    assert len(t1) == 3 and set(t1) <= {"a", "b"}, repr(t1)
    assert len(t2) == 2 and t2.isdigit(), repr(t2)
