"""Weight-only quantized engine runs end-to-end and stays close to fp."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelArchConfig,
    SchedulerConfig,
)
from ht_vllm_omni_tpu.engine.llm_engine import LLMEngine
from ht_vllm_omni_tpu.models import qwen2
from ht_vllm_omni_tpu.quantization import quantize_params
from ht_vllm_omni_tpu.sampling_params import SamplingParams


def _cfg(quant=None):
    return ModelArchConfig(
        model_type="qwen2",
        vocab_size=128,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=32,
        dtype="float32",
        tie_word_embeddings=True,
        eos_token_id=1,
        quantization=quant,
        # this file pins TRUNK quantization numerics (exactness on
        # representable weights); the head path has its own coverage
        quantize_lm_head=False,
    )


def _engine(quant, params):
    cfg = _cfg(quant)
    return LLMEngine(
        EngineConfig(
            model=cfg,
            cache=CacheConfig(page_size=16, num_pages=64),
            scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=128),
        ),
        params=(
            quantize_params(params, quant) if quant else dict(params)
        ),
        decode_horizon=6,
    )


@pytest.mark.parametrize("method", ["int8", "int4"])
def test_quantized_generation_runs_and_tracks_fp(method):
    params = qwen2.init_params(_cfg(), jax.random.PRNGKey(5))
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    prompts = [[3, 17, 42, 9]]
    fp = _engine(None, params).generate(prompts, sp)[0]
    q = _engine(method, params).generate(prompts, sp)[0]
    assert len(q.outputs[0].token_ids) == 10
    assert len(fp.outputs[0].token_ids) == 10

    # logits comparison (greedy argmax on an untrained model is chaotic):
    # prefill hidden under quantized weights stays close to fp
    cfg = _cfg()
    qparams = quantize_params(params, method)
    ids = jnp.asarray(prompts[0] + [0] * 12, jnp.int32)
    pos = jnp.arange(16, dtype=jnp.int32)
    h_fp, _ = qwen2.prefill(cfg, params, qwen2.embed_tokens(params, ids),
                            pos, jnp.int32(4))
    h_q, _ = qwen2.prefill(cfg, qparams, qwen2.embed_tokens(params, ids),
                           pos, jnp.int32(4))
    l_fp = np.asarray(qwen2.compute_logits(cfg, params, h_fp))[:4]
    l_q = np.asarray(qwen2.compute_logits(cfg, qparams, h_q))[:4]
    rel = np.linalg.norm(l_q - l_fp) / np.linalg.norm(l_fp)
    assert rel < (0.02 if method == "int8" else 0.4), rel


def test_quantize_params_structure():
    params = qwen2.init_params(_cfg(), jax.random.PRNGKey(5))
    q = quantize_params(params, "int8")
    assert "wq" not in q and "wq:q8" in q and "wq:s8" in q
    assert q["wq:q8"].dtype == jnp.int8
    assert q["wq:q8"].shape == params["wq"].shape
    assert q["wq:s8"].shape == (2, params["wq"].shape[-1])
    # non-target leaves untouched
    np.testing.assert_array_equal(q["embed"], params["embed"])

    q4 = quantize_params(params, "int4")
    assert q4["gate:q4"].dtype == jnp.uint8
    assert q4["gate:q4"].shape[1] == params["gate"].shape[1] // 2


@pytest.mark.parametrize("method", ["fp8", "awq"])
def test_fp8_awq_generation_runs_and_tracks_fp(method):
    params = qwen2.init_params(_cfg(), jax.random.PRNGKey(5))
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    prompts = [[3, 17, 42, 9]]
    fp = _engine(None, params).generate(prompts, sp)[0]
    q = _engine(method, params).generate(prompts, sp)[0]
    assert len(q.outputs[0].token_ids) == 10
    # greedy streams agree at the start (quant noise may diverge later)
    # greedy prefix agrees before quant noise diverges the argmax of a
    # random tiny model's closely-spaced logits
    agree = 0
    for a, b in zip(fp.outputs[0].token_ids, q.outputs[0].token_ids):
        if a != b:
            break
        agree += 1
    # 4-bit diverges earlier than fp8; exactness is covered by
    # test_awq_exact_on_representable_weights
    want = {"fp8": 3, "awq": 2}[method]
    assert agree >= want, (
        fp.outputs[0].token_ids, q.outputs[0].token_ids,
    )


def test_awq_exact_on_representable_weights():
    """Weights already on the AWQ (q - z) * s grid quantize losslessly:
    the quantized engine must reproduce the fp engine token-for-token."""
    from ht_vllm_omni_tpu.ops.quant_matmul import quantize_awq_int4

    params = qwen2.init_params(_cfg(), jax.random.PRNGKey(9))
    snapped = dict(params)
    for name in ("wq", "wk", "wv", "wo", "gate", "up", "down"):
        w = params[name]
        packed, s, z = jax.vmap(
            lambda m: quantize_awq_int4(m, 128)
        )(w)
        lo = (packed & 0xF).astype(jnp.int32)
        hi = (packed >> 4).astype(jnp.int32)
        l_, k2, n_ = packed.shape
        q = jnp.stack([lo, hi], axis=2).reshape(l_, 2 * k2, n_)
        g = 2 * k2 // 128
        deq = (
            (q.reshape(l_, g, 128, n_).astype(jnp.float32)
             - z[:, :, None, :]) * s[:, :, None, :]
        ).reshape(l_, 2 * k2, n_)
        snapped[name] = deq.astype(w.dtype)
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    prompts = [[3, 17, 42, 9]]
    fp = _engine(None, snapped).generate(prompts, sp)[0]
    q = _engine("awq", snapped).generate(prompts, sp)[0]
    assert fp.outputs[0].token_ids == q.outputs[0].token_ids
