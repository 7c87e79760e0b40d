"""Golden test: the GLM-4 trunk extensions (sandwich post-norms,
partial interleaved rotary, fused gate_up) match HF transformers on
identical random weights — logits and greedy generation.  The GLM-Image
AR stage runs on this trunk (reference vllm_omni/model_executor/models/
glm_image/glm_image_ar.py:1873 GlmImageTextDecoderLayer)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ht_vllm_omni_tpu.config import (
    CacheConfig,
    EngineConfig,
    SchedulerConfig,
)
from ht_vllm_omni_tpu.engine.llm_engine import LLMEngine
from ht_vllm_omni_tpu.models import qwen2
from ht_vllm_omni_tpu.models.loader import config_from_hf, load_hf_params
from ht_vllm_omni_tpu.sampling_params import SamplingParams

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _save_tiny_glm(tmp_path):
    cfg = transformers.Glm4Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        partial_rotary_factor=0.5,
        max_position_embeddings=512,
        tie_word_embeddings=False,
        eos_token_id=1,
        bos_token_id=0,
        pad_token_id=0,
    )
    model = transformers.Glm4ForCausalLM(cfg)
    model = model.eval().to(torch.float32)
    model.save_pretrained(tmp_path, safe_serialization=True)
    return model


def test_glm4_prefill_logits_match_hf(tmp_path):
    torch.manual_seed(0)
    hf = _save_tiny_glm(tmp_path)
    cfg = config_from_hf(str(tmp_path))
    assert cfg.use_post_norms and cfg.rope_interleaved
    assert cfg.rotary_dim == 8
    cfg.dtype = "float32"
    params = load_hf_params(cfg, str(tmp_path))
    assert "post_ln1" in params and "post_ln2" in params

    prompt = [3, 17, 42, 99, 7]
    with torch.no_grad():
        hf_logits = hf(torch.tensor([prompt])).logits[0].numpy()

    s = 8
    ids = jnp.asarray(prompt + [0] * (s - len(prompt)), jnp.int32)
    positions = jnp.arange(s, dtype=jnp.int32)
    x = qwen2.embed_tokens(params, ids)
    hidden, _ = qwen2.prefill(
        cfg, params, x, positions, jnp.int32(len(prompt))
    )
    logits = qwen2.compute_logits(cfg, params, hidden)
    np.testing.assert_allclose(
        np.asarray(logits)[: len(prompt)], hf_logits, atol=2e-4, rtol=2e-3
    )


def test_glm4_greedy_generation_matches_hf(tmp_path):
    torch.manual_seed(1)
    hf = _save_tiny_glm(tmp_path)
    cfg = config_from_hf(str(tmp_path))
    cfg.dtype = "float32"

    engine = LLMEngine(
        EngineConfig(
            model=cfg,
            cache=CacheConfig(page_size=16, num_pages=32),
            scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=256),
            model_path=str(tmp_path),
        )
    )
    prompts = [[3, 17, 42], [5, 5, 9, 11, 23, 40]]
    n_new = 12
    hf_out = []
    for p in prompts:
        with torch.no_grad():
            g = hf.generate(
                torch.tensor([p]),
                max_new_tokens=n_new,
                do_sample=False,
                eos_token_id=None,
            )
        hf_out.append(g[0][len(p):].tolist())
    outs = engine.generate(
        prompts,
        SamplingParams(temperature=0.0, max_tokens=n_new, ignore_eos=True),
    )
    for got, want in zip(outs, hf_out):
        assert got.outputs[0].token_ids == want
