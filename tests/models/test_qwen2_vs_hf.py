"""Golden test: our jax Qwen2/Qwen3 matches HF transformers (torch CPU)
on identical random weights — logits and greedy generation."""

import numpy as np
import pytest

import jax
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


def _save_tiny_hf(tmp_path, model_type="qwen2"):
    if model_type == "qwen2":
        cfg = transformers.Qwen2Config(
            vocab_size=128,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=3,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=512,
            rope_theta=10000.0,
            tie_word_embeddings=False,
            eos_token_id=1,
            bos_token_id=0,
        )
        model = transformers.Qwen2ForCausalLM(cfg)
    else:
        cfg = transformers.Qwen3Config(
            vocab_size=128,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=3,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=16,
            max_position_embeddings=512,
            rope_theta=10000.0,
            tie_word_embeddings=False,
            eos_token_id=1,
            bos_token_id=0,
        )
        model = transformers.Qwen3ForCausalLM(cfg)
    model = model.eval().to(torch.float32)
    model.save_pretrained(tmp_path, safe_serialization=True)
    return model


@pytest.mark.parametrize("model_type", ["qwen2", "qwen3"])
def test_prefill_logits_match_hf(tmp_path, model_type):
    torch.manual_seed(0)
    hf = _save_tiny_hf(tmp_path, model_type)
    cfg = config_from_hf(str(tmp_path))
    cfg.dtype = "float32"
    params = load_hf_params(cfg, str(tmp_path))

    prompt = [3, 17, 42, 99, 7]
    with torch.no_grad():
        hf_logits = hf(torch.tensor([prompt])).logits[0].numpy()

    s = 8  # pad
    num_pages, page_size = 8, 16
    kv_shape = (
        cfg.num_hidden_layers, num_pages * page_size,
        2 * cfg.num_key_value_heads * cfg.head_dim,
    )
    kv_cache = jnp.zeros(kv_shape, jnp.float32)
    ids = jnp.asarray(prompt + [0] * (s - len(prompt)), jnp.int32)
    positions = jnp.arange(s, dtype=jnp.int32)
    slot_map = jnp.asarray(
        [i for i in range(len(prompt))] + [-1] * (s - len(prompt)), jnp.int32
    )
    x = qwen2.embed_tokens(params, ids)
    hidden, kv_rows = qwen2.prefill(
        cfg, params, x, positions, jnp.int32(len(prompt))
    )
    logits = qwen2.compute_logits(cfg, params, hidden)
    np.testing.assert_allclose(
        np.asarray(logits)[: len(prompt)], hf_logits, atol=2e-4, rtol=2e-3
    )

    # flushing the collected rows lands K/V at the mapped slots
    from ht_vllm_omni_tpu.ops.kv_cache_update import flush_kv_rows_donated

    kv_cache = flush_kv_rows_donated(kv_cache, kv_rows, slot_map)
    c = np.asarray(kv_cache)
    assert (c[:, : len(prompt)] != 0).any()
    assert (c[:, len(prompt):] == 0).all()


@pytest.mark.parametrize("model_type", ["qwen2", "qwen3"])
def test_greedy_generation_matches_hf(tmp_path, model_type):
    torch.manual_seed(1)
    hf = _save_tiny_hf(tmp_path, model_type)
    cfg = config_from_hf(str(tmp_path))
    cfg.dtype = "float32"

    engine = LLMEngine(
        EngineConfig(
            model=cfg,
            cache=CacheConfig(page_size=16, num_pages=32),
            scheduler=SchedulerConfig(
                max_num_seqs=4, max_model_len=256
            ),
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


def test_generation_spanning_many_chunks():
    """max_tokens far beyond decode_horizon: the request must keep
    decoding across chunks (regression: prefill never credited
    num_computed_tokens, stalling every request at chunk 2)."""
    from ht_vllm_omni_tpu.config import ModelArchConfig

    cfg = ModelArchConfig(
        model_type="qwen2", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, dtype="float32", tie_word_embeddings=True,
        eos_token_id=1,
    )
    params = qwen2.init_params(cfg, jax.random.PRNGKey(7))
    engine = LLMEngine(
        EngineConfig(
            model=cfg,
            cache=CacheConfig(page_size=16, num_pages=64),
            scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=256),
        ),
        params=params,
        decode_horizon=4,
    )
    sp = SamplingParams(temperature=0.0, max_tokens=30, ignore_eos=True)
    outs = engine.generate([[2, 3, 4], [9, 8]], sp)
    for o in outs:
        assert len(o.outputs[0].token_ids) == 30


def test_batched_mixed_generation():
    """Greedy results are independent of batch composition."""
    cfg_kwargs = dict(
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
    from ht_vllm_omni_tpu.config import ModelArchConfig

    def mk_engine():
        cfg = ModelArchConfig(**cfg_kwargs)
        params = qwen2.init_params(cfg, jax.random.PRNGKey(7))
        return LLMEngine(
            EngineConfig(
                model=cfg,
                cache=CacheConfig(page_size=16, num_pages=64),
                scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=128),
            ),
            params=params,
        )

    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    prompts = [[2, 3, 4], [9, 8, 7, 6], [11], [30, 31]]
    batched = mk_engine().generate(prompts, sp)
    single_engine = mk_engine()
    for p, b in zip(prompts, batched):
        solo = single_engine.generate([p], sp)[0]
        assert solo.outputs[0].token_ids == b.outputs[0].token_ids


def test_qwen3_moe_matches_hf(tmp_path):
    """Golden test for the MoE path vs HF Qwen3MoeForCausalLM."""
    torch.manual_seed(3)
    cfg_hf = transformers.Qwen3MoeConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        moe_intermediate_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        num_experts=4,
        num_experts_per_tok=2,
        decoder_sparse_step=1,
        norm_topk_prob=True,
        max_position_embeddings=512,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        eos_token_id=1,
        mlp_only_layers=[],
    )
    hf = transformers.Qwen3MoeForCausalLM(cfg_hf).eval().to(torch.float32)
    hf.save_pretrained(tmp_path, safe_serialization=True)
    cfg = config_from_hf(str(tmp_path))
    cfg.dtype = "float32"
    assert cfg.num_experts == 4 and cfg.num_experts_per_tok == 2
    params = load_hf_params(cfg, str(tmp_path))

    prompt = [3, 17, 42, 99, 7]
    with torch.no_grad():
        hf_logits = hf(torch.tensor([prompt])).logits[0].numpy()
    s = 8
    ids = jnp.asarray(prompt + [0] * (s - len(prompt)), jnp.int32)
    pos = jnp.arange(s, dtype=jnp.int32)
    hidden, _ = qwen2.prefill(
        cfg, params, qwen2.embed_tokens(params, ids), pos,
        jnp.int32(len(prompt)),
    )
    logits = qwen2.compute_logits(cfg, params, hidden)
    np.testing.assert_allclose(
        np.asarray(logits)[: len(prompt)], hf_logits, atol=5e-4, rtol=5e-3
    )

    engine = LLMEngine(
        EngineConfig(
            model=cfg,
            cache=CacheConfig(page_size=16, num_pages=32),
            scheduler=SchedulerConfig(max_num_seqs=2, max_model_len=128),
            model_path=str(tmp_path),
        ),
        decode_horizon=4,
    )
    with torch.no_grad():
        want = hf.generate(
            torch.tensor([prompt]), max_new_tokens=10, do_sample=False,
            eos_token_id=None,
        )[0][len(prompt):].tolist()
    got = engine.generate(
        [prompt],
        SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True),
    )[0]
    assert got.outputs[0].token_ids == want

