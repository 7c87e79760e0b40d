"""MammothModa2 AR trunk: dual und/gen FFN routing parity, engine
decode with token-id routing, and the t2i AR-grid sampling constraint."""

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
from ht_vllm_omni_tpu.models import qwen2


def _arch(**kw):
    base = dict(
        model_type="qwen2", vocab_size=64, hidden_size=16,
        intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        attention_bias=False, dtype="float32", eos_token_id=2,
        tie_word_embeddings=True, use_gen_mlp=True, gen_vocab_start=32,
    )
    base.update(kw)
    return ModelArchConfig(**base)


@pytest.fixture(scope="module")
def cfg():
    return _arch()


@pytest.fixture(scope="module")
def params(cfg):
    return qwen2.init_params(cfg, jax.random.PRNGKey(0))


def test_dual_mlp_routes_by_mask(cfg, params):
    """Grouped-GEMM dual FFN == running each expert separately on its
    own rows (reference moe_forward permute/split semantics)."""
    lp = {k: v[0] for k, v in qwen2._layer_params(params).items()}
    x = jax.random.normal(jax.random.PRNGKey(1), (6, cfg.hidden_size))
    mask = jnp.asarray([0, 1, 0, 1, 1, 0], bool)
    out = np.asarray(qwen2._mlp(cfg, lp, x, gen_mask=mask))

    def expert(e, rows):
        g = rows @ np.asarray(lp["dgate"][e])
        u = rows @ np.asarray(lp["dup"][e])
        act = (g / (1 + np.exp(-g))) * u
        return act @ np.asarray(lp["ddown"][e])

    xn = np.asarray(x)
    ref = np.zeros_like(out)
    m = np.asarray(mask)
    ref[~m] = expert(0, xn[~m])
    ref[m] = expert(1, xn[m])
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
    # mask=None routes everything to the und expert
    out0 = np.asarray(qwen2._mlp(cfg, lp, x, gen_mask=None))
    np.testing.assert_allclose(out0, expert(0, xn), rtol=2e-4, atol=2e-4)


def test_prefill_routing_changes_with_token_ids(cfg, params):
    """Same embeddings content, different gen-vocab membership ->
    different trunk output (routing is live end-to-end)."""
    s = 8
    ids_und = jnp.arange(8, 16, dtype=jnp.int32)       # all < 32
    ids_gen = jnp.arange(40, 48, dtype=jnp.int32)      # all >= 32
    pos = jnp.arange(s)
    x = jax.random.normal(jax.random.PRNGKey(2), (s, cfg.hidden_size))
    h_und, _ = qwen2.prefill(
        cfg, params, x, pos, jnp.int32(s),
        gen_mask=ids_und >= cfg.gen_vocab_start,
    )
    h_gen, _ = qwen2.prefill(
        cfg, params, x, pos, jnp.int32(s),
        gen_mask=ids_gen >= cfg.gen_vocab_start,
    )
    assert np.abs(np.asarray(h_und) - np.asarray(h_gen)).max() > 1e-4


def _engine(**sp_kw):
    from ht_vllm_omni_tpu.engine.llm_engine import LLMEngine

    cfg = EngineConfig(
        model=_arch(),
        cache=CacheConfig(page_size=16, num_pages=32),
        scheduler=SchedulerConfig(max_num_seqs=2, max_model_len=256),
    )
    return LLMEngine(cfg)


def test_engine_decode_with_dual_mlp():
    from ht_vllm_omni_tpu.sampling_params import SamplingParams

    eng = _engine()
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    out = eng.generate([[5, 9, 40]], sp)[0]
    assert len(out.outputs[0].token_ids) == 6

    # zeroing the gen expert must change results when gen tokens appear
    eng2 = _engine()
    eng2.runner.params["dgate"] = (
        eng2.runner.params["dgate"].at[:, 1].set(0.0)
    )
    out2 = eng2.generate([[5, 9, 40]], sp)[0]
    # und-only stream (prompt + sampled tokens all < gen_vocab_start)
    # unaffected by the gen expert
    from ht_vllm_omni_tpu.sampling_params import SamplingParams as SP

    sp_und = SP(
        temperature=0.0, max_tokens=6, ignore_eos=True,
        allowed_token_range=(0, 32),
    )
    out3 = eng.generate([[5, 9, 11]], sp_und)[0]
    out4 = eng2.generate([[5, 9, 11]], sp_und)[0]
    assert out3.outputs[0].token_ids == out4.outputs[0].token_ids
    # token 40 routes through the gen expert -> stream differs
    assert out.outputs[0].token_ids != out2.outputs[0].token_ids


def test_grid_constrained_sampling():
    """t2i grid: rows of grid_row_width visual tokens, EOL forced at
    each row end (reference _apply_t2i_token_constraints)."""
    from ht_vllm_omni_tpu.sampling_params import SamplingParams

    eng = _engine()
    sp = SamplingParams(
        temperature=0.8, max_tokens=11, ignore_eos=True,
        allowed_token_range=(40, 56), grid_row_width=3,
        grid_eol_token_id=7, seed=3,
    )
    toks = eng.generate([[5, 9, 11]], sp)[0].outputs[0].token_ids
    assert len(toks) == 11
    for i, t in enumerate(toks):
        if i % 4 == 3:
            assert t == 7, (i, toks)
        else:
            assert 40 <= t < 56 and t != 7, (i, toks)


def test_grid_off_leaves_window_semantics():
    from ht_vllm_omni_tpu.sampling_params import SamplingParams

    eng = _engine()
    sp = SamplingParams(
        temperature=0.8, max_tokens=8, ignore_eos=True,
        allowed_token_range=(40, 56), seed=4,
    )
    toks = eng.generate([[5, 9, 11]], sp)[0].outputs[0].token_ids
    assert all(40 <= t < 56 for t in toks)
