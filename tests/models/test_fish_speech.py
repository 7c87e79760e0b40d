"""Fish-Speech family: Fast-AR parity vs a torch replica of the
reference loop, interleaved-RoPE trunk, and pipeline e2e."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.config.stage_config import (
    builtin_pipeline_path,
    load_pipeline_config,
)
from ht_vllm_omni_tpu.models.fish_speech import fast_ar
from ht_vllm_omni_tpu.models.fish_speech.config import FishSpeechFastConfig

torch = pytest.importorskip("torch")


def _torch_fast_ar(cfg, params, slow_hidden, semantic_code, rsz=1024):
    """Replica of the reference FishSpeechFastAR.forward greedy loop
    (fish_speech_fast_ar.py:384-470): SDPA + llama MLP + GPT-J RoPE."""
    import torch.nn.functional as F

    p = {k: torch.from_numpy(np.asarray(v, np.float32)) for k, v in
         params.items()}
    bsz = slow_hidden.shape[0]
    c = cfg.num_codebooks
    rsz = min(rsz, cfg.vocab_size)

    def rms(x, w):
        v = x.pow(2).mean(-1, keepdim=True)
        return w * (x * torch.rsqrt(v + cfg.rms_norm_eps))

    def rope(x, pos):
        hd = cfg.head_dim
        inv = 1.0 / (
            cfg.rope_theta ** (torch.arange(0, hd, 2).float() / hd)
        )
        f = pos.float()[:, None] * inv[None]
        cos, sin = f.cos()[None, :, None, :], f.sin()[None, :, None, :]
        xe, xo = x[..., 0::2], x[..., 1::2]
        return torch.stack(
            [xe * cos - xo * sin, xo * cos + xe * sin], dim=-1
        ).reshape(x.shape)

    def trunk(seq):
        b, g, _ = seq.shape
        nq, nk, hd = (
            cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim,
        )
        pos = torch.arange(g)
        h = seq
        for li in range(cfg.num_hidden_layers):
            x = rms(h, p["ln1"][li])
            q = (x @ p["wq"][li]).view(b, g, nq, hd)
            k = (x @ p["wk"][li]).view(b, g, nk, hd)
            v = (x @ p["wv"][li]).view(b, g, nk, hd)
            q, k = rope(q, pos), rope(k, pos)
            o = F.scaled_dot_product_attention(
                q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2),
                is_causal=True, enable_gqa=True,
            ).transpose(1, 2).reshape(b, g, -1)
            h = h + o @ p["wo"][li]
            x = rms(h, p["ln2"][li])
            h = h + (
                F.silu(x @ p["gate"][li]) * (x @ p["up"][li])
            ) @ p["down"][li]
        return rms(h, p["norm_f"])

    seq = torch.zeros(bsz, c + 1, cfg.hidden_size)
    seq[:, 0] = torch.from_numpy(slow_hidden)
    code0 = torch.from_numpy(semantic_code).long()
    seq[:, 1] = p["embed"][code0]
    codes = torch.zeros(bsz, c, dtype=torch.long)
    codes[:, 0] = code0
    for step in range(1, c):
        out = trunk(seq[:, : step + 1])
        logits = rms(out[:, -1], p["fast_norm"]) @ p["head"]
        nxt = logits[:, :rsz].argmax(-1)
        codes[:, step] = nxt
        if step + 1 <= c:
            seq[:, step + 1] = p["embed"][nxt]
    return codes.numpy()


def test_fast_ar_matches_torch_replica():
    cfg = FishSpeechFastConfig.tiny()
    params = fast_ar.init_params(cfg, jax.random.PRNGKey(0))
    # break weight symmetry so argmax is decisive
    params = jax.tree.map(
        lambda x: x
        + 0.01 * jax.random.normal(jax.random.PRNGKey(1), x.shape),
        params,
    )
    rng = np.random.default_rng(0)
    hidden = rng.normal(size=(3, cfg.hidden_size)).astype(np.float32)
    sem = rng.integers(0, cfg.vocab_size, size=3).astype(np.int32)

    ours = np.asarray(
        fast_ar.predict_codes(
            cfg, params, jnp.asarray(hidden), jnp.asarray(sem),
        )
    )
    ref = _torch_fast_ar(cfg, params, hidden, sem)
    np.testing.assert_array_equal(ours, ref)


def test_fast_ar_runtime_buckets():
    cfg = FishSpeechFastConfig.tiny()
    rt = fast_ar.FastARRuntime(
        cfg, fast_ar.init_params(cfg, jax.random.PRNGKey(2))
    )
    h = np.random.default_rng(1).normal(
        size=(3, cfg.hidden_size)
    ).astype(np.float32)
    sem = np.asarray([1, 2, 3], np.int32)
    codes = rt.expand(h, sem)
    assert codes.shape == (3, cfg.num_codebooks)
    np.testing.assert_array_equal(codes[:, 0], sem)


def test_rope_interleaved_trunk_differs_and_hf_style_matches():
    """GPT-J rope changes outputs vs neox on the same weights."""
    from ht_vllm_omni_tpu.config import ModelArchConfig
    from ht_vllm_omni_tpu.models import qwen2

    kw = dict(
        model_type="qwen2", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, dtype="float32", attention_bias=False,
        tie_word_embeddings=True,
    )
    c_neox = ModelArchConfig(**kw)
    c_gptj = ModelArchConfig(**kw, rope_interleaved=True)
    params = qwen2.init_params(c_neox, jax.random.PRNGKey(0))
    emb = qwen2.embed_tokens(params, jnp.asarray([3, 5, 9], jnp.int32))
    pos = jnp.arange(3, dtype=jnp.int32)
    h1, _ = qwen2.prefill(c_neox, params, emb, pos, jnp.int32(3))
    h2, _ = qwen2.prefill(c_gptj, params, emb, pos, jnp.int32(3))
    assert not np.allclose(np.asarray(h1), np.asarray(h2))


def test_pipeline_e2e_streaming_audio():
    from ht_vllm_omni_tpu.engine.stage_factory import build_stages
    from ht_vllm_omni_tpu.entrypoints.omni import Omni
    from ht_vllm_omni_tpu.sampling_params import SamplingParams

    cfg = load_pipeline_config(builtin_pipeline_path("fish_speech"))
    st0 = cfg.stage(0)
    st0.engine_args["model_arch_config"] = dict(
        model_type="qwen3", vocab_size=128, hidden_size=64,
        intermediate_size=96, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, dtype="float32", qk_norm=True,
        attention_bias=False, tie_word_embeddings=True,
        rope_interleaved=True, eos_token_id=1,
    )
    st0.engine_args["num_pages"] = 64
    st0.engine_args["fast_ar"] = dict(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, intermediate_size=96,
        vocab_size=32, num_codebooks=4,
    )
    st0.engine_args["semantic_begin_id"] = 7
    cfg.stage(1).engine_args["dac"] = dict(
        latent_dim=32, decoder_hidden_size=16,
        upsampling_ratios=[2, 2], n_codebooks=4, codebook_size=32,
        codebook_dim=6,
    )
    omni = Omni(pipeline=cfg, stages=build_stages(cfg))
    sp = SamplingParams(
        temperature=0.0, max_tokens=40, ignore_eos=True,
        return_hidden_states=True,
    )
    outs = omni.generate([[8, 9, 10]], sp)
    audio = outs[0].consolidated_multimodal("audio")
    assert audio is not None and len(audio) > 0
    assert np.isfinite(np.asarray(audio, np.float32)).all()


def test_allowed_token_window_constrains_sampling():
    """allowed_token_range restricts every sampled token to [lo, hi) plus
    stop ids (reference _semantic_allowed_mask semantics)."""
    from ht_vllm_omni_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelArchConfig,
        SchedulerConfig,
    )
    from ht_vllm_omni_tpu.engine.llm_engine import LLMEngine
    from ht_vllm_omni_tpu.sampling_params import SamplingParams

    cfg = ModelArchConfig(
        model_type="qwen2", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, dtype="float32", tie_word_embeddings=True,
        eos_token_id=1,
    )
    engine = LLMEngine(
        EngineConfig(
            model=cfg,
            cache=CacheConfig(page_size=16, num_pages=64),
            scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=128),
        ),
        decode_horizon=8,
    )
    sp = SamplingParams(
        temperature=0.7, max_tokens=24, ignore_eos=True, seed=3,
        allowed_token_range=(10, 20),
    )
    outs = engine.generate([[5, 9, 2], [7, 7, 7]], sp)
    for o in outs:
        toks = o.outputs[0].token_ids
        assert len(toks) == 24
        assert all(10 <= t < 20 for t in toks), toks
