"""MammothModa2 DiT: block parity vs a torch replica of the reference
Lumina2-style TransformerBlock, rope layout, QFormer, pipeline e2e, and
the full 2-stage AR->DiT pipeline through the engine."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.diffusion.data import (
    DiffusionSamplingParams,
    OmniDiffusionConfig,
)
from ht_vllm_omni_tpu.diffusion.models.mammoth_moda2 import transformer
from ht_vllm_omni_tpu.diffusion.models.mammoth_moda2.config import (
    MammothDiTArchConfig,
)
from ht_vllm_omni_tpu.diffusion.models.mammoth_moda2.pipeline import (
    MammothModa2DiTPipeline,
)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def cfg():
    return MammothDiTArchConfig.tiny()


@pytest.fixture(scope="module")
def params(cfg):
    return transformer.init_params(cfg, jax.random.PRNGKey(0))


# ---------------------------------------------------------------- block
def _torch_block(cfg, p, x, cos, sin, temb):
    """Replica of the reference modulated TransformerBlock forward
    (mammothmoda2_dit_model.py:457-492) incl. apply_real_rotary_emb."""
    tp = {
        k: torch.from_numpy(np.asarray(v, np.float32)) for k, v in
        p.items()
    }
    x = torch.from_numpy(np.asarray(x, np.float32))
    cos = torch.from_numpy(np.asarray(cos, np.float32))
    sin = torch.from_numpy(np.asarray(sin, np.float32))
    temb = torch.from_numpy(np.asarray(temb, np.float32))

    def rms(t, w, eps=cfg.norm_eps):
        v = t.pow(2).mean(-1, keepdim=True)
        return w * (t * torch.rsqrt(v + eps))

    def rope(t):
        s, h, d = t.shape
        tr = t.reshape(s, h, d // 2, 2)
        c = cos.reshape(s, -1, 2)[..., 0].unsqueeze(1)
        sn = sin.reshape(s, -1, 2)[..., 0].unsqueeze(1)
        x1, x2 = tr[..., 0], tr[..., 1]
        return torch.stack(
            [x1 * c - x2 * sn, x1 * sn + x2 * c], -1
        ).reshape(s, h, d)

    mod = torch.nn.functional.silu(temb) @ tp["ada_w"] + tp["ada_b"]
    sc_msa, g_msa, sc_mlp, g_mlp = mod.chunk(4, -1)
    n = rms(x, tp["norm1"]) * (1 + sc_msa[None])

    s = n.shape[0]
    nq, nk, hd = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim
    q = rms((n @ tp["wq"]).reshape(s, nq, hd), tp["q_norm"], 1e-5)
    k = rms((n @ tp["wk"]).reshape(s, nk, hd), tp["k_norm"], 1e-5)
    v = (n @ tp["wv"]).reshape(s, nk, hd)
    q, k = rope(q), rope(k)
    k = k.repeat_interleave(nq // nk, 1)
    v = v.repeat_interleave(nq // nk, 1)
    sc = torch.einsum("qhd,khd->hqk", q, k) / (hd ** 0.5)
    o = torch.einsum("hqk,khd->qhd", sc.softmax(-1), v).reshape(s, -1)
    a = o @ tp["wo"]
    x = x + torch.tanh(g_msa)[None] * rms(a, tp["norm2"])
    n = rms(x, tp["ffn_norm1"]) * (1 + sc_mlp[None])
    f = (
        torch.nn.functional.silu(n @ tp["w1"]) * (n @ tp["w3"])
    ) @ tp["w2"]
    x = x + torch.tanh(g_mlp)[None] * rms(f, tp["ffn_norm2"])
    return x.numpy()


def test_block_parity_vs_torch(cfg, params):
    lp = params["layers"][0]
    s = 6
    x = jax.random.normal(jax.random.PRNGKey(1), (s, cfg.hidden_size))
    cos, sin = transformer.rope_tables(cfg, 2, (2, 2))
    temb = jax.random.normal(jax.random.PRNGKey(2), (cfg.adaln_dim,))
    ours = np.asarray(transformer.block(
        cfg, lp, x, jnp.asarray(cos), jnp.asarray(sin), temb
    ))
    ref = _torch_block(cfg, lp, x, cos, sin, temb)
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def test_rope_layout(cfg):
    """Text rows: all 3 axes carry the linear index; image rows carry
    (pe_shift, row, col) (reference rope_real.py:168-210)."""
    n_text, (ht, wt) = 3, (2, 3)
    cos, sin = transformer.rope_tables(cfg, n_text, (ht, wt))
    d0 = cfg.axes_dim_rope[0]
    # text row i: axis-0 angle = i * f0 with duplicated pairs
    f0 = 1.0 / cfg.rope_theta ** (np.arange(0, d0, 2) / d0)
    np.testing.assert_allclose(
        cos[2, :d0], np.repeat(np.cos(2 * f0), 2), rtol=1e-5
    )
    # image row (r=1, c=2): axis0 = n_text, axis1 = 1, axis2 = 2
    row = n_text + 1 * wt + 2
    np.testing.assert_allclose(
        cos[row, :d0], np.repeat(np.cos(n_text * f0), 2), rtol=1e-5
    )
    d1 = cfg.axes_dim_rope[1]
    f1 = 1.0 / cfg.rope_theta ** (np.arange(0, d1, 2) / d1)
    np.testing.assert_allclose(
        sin[row, d0:d0 + d1], np.repeat(np.sin(1 * f1), 2), rtol=1e-5,
        atol=1e-7,
    )


def test_qformer_shapes(cfg, params):
    x = jax.random.normal(jax.random.PRNGKey(3), (9, cfg.hidden_size))
    out = transformer.qformer(cfg, params["qformer"], x)
    assert out.shape == (cfg.qformer_queries, cfg.hidden_size)
    assert np.isfinite(np.asarray(out)).all()


# ------------------------------------------------------------- pipeline
def test_pipeline_standalone_t2i():
    pipe = MammothModa2DiTPipeline()
    sp = DiffusionSamplingParams(
        height=32, width=32, num_inference_steps=2, guidance_scale=1.0,
        seed=0,
    )

    class _P:
        text = "a mountain lake at dawn"

    img, state = pipe.generate_prompt(_P(), sp)
    assert img is not None
    assert img.ndim == 3 and img.shape[-1] == 3
    assert np.isfinite(img).all() and img.min() >= 0.0 and img.max() <= 1.0


def test_pipeline_with_ar_conditions_and_cfg():
    pipe = MammothModa2DiTPipeline(cfg_range=(0.0, 0.5))
    sp = DiffusionSamplingParams(
        height=32, width=32, num_inference_steps=4, guidance_scale=3.0,
        seed=1,
    )

    class _P:
        text = ""
        additional_information = {
            "text_prompt_embeds": np.random.default_rng(0).normal(
                size=(5, pipe.arch.text_feat_dim)
            ).astype(np.float32),
            "image_prompt_embeds": np.random.default_rng(1).normal(
                size=(7, pipe.arch.text_feat_dim)
            ).astype(np.float32),
        }

    img, _ = pipe.generate_prompt(_P(), sp)
    assert np.isfinite(img).all()
    # image condition must matter (routes through the QFormer)
    class _P2:
        text = ""
        additional_information = {
            "text_prompt_embeds": _P.additional_information[
                "text_prompt_embeds"
            ],
        }

    img2, _ = pipe.generate_prompt(_P2(), sp)
    assert np.abs(img - img2).max() > 1e-6


def test_registry_row():
    from ht_vllm_omni_tpu.diffusion.registry import create_pipeline

    cfg = OmniDiffusionConfig()
    cfg.family = "mammoth-moda2"
    cfg.family_options = {"cfg_range": [0.0, 1.0]}
    pipe = create_pipeline(cfg)
    assert isinstance(pipe, MammothModa2DiTPipeline)


# -------------------------------------------------------- 2-stage e2e
def test_two_stage_pipeline_ar_to_dit():
    from ht_vllm_omni_tpu.config.stage_config import (
        builtin_pipeline_path,
        load_pipeline_config,
    )
    from ht_vllm_omni_tpu.engine.stage_factory import build_stages
    from ht_vllm_omni_tpu.entrypoints.omni import Omni
    from ht_vllm_omni_tpu.sampling_params import SamplingParams

    cfg = load_pipeline_config(builtin_pipeline_path("mammoth_moda2"))
    st0 = cfg.stage(0)
    st0.engine_args["model_arch_config"] = dict(
        model_type="qwen2", vocab_size=64, hidden_size=16,
        intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        attention_bias=False, dtype="float32", tie_word_embeddings=True,
        eos_token_id=2, use_gen_mlp=True, gen_vocab_start=32,
    )
    st0.engine_args["num_pages"] = 64
    st0.engine_args["gen_vocab_start"] = 32
    st0.engine_args["visual_special_ids"] = [30, 31]
    st0.default_sampling_params.update(
        allowed_token_range=[32, 64], grid_row_width=2,
        grid_eol_token_id=7, max_tokens=7,
    )
    st1 = cfg.stage(1)
    st1.engine_args["family_options"] = {}
    st1.default_sampling_params.update(
        height=32, width=32, num_inference_steps=2, guidance_scale=1.0,
    )
    omni = Omni(pipeline=cfg, stages=build_stages(cfg))
    sp = SamplingParams(
        temperature=0.8, max_tokens=7, ignore_eos=True,
        return_hidden_states=True, return_prompt_hidden_states=True,
        allowed_token_range=(32, 64), grid_row_width=2,
        grid_eol_token_id=7, seed=5,
    )
    outs = omni.generate([[5, 9, 30, 11]], sp)
    img = outs[0].consolidated_multimodal("image")
    assert img is not None
    img = np.asarray(img)
    assert np.isfinite(img).all()
