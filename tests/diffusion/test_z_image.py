"""Z-Image family: block parity vs a torch replica of the reference
ZImageTransformerBlock, rope/pad semantics, pipeline e2e."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.diffusion.data import DiffusionSamplingParams
from ht_vllm_omni_tpu.diffusion.models.z_image import transformer
from ht_vllm_omni_tpu.diffusion.models.z_image.config import (
    SEQ_MULTI_OF,
    ZImageArchConfig,
)
from ht_vllm_omni_tpu.diffusion.models.z_image.pipeline import (
    ZImagePipeline,
)

torch = pytest.importorskip("torch")


def _torch_block(cfg, p, x, cos, sin, adaln):
    """Replica of ZImageTransformerBlock.forward (modulated path,
    reference z_image_transformer.py:435-482) over the same params."""
    import torch.nn.functional as F

    tp = {k: torch.from_numpy(np.asarray(v, np.float32)) for k, v in
          p.items()}
    x = torch.from_numpy(np.asarray(x, np.float32))
    cos = torch.from_numpy(np.asarray(cos, np.float32))
    sin = torch.from_numpy(np.asarray(sin, np.float32))
    adaln = torch.from_numpy(np.asarray(adaln, np.float32))

    def rms(t, w, eps=cfg.norm_eps):
        v = t.pow(2).mean(-1, keepdim=True)
        return w * (t * torch.rsqrt(v + eps))

    mod = adaln @ tp["ada_w"] + tp["ada_b"]
    sc_msa, g_msa, sc_mlp, g_mlp = mod.unsqueeze(1).chunk(4, dim=2)
    g_msa, g_mlp = g_msa.tanh(), g_mlp.tanh()
    sc_msa, sc_mlp = 1.0 + sc_msa, 1.0 + sc_mlp

    b, s, d = x.shape
    nq, nk, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    h = rms(x, tp["att_n1"]) * sc_msa
    qkv = h @ tp["qkv_w"]
    q, k, v = qkv.split([nq * hd, nk * hd, nk * hd], dim=-1)
    q = rms(q.view(b, s, nq, hd), tp["q_norm"], 1e-5)
    k = rms(k.view(b, s, nk, hd), tp["k_norm"], 1e-5)
    v = v.view(b, s, nk, hd)

    def rope(t):
        a, bb = t[..., 0::2], t[..., 1::2]
        c = cos[None, :, None, :]
        ss = sin[None, :, None, :]
        return torch.stack(
            [a * c - bb * ss, a * ss + bb * c], dim=-1
        ).reshape(t.shape)

    q, k = rope(q), rope(k)
    k = k.repeat_interleave(nq // nk, dim=2)
    v = v.repeat_interleave(nq // nk, dim=2)
    att = torch.softmax(
        torch.einsum("bqhd,bkhd->bhqk", q, k) * hd**-0.5, -1
    )
    o = torch.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, s, nq * hd)
    x = x + g_msa * rms(o @ tp["out_w"], tp["att_n2"])
    h = rms(x, tp["ffn_n1"]) * sc_mlp
    w1, w3 = (h @ tp["w13"]).chunk(2, dim=-1)
    ff = rms((F.silu(w1) * w3) @ tp["w2"], tp["ffn_n2"])
    return (x + g_mlp * ff).numpy()


def test_block_parity_vs_torch():
    cfg = ZImageArchConfig.tiny()
    key = jax.random.PRNGKey(0)
    p = transformer._block_init(
        cfg, iter(jax.random.split(key, 16)), True
    )
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, cfg.dim)).astype(np.float32)
    ids = np.stack(
        [np.arange(8), np.zeros(8), np.zeros(8)], -1
    ).astype(np.int64)
    cos, sin = transformer._rope_tables(cfg, ids)
    adaln = rng.normal(size=(2, cfg.adaln_dim)).astype(np.float32)
    out = np.asarray(
        transformer._block(
            cfg, p, jnp.asarray(x), cos, sin, jnp.asarray(adaln)
        )
    )
    ref = _torch_block(cfg, p, x, np.asarray(cos), np.asarray(sin), adaln)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_forward_pads_image_tokens_to_multiple():
    cfg = ZImageArchConfig.tiny()
    params = transformer.init_params(cfg, jax.random.PRNGKey(0))
    lat_h = lat_w = 4  # 4 image tokens -> padded to 32 internally
    toks = jax.random.normal(
        jax.random.PRNGKey(1),
        (1, 4, cfg.patch_size**2 * cfg.in_channels),
    )
    cap = jax.random.normal(
        jax.random.PRNGKey(2), (1, SEQ_MULTI_OF, cfg.cap_feat_dim)
    )
    out = transformer.forward(
        cfg, params, toks, cap, jnp.asarray([5]),
        jnp.asarray([0.3]), (lat_h, lat_w),
    )
    assert out.shape == (1, 4, cfg.patch_size**2 * cfg.in_channels)
    assert np.isfinite(np.asarray(out)).all()


def test_pipeline_generates_and_neg_prompt_matters():
    pipe = ZImagePipeline(seed=0)
    sp = DiffusionSamplingParams(
        height=32, width=32, num_inference_steps=3, guidance_scale=3.0,
        seed=7,
    )

    class P:
        text = "a red cube"
        negative_text = None
        embeds = None

    img, state = pipe.generate_prompt(P(), sp)
    assert img is not None and img.shape == (32, 32, 3)
    assert img.dtype == np.uint8
    img2, _ = pipe.generate_prompt(P(), sp)
    np.testing.assert_array_equal(img, img2)

    class N(P):
        negative_text = "blurry, low quality"

    img3, _ = pipe.generate_prompt(N(), sp)
    assert not np.array_equal(img, img3)

    # stepwise streaming reproduces the one-shot result
    sp2 = DiffusionSamplingParams(
        height=32, width=32, num_inference_steps=3, guidance_scale=3.0,
        seed=7, stream_every=1,
    )
    simg, st = None, None
    for _ in range(3):
        simg, st = pipe.generate_prompt(P(), sp2, stepwise_state=st)
    np.testing.assert_array_equal(img, simg)


def test_engine_runs_z_image_family():
    from ht_vllm_omni_tpu.diffusion.data import OmniDiffusionConfig
    from ht_vllm_omni_tpu.diffusion.diffusion_engine import DiffusionEngine
    from ht_vllm_omni_tpu.inputs import OmniPrompt

    eng = DiffusionEngine(OmniDiffusionConfig(family="z-image"))
    eng.add_request(
        OmniPrompt(
            text="blue circle",
            additional_information={
                "size": "32x32", "num_inference_steps": 2, "seed": 1,
            },
        ),
        request_id="r0",
    )
    outs = []
    for _ in range(10):
        outs.extend(eng.step())
        if outs and outs[-1].finished:
            break
    assert outs and outs[-1].finished and outs[-1].error is None
    assert "image" in outs[-1].multimodal_output
