"""SD3/SD3.5 family: MMDiT transformer, diffusers-layout loader,
pipeline e2e, dual-attention (SD3.5-medium) path."""

import numpy as np

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.diffusion.data import (
    DiffusionSamplingParams,
    OmniDiffusionConfig,
)
from ht_vllm_omni_tpu.diffusion.models.sd3 import (
    SD3ArchConfig,
    SD3Pipeline,
    transformer,
)
from ht_vllm_omni_tpu.diffusion.registry import create_pipeline
from ht_vllm_omni_tpu.inputs import OmniPrompt


def _fwd(cfg, params, t=0.5, seed=1):
    lat = jax.random.normal(
        jax.random.PRNGKey(seed), (1, cfg.in_channels, 8, 8), jnp.float32
    )
    txt = jax.random.normal(
        jax.random.PRNGKey(2), (1, 6, cfg.joint_attention_dim), jnp.float32
    )
    pooled = jax.random.normal(
        jax.random.PRNGKey(3), (1, cfg.pooled_projection_dim), jnp.float32
    )
    ts = jnp.asarray([t], jnp.float32)
    return transformer.forward(cfg, params, lat, txt, pooled, ts)


def test_transformer_shapes_and_conditioning():
    cfg = SD3ArchConfig.tiny()
    params = transformer.init_params(cfg, jax.random.PRNGKey(0))
    a = _fwd(cfg, params)
    assert a.shape == (1, cfg.out_channels, 8, 8)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(_fwd(cfg, params)))
    # timestep conditioning changes the prediction
    b = _fwd(cfg, params, t=0.9)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_dual_attention_layers_sd35():
    cfg = SD3ArchConfig.tiny(
        dual_attention_layers=(0,), qk_norm="rms_norm"
    )
    params = transformer.init_params(cfg, jax.random.PRNGKey(0))
    a = _fwd(cfg, params)
    assert a.shape == (1, cfg.out_channels, 8, 8)
    # zeroing layer 0's dual-attention output projection changes nothing
    # for masked layers but does for active ones
    params2 = dict(params)
    blocks = dict(params["blocks"])
    blocks["dual_out_w"] = jnp.zeros_like(blocks["dual_out_w"])
    params2["blocks"] = blocks
    b = _fwd(cfg, params2)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def _synthetic_diffusers_sd(cfg: SD3ArchConfig, rng):
    """Random state dict in diffusers SD3Transformer2DModel layout."""
    d = cfg.inner_dim
    sd = {}

    def add(name, *shape):
        sd[name] = rng.normal(size=shape).astype(np.float32) * 0.05

    add("pos_embed.proj.weight", d, cfg.in_channels, cfg.patch_size,
        cfg.patch_size)
    add("pos_embed.proj.bias", d)
    add("pos_embed.pos_embed", 1, cfg.pos_embed_max_size**2, d)
    for p in ("timestep_embedder", "text_embedder"):
        ind = 256 if p == "timestep_embedder" else cfg.pooled_projection_dim
        add(f"time_text_embed.{p}.linear_1.weight", d, ind)
        add(f"time_text_embed.{p}.linear_1.bias", d)
        add(f"time_text_embed.{p}.linear_2.weight", d, d)
        add(f"time_text_embed.{p}.linear_2.bias", d)
    add("context_embedder.weight", cfg.caption_projection_dim,
        cfg.joint_attention_dim)
    add("context_embedder.bias", cfg.caption_projection_dim)
    add("norm_out.linear.weight", 2 * d, d)
    add("norm_out.linear.bias", 2 * d)
    add("proj_out.weight", cfg.patch_size**2 * cfg.out_channels, d)
    add("proj_out.bias", cfg.patch_size**2 * cfg.out_channels)
    for i in range(cfg.num_layers):
        pre = f"transformer_blocks.{i}."
        last = i == cfg.num_layers - 1
        dual = i in cfg.dual_attention_layers
        add(pre + "norm1.linear.weight", (9 if dual else 6) * d, d)
        add(pre + "norm1.linear.bias", (9 if dual else 6) * d)
        if last:
            add(pre + "norm1_context.linear.weight", 2 * d, d)
            add(pre + "norm1_context.linear.bias", 2 * d)
        else:
            add(pre + "norm1_context.linear.weight", 6 * d, d)
            add(pre + "norm1_context.linear.bias", 6 * d)
        for n in ("to_q", "to_k", "to_v"):
            add(pre + f"attn.{n}.weight", d, d)
            add(pre + f"attn.{n}.bias", d)
        for n in ("add_q_proj", "add_k_proj", "add_v_proj"):
            add(pre + f"attn.{n}.weight", d, d)
            add(pre + f"attn.{n}.bias", d)
        add(pre + "attn.to_out.0.weight", d, d)
        add(pre + "attn.to_out.0.bias", d)
        if not last:
            add(pre + "attn.to_add_out.weight", d, d)
            add(pre + "attn.to_add_out.bias", d)
        if cfg.qk_norm == "rms_norm":
            for hf in ("q", "k", "added_q", "added_k"):
                sd[pre + f"attn.norm_{hf}.weight"] = np.ones(
                    (cfg.attention_head_dim,), np.float32
                )
        if dual:
            for n in ("to_q", "to_k", "to_v"):
                add(pre + f"attn2.{n}.weight", d, d)
                add(pre + f"attn2.{n}.bias", d)
            add(pre + "attn2.to_out.0.weight", d, d)
            add(pre + "attn2.to_out.0.bias", d)
            sd[pre + "attn2.norm_q.weight"] = np.ones(
                (cfg.attention_head_dim,), np.float32
            )
            sd[pre + "attn2.norm_k.weight"] = np.ones(
                (cfg.attention_head_dim,), np.float32
            )
        add(pre + "ff.net.0.proj.weight", 4 * d, d)
        add(pre + "ff.net.0.proj.bias", 4 * d)
        add(pre + "ff.net.2.weight", d, 4 * d)
        add(pre + "ff.net.2.bias", d)
        if not last:
            add(pre + "ff_context.net.0.proj.weight", 4 * d, d)
            add(pre + "ff_context.net.0.proj.bias", 4 * d)
            add(pre + "ff_context.net.2.weight", d, 4 * d)
            add(pre + "ff_context.net.2.bias", d)
    return sd


def test_diffusers_loader_roundtrip():
    """Loader maps every diffusers tensor; fused qkv slices match."""
    cfg = SD3ArchConfig.tiny(qk_norm="rms_norm", dual_attention_layers=(1,))
    sd = _synthetic_diffusers_sd(cfg, np.random.default_rng(0))
    params = transformer.load_diffusers(cfg, sd)
    out = _fwd(cfg, params)
    assert out.shape == (1, cfg.out_channels, 8, 8)
    assert np.isfinite(np.asarray(out)).all()
    # fused qkv: first d columns == to_q^T of block 0
    qkv = np.asarray(params["blocks"]["img_qkv_w"][0])
    np.testing.assert_allclose(
        qkv[:, : cfg.inner_dim],
        sd["transformer_blocks.0.attn.to_q.weight"].T,
        rtol=1e-6,
    )


def test_pipeline_e2e_cfg():
    pipe = SD3Pipeline(seed=0)
    sp = DiffusionSamplingParams(
        height=32, width=32, num_inference_steps=3, guidance_scale=4.0,
        seed=7,
    )
    img, state = pipe.generate_prompt(
        OmniPrompt(text="a red cube on a blue table"), sp
    )
    assert img is not None
    assert img.shape[2] == 3 and img.dtype == np.uint8
    assert state["step"] == 3


def test_registry_family():
    cfg = OmniDiffusionConfig(family="sd3", seed=0)
    pipe = create_pipeline(cfg)
    assert isinstance(pipe, SD3Pipeline)
