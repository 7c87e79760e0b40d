"""Qwen-Image family: transformer, VAE, UniPC scheduler, pipeline e2e.

Torch (cpu) is used as an oracle for the VAE numerics (causal-conv
last-tap equivalence, channelwise RMS norm) — parity without porting
reference code.  The UniPC scheduler is validated by integrating a
linear ODE with a known solution and checking higher-order convergence
than Euler.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ht_vllm_omni_tpu.diffusion.data import DiffusionSamplingParams
from ht_vllm_omni_tpu.diffusion.models.qwen_image import (
    QwenImageArchConfig,
    QwenImagePipeline,
    QwenImageVAEConfig,
)
from ht_vllm_omni_tpu.diffusion.models.qwen_image import (
    loader,
    transformer,
    vae,
)
from ht_vllm_omni_tpu.diffusion.models.qwen_image.pipeline import (
    pack_latents,
    unpack_latents,
)
from ht_vllm_omni_tpu.diffusion.schedulers.unipc import (
    FlowEulerScheduler,
    FlowUniPCScheduler,
)


# ------------------------------------------------------------- transformer
def test_transformer_shapes_and_determinism():
    cfg = QwenImageArchConfig.tiny()
    params = transformer.init_params(cfg, jax.random.PRNGKey(0))
    b, lh, lw = 2, 4, 6
    s_img = lh * lw
    img = jax.random.normal(
        jax.random.PRNGKey(1), (b, s_img, cfg.in_channels)
    )
    txt = jax.random.normal(
        jax.random.PRNGKey(2), (b, 8, cfg.joint_attention_dim)
    )
    lens = jnp.asarray([5, 8], jnp.int32)
    t = jnp.asarray([0.5, 0.5], jnp.float32)
    out1 = transformer.forward(cfg, params, img, txt, lens, t, (1, lh, lw))
    out2 = transformer.forward(cfg, params, img, txt, lens, t, (1, lh, lw))
    assert out1.shape == (
        b, s_img, cfg.patch_size**2 * cfg.out_channels
    )
    assert np.array_equal(np.asarray(out1), np.asarray(out2))
    assert np.all(np.isfinite(np.asarray(out1)))


def test_transformer_text_padding_invariance():
    """Rows past txt_lens must not influence image outputs (the flash
    kernel masks keys beyond the joint length)."""
    cfg = QwenImageArchConfig.tiny()
    params = transformer.init_params(cfg, jax.random.PRNGKey(0))
    lh = lw = 4
    img = jax.random.normal(jax.random.PRNGKey(1), (1, lh * lw, 16))
    txt = jax.random.normal(
        jax.random.PRNGKey(2), (1, 8, cfg.joint_attention_dim)
    )
    lens = jnp.asarray([5], jnp.int32)
    t = jnp.asarray([0.3], jnp.float32)
    out_a = transformer.forward(cfg, params, img, txt, lens, t, (1, lh, lw))
    txt_b = txt.at[:, 5:].set(123.0)  # scribble on padding
    out_b = transformer.forward(
        cfg, params, img, txt_b, lens, t, (1, lh, lw)
    )
    np.testing.assert_allclose(
        np.asarray(out_a), np.asarray(out_b), atol=1e-5
    )


def test_rope_3d_structure():
    cfg = QwenImageArchConfig.tiny()
    icos, isin, tcos, tsin = transformer.rope_cos_sin_3d(cfg, (1, 4, 6), 3)
    half = sum(cfg.axes_dims_rope) // 2
    assert icos.shape == (24, half) and tcos.shape == (3, half)
    # cos^2 + sin^2 == 1 everywhere
    np.testing.assert_allclose(
        np.asarray(icos) ** 2 + np.asarray(isin) ** 2, 1.0, atol=1e-5
    )
    # frame axis (single frame, position 0) contributes cos=1/sin=0
    df = cfg.axes_dims_rope[0] // 2
    np.testing.assert_allclose(np.asarray(icos)[:, :df], 1.0, atol=1e-6)


# -------------------------------------------------------------------- vae
def test_causal_conv_last_tap_matches_torch():
    """For a single frame, causal (2,0) temporal padding zeroes the first
    two taps, so the last temporal slice of the 3D kernel is exact."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    ci, co, h, w = 3, 5, 6, 7
    x = rng.standard_normal((1, ci, 1, h, w)).astype(np.float32)
    wt = rng.standard_normal((co, ci, 3, 3, 3)).astype(np.float32)
    b = rng.standard_normal((co,)).astype(np.float32)

    xt = torch.nn.functional.pad(
        torch.from_numpy(x), (1, 1, 1, 1, 2, 0)
    )  # (w, h, t-front) causal padding, reference conv order
    ref = torch.nn.functional.conv3d(
        xt, torch.from_numpy(wt), torch.from_numpy(b)
    ).numpy()

    w_jax = jnp.asarray(wt.transpose(2, 3, 4, 1, 0))  # [kt,kh,kw,ci,co]
    got = vae._conv2d(
        jnp.asarray(x[:, :, 0].transpose(0, 2, 3, 1)), w_jax, jnp.asarray(b)
    )
    np.testing.assert_allclose(
        np.asarray(got), ref[:, :, 0].transpose(0, 2, 3, 1), atol=2e-5
    )


def test_channel_rms_matches_torch_normalize():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4, 5, 8)).astype(np.float32)  # NHWC
    gamma = rng.standard_normal((8,)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))  # NCHW
    ref = (
        torch.nn.functional.normalize(xt, dim=1)
        * math.sqrt(8)
        * torch.from_numpy(gamma).view(1, 8, 1, 1)
    ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(vae._channel_rms(jnp.asarray(x), jnp.asarray(gamma)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_vae_decode_encode_shapes():
    cfg = QwenImageVAEConfig.tiny()
    params = vae.init_params(cfg, jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, cfg.z_dim))
    img = vae.decode(cfg, params, z)
    r = cfg.spatial_ratio
    assert img.shape == (1, 8 * r, 8 * r, 3)
    assert np.all(np.isfinite(np.asarray(img)))
    mean = vae.encode(cfg, params, img)
    assert mean.shape == (1, 8, 8, cfg.z_dim)
    assert np.all(np.isfinite(np.asarray(mean)))


def _fake_vae_state_dict(cfg: QwenImageVAEConfig, seed=0):
    """Diffusers-named random state dict covering the tiny config."""
    rng = np.random.default_rng(seed)
    sd = {}

    def conv3(name, ci, co, k=3):
        sd[name + ".weight"] = rng.standard_normal(
            (co, ci, k, k, k)
        ).astype(np.float32) * 0.05
        sd[name + ".bias"] = rng.standard_normal((co,)).astype(np.float32)

    def conv2(name, ci, co, k=3):
        sd[name + ".weight"] = rng.standard_normal(
            (co, ci, k, k)
        ).astype(np.float32) * 0.05
        sd[name + ".bias"] = rng.standard_normal((co,)).astype(np.float32)

    def res(base, ci, co):
        sd[base + ".norm1.gamma"] = np.ones((ci, 1, 1, 1), np.float32)
        conv3(base + ".conv1", ci, co)
        sd[base + ".norm2.gamma"] = np.ones((co, 1, 1, 1), np.float32)
        conv3(base + ".conv2", co, co)
        if ci != co:
            conv3(base + ".conv_shortcut", ci, co, k=1)

    def mid(base, c):
        res(base + ".resnets.0", c, c)
        sd[base + ".attentions.0.norm.gamma"] = np.ones(
            (c, 1, 1), np.float32
        )
        conv2(base + ".attentions.0.to_qkv", c, 3 * c, k=1)
        conv2(base + ".attentions.0.proj", c, c, k=1)
        res(base + ".resnets.1", c, c)

    mult = list(cfg.dim_mult)
    # decoder
    ddims = [cfg.base_dim * u for u in [mult[-1]] + mult[::-1]]
    conv3("decoder.conv_in", cfg.z_dim, ddims[0])
    mid("decoder.mid_block", ddims[0])
    for i, (ci, co) in enumerate(zip(ddims[:-1], ddims[1:])):
        if i > 0:
            ci = ci // 2
        cur = ci
        for j in range(cfg.num_res_blocks + 1):
            res(f"decoder.up_blocks.{i}.resnets.{j}", cur, co)
            cur = co
        if i != len(mult) - 1:
            conv2(f"decoder.up_blocks.{i}.upsamplers.0.resample.1",
                  co, co // 2)
    sd["decoder.norm_out.gamma"] = np.ones(
        (ddims[-1], 1, 1, 1), np.float32
    )
    conv3("decoder.conv_out", ddims[-1], cfg.input_channels)
    # encoder (flat down_blocks)
    edims = [cfg.base_dim * u for u in [1] + mult]
    conv3("encoder.conv_in", cfg.input_channels, edims[0])
    flat = 0
    for i, (ci, co) in enumerate(zip(edims[:-1], edims[1:])):
        cur = ci
        for _ in range(cfg.num_res_blocks):
            res(f"encoder.down_blocks.{flat}", cur, co)
            cur = co
            flat += 1
        if i != len(mult) - 1:
            conv2(f"encoder.down_blocks.{flat}.resample.1", co, co)
            flat += 1
    mid("encoder.mid_block", edims[-1])
    sd["encoder.norm_out.gamma"] = np.ones(
        (edims[-1], 1, 1, 1), np.float32
    )
    conv3("encoder.conv_out", edims[-1], cfg.z_dim * 2)
    conv3("quant_conv", cfg.z_dim * 2, cfg.z_dim * 2, k=1)
    conv3("post_quant_conv", cfg.z_dim, cfg.z_dim, k=1)
    return sd


def test_vae_loader_structure_matches_init():
    cfg = QwenImageVAEConfig.tiny()
    ref = vae.init_params(cfg, jax.random.PRNGKey(0))
    got = loader.load_vae(cfg, _fake_vae_state_dict(cfg))
    ref_td = jax.tree_util.tree_structure(ref)
    got_td = jax.tree_util.tree_structure(got)
    assert ref_td == got_td
    for r, g in zip(
        jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(got)
    ):
        assert r.shape == g.shape
    # loaded weights actually run
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, cfg.z_dim))
    img = vae.decode(cfg, got, z)
    assert np.all(np.isfinite(np.asarray(img)))


def _fake_transformer_state_dict(cfg: QwenImageArchConfig, seed=0):
    rng = np.random.default_rng(seed)
    d = cfg.inner_dim
    sd = {}

    def lin(name, ci, co, bias=True):
        sd[name + ".weight"] = (
            rng.standard_normal((co, ci)).astype(np.float32) * 0.05
        )
        if bias:
            sd[name + ".bias"] = rng.standard_normal((co,)).astype(
                np.float32
            )

    lin("img_in", cfg.in_channels, d)
    sd["txt_norm.weight"] = np.ones(
        (cfg.joint_attention_dim,), np.float32
    )
    lin("txt_in", cfg.joint_attention_dim, d)
    lin("time_text_embed.timestep_embedder.linear_1", 256, d)
    lin("time_text_embed.timestep_embedder.linear_2", d, d)
    lin("norm_out.linear", d, 2 * d)
    lin("proj_out", d, cfg.patch_size**2 * cfg.out_channels)
    hd = cfg.attention_head_dim
    for i in range(cfg.num_layers):
        b = f"transformer_blocks.{i}."
        lin(b + "img_mod.1", d, 6 * d)
        lin(b + "txt_mod.1", d, 6 * d)
        for n in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                  "add_v_proj"):
            lin(b + "attn." + n, d, d)
        for n in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            sd[b + "attn." + n + ".weight"] = np.ones((hd,), np.float32)
        lin(b + "attn.to_out.0", d, d)
        lin(b + "attn.to_add_out", d, d)
        lin(b + "img_mlp.net.0.proj", d, 4 * d)
        lin(b + "img_mlp.net.2", 4 * d, d)
        lin(b + "txt_mlp.net.0.proj", d, 4 * d)
        lin(b + "txt_mlp.net.2", 4 * d, d)
    return sd


def test_transformer_loader_fuses_qkv():
    cfg = QwenImageArchConfig.tiny()
    sd = _fake_transformer_state_dict(cfg)
    p = loader.load_transformer(cfg, sd, dtype="float32")
    ref = transformer.init_params(cfg, jax.random.PRNGKey(0))
    assert set(p) == set(ref)
    for k in ref:
        assert p[k].shape == ref[k].shape, k
    d = cfg.inner_dim
    # fused qkv column blocks == the individual projections, transposed
    np.testing.assert_allclose(
        np.asarray(p["img_qkv_w"][0][:, :d]),
        sd["transformer_blocks.0.attn.to_q.weight"].T,
    )
    np.testing.assert_allclose(
        np.asarray(p["img_qkv_w"][0][:, 2 * d:]),
        sd["transformer_blocks.0.attn.to_v.weight"].T,
    )
    # loaded params run
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 16, cfg.in_channels))
    txt = jax.random.normal(
        jax.random.PRNGKey(2), (1, 4, cfg.joint_attention_dim)
    )
    out = transformer.forward(
        cfg, p, img, txt, jnp.asarray([4], jnp.int32),
        jnp.asarray([0.7], jnp.float32), (1, 4, 4),
    )
    assert np.all(np.isfinite(np.asarray(out)))


# -------------------------------------------------------------- scheduler
def _integrate(sched_cls, n, c, x1, order_cfg=None):
    """Integrate dx/dsigma = c*x from sigma=1 to 0 with model v = c*x."""
    sigmas = np.linspace(1.0, 1.0 / n, n)
    s = sched_cls(n, sigmas=sigmas)
    state = s.init_state()
    x = jnp.asarray([x1], jnp.float32)
    for i in range(n):
        v = c * x
        x, state = s.step(state, v, x)
    return float(np.asarray(x)[0])


def test_unipc_beats_euler_on_linear_ode():
    c, x1 = 1.5, 1.0
    exact = x1 * math.exp(-c)  # x(0) = x(1) * e^{-c}
    err_euler = abs(_integrate(FlowEulerScheduler, 16, c, x1) - exact)
    err_unipc = abs(_integrate(FlowUniPCScheduler, 16, c, x1) - exact)
    assert err_unipc < err_euler / 10, (err_unipc, err_euler)
    # higher-order convergence: 4x the steps shrinks the error much
    # faster than Euler's linear rate (measured ~6-25x vs 2x)
    err_unipc64 = abs(_integrate(FlowUniPCScheduler, 64, c, x1) - exact)
    assert err_unipc64 < err_unipc / 6.0, (err_unipc, err_unipc64)


def test_unipc_single_step_equals_euler():
    c, x1 = 0.8, 2.0
    a = _integrate(FlowEulerScheduler, 1, c, x1)
    b = _integrate(FlowUniPCScheduler, 1, c, x1)
    assert abs(a - b) < 1e-9


# ------------------------------------------------------------------- e2e
def test_pipeline_generates_image_and_streams_deterministically():
    pipe = QwenImagePipeline(seed=0)
    sp = DiffusionSamplingParams(
        height=32, width=32, num_inference_steps=4, guidance_scale=3.0,
        seed=7,
    )

    class P:
        text = "a red cube"
        negative_text = None
        embeds = None

    img, state = pipe.generate_prompt(P(), sp)
    assert img is not None and img.shape[2] == 3
    assert img.dtype == np.uint8
    assert state["step"] == 4

    # stepwise (stream_every=1) must reproduce the one-shot result
    sp2 = DiffusionSamplingParams(
        height=32, width=32, num_inference_steps=4, guidance_scale=3.0,
        seed=7, stream_every=1,
    )
    img2, st = None, None
    for _ in range(4):
        img2, st = pipe.generate_prompt(P(), sp2, stepwise_state=st)
    assert img2 is not None
    np.testing.assert_array_equal(img, img2)


def test_pack_unpack_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 6, 8))
    packed = pack_latents(x)
    assert packed.shape == (2, 3 * 4, 16)
    back = unpack_latents(packed, 6, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_engine_runs_qwen_image_family():
    from ht_vllm_omni_tpu.diffusion.data import OmniDiffusionConfig
    from ht_vllm_omni_tpu.diffusion.diffusion_engine import DiffusionEngine

    eng = DiffusionEngine(OmniDiffusionConfig(family="qwen-image"))
    from ht_vllm_omni_tpu.inputs import OmniPrompt

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


# --------------------------------------------------------------- img2img
def test_img2img_starts_at_strength_step_and_uses_init_image():
    from ht_vllm_omni_tpu.inputs import OmniPrompt

    pipe = QwenImagePipeline(seed=0)
    rng = np.random.default_rng(0)
    init = rng.integers(0, 255, size=(32, 32, 3)).astype(np.uint8)
    sp = DiffusionSamplingParams(
        height=32, width=32, num_inference_steps=8, guidance_scale=1.0,
        seed=3,
    )
    prompt = OmniPrompt(
        text="make it blue",
        multi_modal_data={"image": init},
        additional_information={"strength": 0.5},
    )
    state = pipe._prepare(prompt, sp)
    # strength 0.5 over 8 steps -> skip the first 4
    assert state["step"] == 4
    assert state["sched_state"]["step"] == 4

    img, st = pipe.generate_prompt(prompt, sp)
    assert img is not None and img.shape == (32, 32, 3)
    # deterministic given (seed, init image)
    img2, _ = pipe.generate_prompt(prompt, sp)
    np.testing.assert_array_equal(img, img2)
    # the init image actually conditions the result
    t2i, _ = pipe.generate_prompt(
        OmniPrompt(text="make it blue"), sp
    )
    assert not np.array_equal(img, t2i)


def test_engine_generate_batch_matches_sequential():
    """VERDICT r4 #9: DiffusionEngine.generate_batch (reference
    AsyncOmniDiffusion.generate_batch) batches the text-encoder forwards
    across requests; per-request seeds must reproduce the sequential
    outputs."""
    import numpy as np

    from ht_vllm_omni_tpu.diffusion.data import OmniDiffusionConfig
    from ht_vllm_omni_tpu.diffusion.diffusion_engine import DiffusionEngine
    from ht_vllm_omni_tpu.diffusion.models.qwen_image.config import (
        QwenImageArchConfig,
        QwenImageVAEConfig,
    )
    from ht_vllm_omni_tpu.inputs import OmniPrompt

    def mk():
        return DiffusionEngine(OmniDiffusionConfig(
            family="qwen-image",
            family_options={
                "arch": QwenImageArchConfig.tiny(),
                "vae_cfg": QwenImageVAEConfig.tiny(),
            },
            seed=2,
        ))

    prompts = [
        OmniPrompt(
            text=f"a {w} on a hill",
            additional_information={
                "size": "16x16", "num_inference_steps": 2,
                "guidance_scale": 3.0, "seed": 10 + i,
            },
        )
        for i, w in enumerate(["fox", "barn", "kite", "lake"])
    ]
    eng = mk()
    outs = eng.generate_batch(prompts)
    assert len(outs) == 4 and all(o.error is None for o in outs)
    seq_eng = mk()
    for i, p in enumerate(prompts):
        seq_eng.add_request(p, request_id=f"s{i}")
        (seq_out,) = seq_eng.step()
        a = np.asarray(outs[i].multimodal_output["image"], np.int32)
        b = np.asarray(seq_out.multimodal_output["image"], np.int32)
        assert np.max(np.abs(a - b)) <= 1, (i, np.max(np.abs(a - b)))
    # distinct seeds produce distinct images
    i0 = np.asarray(outs[0].multimodal_output["image"])
    i1 = np.asarray(outs[1].multimodal_output["image"])
    assert np.any(i0 != i1)
