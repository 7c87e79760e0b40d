"""NextStep-1.1 family: flow head vs a torch replica of the reference
SimpleMLPAdaLN, AR-feedback invariants, SDE endpoint semantics,
pipeline e2e, registry."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.diffusion.data import (
    DiffusionSamplingParams,
    OmniDiffusionConfig,
)
from ht_vllm_omni_tpu.diffusion.models.nextstep import model as ns
from ht_vllm_omni_tpu.diffusion.models.nextstep.model import (
    NextStepArchConfig,
)
from ht_vllm_omni_tpu.diffusion.models.nextstep.pipeline import (
    NextStep11Pipeline,
)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def cfg():
    return NextStepArchConfig.tiny()


@pytest.fixture(scope="module")
def params(cfg):
    return ns.init_params(cfg, jax.random.PRNGKey(0))


# --------------------------------------------------------------- heads
def _torch_flow_head(cfg, p, x, t, c):
    """Replica of SimpleMLPAdaLN.forward (reference
    modeling_nextstep_heads.py: ResBlock adaLN-MLP stack + FinalLayer)
    over the same parameter tensors."""
    import math

    tp = {
        k: torch.from_numpy(np.asarray(v, np.float32))
        for k, v in p.items()
        if k.startswith("fh_")
    }
    x = torch.from_numpy(np.asarray(x, np.float32))
    t = torch.from_numpy(np.asarray(t, np.float32))
    c = torch.from_numpy(np.asarray(c, np.float32))

    half = 128
    freqs = torch.exp(
        -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
    )
    targ = t[:, None] * freqs[None]
    temb = torch.cat([torch.cos(targ), torch.sin(targ)], -1)
    temb = torch.nn.functional.silu(temb @ tp["fh_t_w1"] + tp["fh_t_b1"])
    temb = temb @ tp["fh_t_w2"] + tp["fh_t_b2"]
    y = temb + (c @ tp["fh_c_w"] + tp["fh_c_b"])

    def rms(h, w):
        v = h.pow(2).mean(-1, keepdim=True)
        return w * (h * torch.rsqrt(v + 1e-6))

    h = x @ tp["fh_in_w"] + tp["fh_in_b"]
    for li in range(cfg.fm_head_layers):
        ada = (
            torch.nn.functional.silu(y) @ tp["fh_ada_w"][li]
            + tp["fh_ada_b"][li]
        )
        sh, sc, gate = ada.chunk(3, -1)
        n = rms(h, tp["fh_ln"][li]) * (1 + sc) + sh
        n = torch.nn.functional.silu(n @ tp["fh_w1"][li] + tp["fh_b1"][li])
        h = h + gate * (n @ tp["fh_w2"][li] + tp["fh_b2"][li])
    ada = (
        torch.nn.functional.silu(y) @ tp["fh_fin_ada_w"]
        + tp["fh_fin_ada_b"]
    )
    sh, sc = ada.chunk(2, -1)
    v = h.pow(2).mean(-1, keepdim=True)
    n = (h * torch.rsqrt(v + 1e-6)) * (1 + sc) + sh
    return (n @ tp["fh_fin_w"] + tp["fh_fin_b"]).numpy()


def test_flow_head_matches_torch_replica(cfg, params):
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (3, cfg.token_dim))
    t = jnp.asarray([0.1, 0.5, 0.9])
    c = jax.random.normal(jax.random.PRNGKey(2), (3, cfg.hidden_size))
    ours = np.asarray(ns.flow_head_velocity(cfg, params, x, t, c))
    ref = _torch_flow_head(cfg, params, x, t, c)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_flow_sample_shapes_and_cfg(cfg, params):
    c = jax.random.normal(jax.random.PRNGKey(3), (2, cfg.hidden_size))
    out = ns.flow_head_sample(
        cfg, params, c, jax.random.PRNGKey(4), 3.0, num_steps=4
    )
    assert out.shape == (1, cfg.token_dim)
    # no-CFG path: batch stays as-is
    out1 = ns.flow_head_sample(
        cfg, params, c[:1], jax.random.PRNGKey(4), 1.0, num_steps=4
    )
    assert out1.shape == (1, cfg.token_dim)
    assert np.isfinite(np.asarray(out)).all()


def test_timesteps_shift_warps_schedule():
    # the warp t/(s-(s-1)t) keeps the endpoints and bends the interior
    ts = np.linspace(0.0, 1.0, 5)
    s = 3.0
    warped = ts / (s - (s - 1) * ts)
    assert warped[0] == 0.0 and abs(warped[-1] - 1.0) < 1e-9
    assert (warped[1:-1] < ts[1:-1]).all()


# --------------------------------------------------------------- trunk
def test_trunk_incremental_matches_full(cfg, params):
    """Token-by-token decode against the dense cache equals one full
    forward (the AR-feedback correctness invariant)."""
    b, s = 1, 6
    x = jax.random.normal(
        jax.random.PRNGKey(5), (b, s, cfg.hidden_size)
    ) * 0.1
    nk, d = cfg.num_key_value_heads, cfg.head_dim
    kv_k = jnp.zeros((cfg.num_hidden_layers, b, s, nk * d))
    kv_v = jnp.zeros_like(kv_k)
    pos = jnp.arange(s)[None]
    full, _, _ = ns.trunk_forward(cfg, params, x, pos, kv_k, kv_v, 0)

    kv_k = jnp.zeros_like(kv_k)
    kv_v = jnp.zeros_like(kv_v)
    outs = []
    for i in range(s):
        h, kv_k, kv_v = ns.trunk_forward(
            cfg, params, x[:, i : i + 1], pos[:, i : i + 1], kv_k, kv_v, i
        )
        outs.append(h[:, 0])
    inc = jnp.stack(outs, 1)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(inc), rtol=2e-4, atol=2e-4
    )


def test_patchify_roundtrip():
    cfg = NextStepArchConfig(latent_channels=4, latent_patch_size=2)
    lat = jax.random.normal(jax.random.PRNGKey(6), (4, 6, 4))
    toks = ns.patchify(cfg, lat)
    assert toks.shape == (2 * 3, 4 * 4)
    back = ns.unpatchify(cfg, toks, 2, 3)
    np.testing.assert_allclose(np.asarray(back), np.asarray(lat))


def test_generate_latents_deterministic_and_cfg_batch(cfg, params):
    ids = jnp.arange(8, dtype=jnp.int32)
    out1 = ns.generate_image_latents(
        cfg, params, ids, ids, grid=(2, 2), key=jax.random.PRNGKey(7),
        cfg_scale=2.0, flow_steps=3,
    )
    out2 = ns.generate_image_latents(
        cfg, params, ids, ids, grid=(2, 2), key=jax.random.PRNGKey(7),
        cfg_scale=2.0, flow_steps=3,
    )
    assert out1.shape == (4, cfg.token_dim)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    # different negative prompt must change the result under CFG
    out3 = ns.generate_image_latents(
        cfg, params, ids, ids[::-1], grid=(2, 2),
        key=jax.random.PRNGKey(7), cfg_scale=2.0, flow_steps=3,
    )
    assert np.abs(np.asarray(out1) - np.asarray(out3)).max() > 1e-6


# ------------------------------------------------------------- pipeline
def test_pipeline_e2e():
    pipe = NextStep11Pipeline(flow_steps=2)
    down = pipe.vae_cfg.spatial_ratio * pipe.arch.latent_patch_size
    sp = DiffusionSamplingParams(
        height=4 * down, width=4 * down, guidance_scale=2.0, seed=0,
        num_inference_steps=1,
    )

    class _P:
        text = "a red square"
        negative_text = "blurry"

    img, state = pipe.generate_prompt(_P(), sp)
    assert img is not None
    assert img.shape == (4 * down, 4 * down, 3)
    assert np.isfinite(img).all() and img.min() >= 0.0 and img.max() <= 1.0


def test_pipeline_linear_cfg_schedule():
    pipe = NextStep11Pipeline(flow_steps=2, cfg_schedule="linear")
    down = pipe.vae_cfg.spatial_ratio * pipe.arch.latent_patch_size
    sp = DiffusionSamplingParams(
        height=2 * down, width=2 * down, guidance_scale=3.0, seed=1,
        num_inference_steps=1,
    )

    class _P:
        text = "x"
        negative_text = None

    img, _ = pipe.generate_prompt(_P(), sp)
    assert np.isfinite(img).all()


def test_registry_row():
    from ht_vllm_omni_tpu.diffusion.registry import create_pipeline

    cfg = OmniDiffusionConfig()
    cfg.family = "nextstep-1.1"
    cfg.family_options = {"flow_steps": 2}
    pipe = create_pipeline(cfg)
    assert isinstance(pipe, NextStep11Pipeline)
