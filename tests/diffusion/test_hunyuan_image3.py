"""HunyuanImage-3 family: UNet patch-embed/final-layer parity vs a
torch replica, MoE routing invariants, 2D rope layout, text-KV reuse
equivalence, pipeline e2e, registry."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.diffusion.data import (
    DiffusionSamplingParams,
    OmniDiffusionConfig,
)
from ht_vllm_omni_tpu.diffusion.models.hunyuan_image3 import model as hy
from ht_vllm_omni_tpu.diffusion.models.hunyuan_image3.config import (
    HunyuanImage3ArchConfig,
)
from ht_vllm_omni_tpu.diffusion.models.hunyuan_image3.pipeline import (
    HunyuanImage3Pipeline,
)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def cfg():
    return HunyuanImage3ArchConfig.tiny()


@pytest.fixture(scope="module")
def params(cfg):
    return hy.init_params(cfg, jax.random.PRNGKey(0))


# --------------------------------------------------------------- resblock
def _torch_res_block(p, x, emb):
    """Replica of the reference ResBlock forward (adaptive GroupNorm,
    hunyuan_image_3_transformer.py:2845-2935) on NHWC numpy params."""
    import torch.nn.functional as F

    tp = {
        k: (torch.from_numpy(np.asarray(v, np.float32))
            if v is not None else None)
        for k, v in p.items()
    }
    x = torch.from_numpy(np.asarray(x, np.float32)).permute(0, 3, 1, 2)
    emb = torch.from_numpy(np.asarray(emb, np.float32))

    def gn(t, g, b):
        groups = min(32, t.shape[1])
        return F.group_norm(t, groups, g, b, eps=1e-5)

    def conv(t, w, b):
        return F.conv2d(t, w.permute(3, 2, 0, 1), b,
                        padding=(w.shape[0] - 1) // 2)

    h = conv(F.silu(gn(x, tp["n1_g"], tp["n1_b"])), tp["c1"], tp["c1_b"])
    eo = F.silu(emb) @ tp["emb_w"] + tp["emb_b"]
    scale, shift = eo.chunk(2, -1)
    h = gn(h, tp["n2_g"], tp["n2_b"]) * (
        1.0 + scale[:, :, None, None]
    ) + shift[:, :, None, None]
    h = conv(F.silu(h), tp["c2"], tp["c2_b"])
    skip = x if tp["skip"] is None else conv(x, tp["skip"], tp["skip_b"])
    return (skip + h).permute(0, 2, 3, 1).numpy()


def test_res_block_matches_torch(cfg, params):
    # use the final-layer ResBlock (h -> patch_embed_hidden_dim, has skip)
    p = params["fl_res"]
    x = jax.random.normal(
        jax.random.PRNGKey(1), (1, 4, 4, cfg.hidden_size)
    )
    emb = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.hidden_size))
    # give the zero-init conv real weights so the test is non-trivial
    p = dict(p)
    p["c2"] = jax.random.normal(
        jax.random.PRNGKey(3), p["c2"].shape
    ) * 0.05
    ours = np.asarray(hy._res_block(p, x, emb))
    ref = _torch_res_block(p, x, emb)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_patch_embed_final_layer_shapes(cfg, params):
    lat = jax.random.normal(
        jax.random.PRNGKey(4), (2, 3, 5, cfg.latent_channels)
    )
    temb = hy.time_embed(params["time_embed"], jnp.asarray([500.0, 500.0]))
    toks, th, tw = hy.patch_embed(cfg, params, lat, temb)
    assert (th, tw) == (3, 5)
    assert toks.shape == (2, 15, cfg.hidden_size)
    out = hy.final_layer(cfg, params, toks, temb, th, tw)
    assert out.shape == (2, 3, 5, cfg.latent_channels)


# -------------------------------------------------------------------- moe
def test_moe_matches_dense_sweep(cfg, params):
    """Grouped-GEMM MoE == explicit per-token top-k loop."""
    x = jax.random.normal(jax.random.PRNGKey(5), (6, cfg.hidden_size))
    ours = np.asarray(hy._moe(cfg, params, 0, x))

    xn = np.asarray(x, np.float32)
    router = np.asarray(params["router"][0], np.float32)
    logits = xn @ router
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    ref = np.zeros_like(xn)
    for t in range(xn.shape[0]):
        top = np.argsort(probs[t])[::-1][: cfg.moe_topk]
        w = probs[t][top]
        w = w / w.sum()
        for e, wi in zip(top, w):
            g = xn[t] @ np.asarray(params["egate"][0][e])
            u = xn[t] @ np.asarray(params["eup"][0][e])
            act = (g / (1 + np.exp(-g))) * u
            ref[t] += wi * (act @ np.asarray(params["edown"][0][e]))
    sg = xn @ np.asarray(params["sgate"][0])
    su = xn @ np.asarray(params["sup"][0])
    ref += ((sg / (1 + np.exp(-sg))) * su) @ np.asarray(
        params["sdown"][0]
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


# ------------------------------------------------------------------- rope
def test_rope_2d_layout(cfg):
    """Replicates reference build_2d_rope (:322-363): interleaved
    (y, x) frequencies, centred image grid."""
    s_text, (ht, wt) = 4, (2, 3)
    cos, sin = hy.build_rope_2d(cfg, s_text=s_text, grid=(ht, wt))
    d = cfg.head_dim
    assert cos.shape == (s_text + 1 + ht * wt, d // 2)

    theta = 1.0 / (cfg.rope_theta ** (np.arange(0, d, 2) / d))
    ll = s_text + 1
    beta_y = ll + (ht * wt - ht) / 2
    beta_x = ll + (ht * wt - wt) / 2
    # a text row: y = x = index
    i = 2
    idx = np.empty(d // 2)
    idx[0::2] = i * theta[0::2]
    idx[1::2] = i * theta[1::2]
    np.testing.assert_allclose(cos[i], np.cos(idx), rtol=1e-5)
    # image row (r, c): y = beta_y + r, x = beta_x + c
    r, c = 1, 2
    row = ll + r * wt + c
    idx[0::2] = (beta_y + r) * theta[0::2]
    idx[1::2] = (beta_x + c) * theta[1::2]
    np.testing.assert_allclose(cos[row], np.cos(idx), rtol=1e-5)
    np.testing.assert_allclose(sin[row], np.sin(idx), rtol=1e-5)


def test_masks():
    m, mq = hy.gen_image_masks(3, 4)
    s = 3 + 1 + 4
    assert m.shape == (s, s) and mq.shape == (1 + 4, s)
    # timestep row (index 3): sees text + itself, not image
    assert m[3, :4].all() and not m[3, 4:].any()
    # image rows: see everything
    assert m[4:].all()


# --------------------------------------------------------------- kv reuse
def test_text_kv_reuse_matches_full_forward(cfg, params):
    """denoise_step over the frozen text K/V must equal re-running the
    full [text, timestep, image] sequence at the new timestep."""
    s_text, grid = 4, (2, 2)
    n_img = grid[0] * grid[1]
    ids = jnp.arange(2 * s_text, dtype=jnp.int32).reshape(2, s_text) % 7
    cos, sin = hy.build_rope_2d(cfg, s_text, grid)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    mask, mask_q = hy.gen_image_masks(s_text, n_img)
    mask, mask_q = jnp.asarray(mask), jnp.asarray(mask_q)
    lat0 = jax.random.normal(
        jax.random.PRNGKey(6), (2, *grid, cfg.latent_channels)
    )
    t0 = jnp.asarray([800.0, 800.0])
    _, text_kv = hy.denoise_first(
        cfg, params, ids, lat0, t0, cos, sin, mask
    )

    lat1 = jax.random.normal(
        jax.random.PRNGKey(7), (2, *grid, cfg.latent_channels)
    )
    t1 = jnp.asarray([600.0, 600.0])
    via_cache = hy.denoise_step(
        cfg, params, lat1, t1, text_kv, cos[s_text:], sin[s_text:], mask_q
    )
    full, _ = hy.denoise_first(
        cfg, params, ids, lat1, t1, cos, sin, mask
    )
    np.testing.assert_allclose(
        np.asarray(via_cache), np.asarray(full), rtol=2e-4, atol=2e-4
    )


# ------------------------------------------------------------- pipeline
def test_pipeline_e2e():
    pipe = HunyuanImage3Pipeline()
    down = pipe.arch.vae_downsample_factor
    sp = DiffusionSamplingParams(
        height=4 * down, width=4 * down, num_inference_steps=2,
        guidance_scale=4.0, seed=0,
    )

    class _P:
        text = "an ink painting of mountains"
        negative_text = ""

    img, state = pipe.generate_prompt(_P(), sp)
    assert img is not None
    # tiny vae upsamples by its own spatial ratio from the latent grid
    r = pipe.vae_cfg.spatial_ratio
    assert img.shape == (4 * r, 4 * r, 3)
    assert np.isfinite(img).all() and img.min() >= 0.0 and img.max() <= 1.0
    assert state["step"] == 2


def test_pipeline_streaming_state():
    pipe = HunyuanImage3Pipeline()
    down = pipe.arch.vae_downsample_factor
    sp = DiffusionSamplingParams(
        height=2 * down, width=2 * down, num_inference_steps=3,
        guidance_scale=4.0, seed=1, stream_every=1,
    )

    class _P:
        text = "x"
        negative_text = ""

    out, state = pipe.generate_prompt(_P(), sp)
    assert out is None and state["step"] == 1
    out, state = pipe.generate_prompt(_P(), sp, state)
    assert out is None and state["step"] == 2
    out, state = pipe.generate_prompt(_P(), sp, state)
    assert out is not None


def test_registry_row():
    from ht_vllm_omni_tpu.diffusion.registry import create_pipeline

    cfg = OmniDiffusionConfig()
    cfg.family = "hunyuan-image-3"
    pipe = create_pipeline(cfg)
    assert isinstance(pipe, HunyuanImage3Pipeline)


def test_moe_expert_parallel_matches_unsharded():
    """Diffusion-side MoE EP (inventory 2.6): hunyuan-image-3's routed
    experts shard over an 'ep' mesh axis (local grouped GEMMs, globally
    routed ids, psum'd partials) and must match the unsharded block."""
    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from ht_vllm_omni_tpu.diffusion.models.hunyuan_image3 import model
    from ht_vllm_omni_tpu.diffusion.models.hunyuan_image3.config import (
        HunyuanImage3ArchConfig,
    )

    cfg = HunyuanImage3ArchConfig.tiny()
    p = model.init_params(cfg, jax.random.PRNGKey(0))
    x = jax.random.normal(
        jax.random.PRNGKey(1), (16, cfg.hidden_size), jnp.float32
    )
    ref = np.asarray(model._moe(cfg, p, 0, x))

    ep = 4
    assert cfg.num_experts % ep == 0
    mesh = Mesh(np.array(jax.devices()[:ep]), ("ep",))
    moe_keys = ("egate", "eup", "edown")
    specs = {
        k: (P(None, "ep") if k in moe_keys else P()) for k in p
    }

    def run(p, x):
        return model._moe(cfg, p, 0, x, ep_axis="ep")

    out = jax.jit(
        shard_map(
            run, mesh=mesh,
            in_specs=(specs, P()),
            out_specs=P(),
            check_vma=False,
        )
    )(p, x)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)
