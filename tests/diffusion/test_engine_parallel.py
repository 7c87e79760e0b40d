"""Diffusion parallelism THROUGH DiffusionEngine (VERDICT r4 #1/#2).

Every request served by DiffusionEngine must be able to run in-mesh:
the engine builds a cfg x sp x tp Mesh from OmniDiffusionConfig.parallel
(diffusion/parallel.py build_context), supporting pipelines shard their
DiT weights over it, and denoise steps execute inside jit(shard_map(...))
— the TPU analog of the reference's DiffusionWorker.init_device ->
initialize_model_parallel (diffusion/worker/diffusion_worker.py:100-144).
Parity is asserted against the single-device engine on the virtual
8-device CPU mesh.
"""

import numpy as np

import jax
import pytest

from ht_vllm_omni_tpu.diffusion.data import (
    DiffusionParallelConfig,
    DiffusionSamplingParams,
    DiTArchConfig,
    OmniDiffusionConfig,
)
from ht_vllm_omni_tpu.diffusion.diffusion_engine import DiffusionEngine
from ht_vllm_omni_tpu.diffusion.models.qwen_image.config import (
    QwenImageArchConfig,
    QwenImageVAEConfig,
)
from ht_vllm_omni_tpu.inputs import OmniPrompt


def _qwen_cfg(parallel=None, **popts):
    return OmniDiffusionConfig(
        family="qwen-image",
        family_options={
            "arch": QwenImageArchConfig.tiny().__class__(
                in_channels=16, out_channels=4, num_layers=2,
                attention_head_dim=32, num_attention_heads=4,
                joint_attention_dim=64, axes_dims_rope=(8, 12, 12),
                dtype="float32",
            ),
            "vae_cfg": QwenImageVAEConfig.tiny(),
        },
        parallel=parallel or DiffusionParallelConfig(**popts),
        seed=3,
    )


def _run(engine, size="32x32", steps=3, guidance=4.0, seed=11):
    engine.add_request(
        OmniPrompt(
            text="a red fox",
            additional_information={
                "size": size, "num_inference_steps": steps,
                "guidance_scale": guidance, "seed": seed,
            },
        ),
        request_id="r",
    )
    out = engine.step()[0]
    assert out.finished and out.error is None, out.error
    return np.asarray(out.multimodal_output["image"], np.int32)


def test_engine_qwen_image_sp2_cfg2_parity():
    ref = _run(DiffusionEngine(_qwen_cfg()))
    eng = DiffusionEngine(
        _qwen_cfg(cfg_parallel_size=2, ulysses_size=2)
    )
    assert eng.parallel is not None and eng.parallel.world_size == 4
    par = _run(eng)
    assert par.shape == ref.shape
    # identical math modulo collective reduction order; one uint8 step
    assert np.max(np.abs(par - ref)) <= 2


def test_engine_qwen_image_sp2_cfg2_tp2_parity():
    ref = _run(DiffusionEngine(_qwen_cfg()))
    eng = DiffusionEngine(
        _qwen_cfg(
            cfg_parallel_size=2, ulysses_size=2, tensor_parallel_size=2
        )
    )
    assert eng.parallel.world_size == 8
    par = _run(eng)
    assert np.max(np.abs(par - ref)) <= 2


def test_engine_qwen_image_guidance_off_with_cfg_axis():
    """cfg axis active but guidance <= 1: both shards run the positive
    branch and the g=1 combine is the identity."""
    ref = _run(DiffusionEngine(_qwen_cfg()), guidance=1.0)
    par = _run(
        DiffusionEngine(_qwen_cfg(cfg_parallel_size=2, ulysses_size=2)),
        guidance=1.0,
    )
    assert np.max(np.abs(par - ref)) <= 2


def test_engine_generic_sp2_cfg2_parity():
    arch = DiTArchConfig(
        hidden_size=64, num_layers=2, num_heads=4, patch_size=2,
        in_channels=4, cond_dim=64, vocab_size=64, dtype="float32",
    )
    sp = dict(size="32x32", steps=4, guidance=3.0, seed=7)
    ref = _run(DiffusionEngine(OmniDiffusionConfig(arch=arch)), **sp)
    eng = DiffusionEngine(
        OmniDiffusionConfig(
            arch=arch,
            parallel=DiffusionParallelConfig(
                cfg_parallel_size=2, ulysses_size=2
            ),
        )
    )
    par = _run(eng, **sp)
    assert np.max(np.abs(par - ref)) <= 2


def test_fsdp_weight_sharding_cuts_per_device_bytes():
    """HSDP-equivalent: stacked DiT leaves shard over cfg x sp (and tp),
    so per-device weight bytes ~= total/N (reference hsdp.py:88,177)."""
    eng = DiffusionEngine(
        _qwen_cfg(
            parallel=DiffusionParallelConfig(
                cfg_parallel_size=2, ulysses_size=2,
                tensor_parallel_size=2, fsdp_weights=True,
            )
        )
    )
    tx = eng.pipeline.params["transformer"]
    big = tx["img_qkv_w"]  # [L, d, 3, H, hd]
    local = big.addressable_shards[0].data.size
    assert local * 8 == big.size, (local, big.size)
    # mlp leaves shard over fsdp x tp as well
    w1 = tx["img_mlp_w1"]
    assert w1.addressable_shards[0].data.size * 8 == w1.size
    # parity still holds with fsdp gathering in the scan
    ref = _run(DiffusionEngine(_qwen_cfg()))
    par = _run(eng)
    assert np.max(np.abs(par - ref)) <= 2


def _wan_cfg(**popts):
    from ht_vllm_omni_tpu.diffusion.models.wan_video.config import (
        WanVideoArchConfig,
        WanVideoVAEConfig,
    )

    return OmniDiffusionConfig(
        family="wan2.2",
        family_options={
            "arch": WanVideoArchConfig.tiny(),
            "vae_cfg": WanVideoVAEConfig.tiny(),
            "boundary_ratio": 0.7,
        },
        parallel=DiffusionParallelConfig(**popts),
        seed=5,
    )


def _run_video(engine, steps=3, guidance=4.0):
    engine.add_request(
        OmniPrompt(
            text="a running fox",
            additional_information={
                "size": "32x32", "num_inference_steps": steps,
                "guidance_scale": guidance, "seed": 2, "num_frames": 4,
            },
        ),
        request_id="v",
    )
    out = engine.step()[0]
    assert out.finished and out.error is None, out.error
    return np.asarray(out.multimodal_output["video"], np.int32)


def test_engine_wan_video_sp2_cfg2_tp2_parity():
    """Wan2.2 (video DiT, dual noise experts) serves in-mesh through
    DiffusionEngine: cfg2 x sp2 x tp2 with distributed q/k norms must
    match the single-device engine (VERDICT r4 #2)."""
    ref = _run_video(DiffusionEngine(_wan_cfg()))
    eng = DiffusionEngine(
        _wan_cfg(
            cfg_parallel_size=2, ulysses_size=2, tensor_parallel_size=2
        )
    )
    assert eng.parallel.world_size == 8
    par = _run_video(eng)
    assert par.shape == ref.shape
    assert np.max(np.abs(par - ref)) <= 2


def test_wan_shaped_big_arch_fsdp_spans_mesh():
    """A Wan-shaped big arch (scaled to fit the CPU test) runs on the
    8-dev mesh with per-device DiT weight bytes ~= total/8 — the HSDP
    story that lets a 14B Wan DiT span chips (reference hsdp.py:88,177).
    """
    from ht_vllm_omni_tpu.diffusion.models.wan_video.config import (
        WanVideoArchConfig,
        WanVideoVAEConfig,
    )

    arch = WanVideoArchConfig.tiny().__class__(
        **{
            **WanVideoArchConfig.tiny().__dict__,
            "num_layers": 4,
            "num_attention_heads": 4,
        }
    )
    cfg = OmniDiffusionConfig(
        family="wan2.2",
        family_options={
            "arch": arch, "vae_cfg": WanVideoVAEConfig.tiny(),
            "boundary_ratio": None,
        },
        parallel=DiffusionParallelConfig(
            cfg_parallel_size=2, ulysses_size=2, tensor_parallel_size=2,
            fsdp_weights=True,
        ),
        seed=1,
    )
    eng = DiffusionEngine(cfg)
    tx = eng.pipeline.params["transformer"]
    for leaf in ("qkv_w", "ffn_w1", "ffn_w2", "attn_out_w"):
        arr = tx[leaf]
        local = arr.addressable_shards[0].data.size
        assert local * 8 == arr.size, (leaf, local, arr.size)
    # and it still serves a request end to end
    vid = _run_video(eng, steps=2, guidance=1.0)
    assert np.isfinite(vid.astype(np.float32)).all()


def test_unsupported_family_with_parallel_raises():
    cfg = OmniDiffusionConfig(
        family="z-image",
        parallel=DiffusionParallelConfig(ulysses_size=2),
    )
    with pytest.raises(ValueError, match="does not support parallel"):
        DiffusionEngine(cfg)


def test_uneven_tokens_for_sp_raises():
    eng = DiffusionEngine(_qwen_cfg(ulysses_size=8, cfg_parallel_size=1))
    eng.add_request(
        OmniPrompt(
            text="x",
            additional_information={
                "size": "12x12", "num_inference_steps": 2,
            },
        ),
        request_id="r",
    )
    out = eng.step()[0]
    assert out.error is not None and "divisible" in out.error


def test_pipefusion_warm_step_exact_and_multistep_close():
    """Diffusion pipeline parallelism (PipeFusion, VERDICT r4 #3):
    layers shard over the pp axis, patches pipeline with one-step-stale
    cross-patch KV (diffusion/distributed/pipefusion.py).  The warmup
    step is an exact full-sequence ring wave -> a 1-step run must match
    the single-device engine bit-for-bit (up to f32 reduction order);
    multi-step runs carry the documented staleness -> close, not equal.
    """
    arch = DiTArchConfig(
        hidden_size=64, num_layers=4, num_heads=4, patch_size=2,
        in_channels=4, cond_dim=64, vocab_size=64, dtype="float32",
    )

    def run(parallel, steps):
        eng = DiffusionEngine(
            OmniDiffusionConfig(arch=arch, parallel=parallel)
        )
        if parallel.pipeline_parallel_size > 1:
            assert eng.parallel.pp_size == parallel.pipeline_parallel_size
        return _run(eng, size="32x32", steps=steps, guidance=3.0, seed=4)

    single = DiffusionParallelConfig()
    pf = DiffusionParallelConfig(
        cfg_parallel_size=2, pipeline_parallel_size=4
    )
    # warm step only: exact
    ref1 = run(single, 1)
    got1 = run(pf, 1)
    assert np.max(np.abs(got1 - ref1)) <= 2
    # 4 steps: one-step-stale cross-patch KV — close
    ref4 = run(single, 4).astype(np.float32)
    got4 = run(pf, 4).astype(np.float32)
    rel = np.abs(got4 - ref4).mean() / max(ref4.std(), 1e-6)
    assert np.isfinite(got4).all()
    assert rel < 0.25, rel


def test_pipefusion_requires_cfg2():
    import pytest as _pytest

    arch = DiTArchConfig(
        hidden_size=32, num_layers=2, num_heads=2, patch_size=2,
        in_channels=4, cond_dim=32, vocab_size=64, dtype="float32",
    )
    with _pytest.raises(ValueError, match="cfg_parallel_size=2"):
        DiffusionEngine(
            OmniDiffusionConfig(
                arch=arch,
                parallel=DiffusionParallelConfig(
                    pipeline_parallel_size=2
                ),
            )
        )


def test_engine_wan_i2v_per_token_timesteps_parallel():
    """Wan TI2V first-frame conditioning uses PER-TOKEN timesteps
    (frame-0 tokens run at t=0); under cfg2 x sp2 the [B, S] timestep
    grid shards over cfg and slices over sp inside the forward."""
    ref_eng = DiffusionEngine(_wan_cfg())
    par_eng = DiffusionEngine(
        _wan_cfg(cfg_parallel_size=2, ulysses_size=2)
    )
    img = (np.arange(32 * 32 * 3).reshape(32, 32, 3) % 255).astype(
        np.uint8
    )

    def run(engine):
        engine.add_request(
            OmniPrompt(
                text="a fox starts running",
                multi_modal_data={"image": img},
                additional_information={
                    "size": "32x32", "num_inference_steps": 2,
                    "guidance_scale": 4.0, "seed": 3, "num_frames": 4,
                },
            ),
            request_id="i2v",
        )
        out = engine.step()[0]
        assert out.finished and out.error is None, out.error
        return np.asarray(out.multimodal_output["video"], np.int32)

    ref = run(ref_eng)
    par = run(par_eng)
    assert par.shape == ref.shape
    assert np.max(np.abs(par - ref)) <= 2


def test_engine_flux_sp2_cfg2_tp2_parity():
    """Flux (dual-stream + single-stream MMDiT) serves in-mesh through
    DiffusionEngine: cfg2 x sp2 x tp2 with the split row-parallel
    single-block output must match the single-device engine."""
    from ht_vllm_omni_tpu.diffusion.models.flux.config import (
        FluxArchConfig,
    )

    def cfgf(**popts):
        return OmniDiffusionConfig(
            family="flux",
            family_options={
                "arch": FluxArchConfig.tiny(),
                "vae_cfg": QwenImageVAEConfig.tiny(),
            },
            parallel=DiffusionParallelConfig(**popts),
            seed=7,
        )

    ref = _run(DiffusionEngine(cfgf()), steps=2)
    eng = DiffusionEngine(
        cfgf(cfg_parallel_size=2, ulysses_size=2, tensor_parallel_size=2)
    )
    assert eng.parallel.world_size == 8
    par = _run(eng, steps=2)
    assert par.shape == ref.shape
    assert np.max(np.abs(par - ref)) <= 2


def test_engine_sd35_sp2_cfg2_parity():
    """SD3.5 (dual-attention layers + qk_norm) serves in-mesh under
    cfg2 x sp2 (weights replicated; txt-first concat reorders through
    the permutation-invariant Ulysses joint attention)."""
    from ht_vllm_omni_tpu.diffusion.models.sd3.config import SD3ArchConfig

    def cfgs(**popts):
        return OmniDiffusionConfig(
            family="sd3.5",
            family_options={
                "arch": SD3ArchConfig.tiny(
                    qk_norm="rms_norm", dual_attention_layers=(0,)
                ),
                "vae_cfg": QwenImageVAEConfig.tiny(),
            },
            parallel=DiffusionParallelConfig(**popts),
            seed=9,
        )

    ref = _run(DiffusionEngine(cfgs()), steps=2)
    eng = DiffusionEngine(cfgs(cfg_parallel_size=2, ulysses_size=2))
    assert eng.parallel.world_size == 4
    par = _run(eng, steps=2)
    assert par.shape == ref.shape
    assert np.max(np.abs(par - ref)) <= 2
