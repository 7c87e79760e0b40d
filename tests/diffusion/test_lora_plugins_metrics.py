"""Diffusion LoRA manager (merge/unmerge, LRU), plugin loader, and
stage-duration metrics."""

import numpy as np
import pytest

import jax

from ht_vllm_omni_tpu.diffusion.data import (
    DiffusionSamplingParams,
    OmniDiffusionConfig,
)
from ht_vllm_omni_tpu.diffusion.diffusion_engine import DiffusionEngine
from ht_vllm_omni_tpu.diffusion.lora import DiffusionLoRAManager
from ht_vllm_omni_tpu.inputs import OmniPrompt


def _pipe():
    from ht_vllm_omni_tpu.diffusion.registry import create_pipeline

    cfg = OmniDiffusionConfig()
    cfg.family = "z-image"
    return create_pipeline(cfg)


def test_lora_merge_unmerge_exact():
    pipe = _pipe()
    mgr = DiffusionLoRAManager(pipe)
    # pick a real transformer leaf
    comp = pipe.params["transformer"]
    key = next(
        k for k, v in comp.items()
        if getattr(v, "ndim", 0) == 2 and v.shape[0] >= 4
    )
    base = np.asarray(comp[key], np.float32).copy()
    rng = np.random.default_rng(0)
    a = rng.normal(size=(base.shape[0], 2)).astype(np.float32)
    b = rng.normal(size=(2, base.shape[1])).astype(np.float32)
    mgr.register("style", {f"transformer/{key}": (a, b, 0.5)})

    mgr.activate("style")
    merged = np.asarray(pipe.params["transformer"][key], np.float32)
    np.testing.assert_allclose(
        merged, base + 0.5 * (a @ b), rtol=1e-5, atol=1e-6
    )
    mgr.deactivate()
    restored = np.asarray(pipe.params["transformer"][key], np.float32)
    np.testing.assert_allclose(restored, base, rtol=1e-5, atol=1e-5)
    assert mgr.active is None


def test_lora_switch_and_lru():
    pipe = _pipe()
    mgr = DiffusionLoRAManager(pipe, max_cpu_adapters=2)
    comp = pipe.params["transformer"]
    key = next(
        k for k, v in comp.items() if getattr(v, "ndim", 0) == 2
    )
    shp = comp[key].shape
    for i, name in enumerate(["a1", "a2", "a3"]):
        mgr.register(name, {
            f"transformer/{key}": (
                np.full((shp[0], 1), 0.01 * (i + 1), np.float32),
                np.ones((1, shp[1]), np.float32), 1.0,
            ),
        })
    # LRU evicted a1
    assert "a1" not in mgr._cache and len(mgr._cache) == 2
    base = np.asarray(comp[key], np.float32).copy()
    mgr.activate("a2")
    mgr.activate("a3")  # auto-deactivates a2 first
    merged = np.asarray(pipe.params["transformer"][key], np.float32)
    np.testing.assert_allclose(
        merged, base + 0.03, rtol=1e-4, atol=1e-5
    )
    with pytest.raises(KeyError):
        mgr.activate("a1")


def test_lora_safetensors_roundtrip(tmp_path):
    from safetensors.numpy import save_file

    pipe = _pipe()
    comp = pipe.params["transformer"]
    key = next(
        k for k, v in comp.items() if getattr(v, "ndim", 0) == 2
    )
    shp = comp[key].shape
    rng = np.random.default_rng(1)
    a = rng.normal(size=(shp[0], 2)).astype(np.float32)
    b = rng.normal(size=(2, shp[1])).astype(np.float32)
    path = str(tmp_path / "adapter.safetensors")
    save_file(
        {f"transformer/{key}:lora_a": a, f"transformer/{key}:lora_b": b},
        path, metadata={"alpha": "4", "r": "2"},
    )
    mgr = DiffusionLoRAManager(pipe)
    mgr.load("file", path)
    base = np.asarray(comp[key], np.float32).copy()
    mgr.activate("file")
    merged = np.asarray(pipe.params["transformer"][key], np.float32)
    np.testing.assert_allclose(
        merged, base + 2.0 * (a @ b), rtol=1e-4, atol=1e-5
    )


def test_plugin_loader_respects_allowlist(monkeypatch):
    from ht_vllm_omni_tpu.utils import plugins

    calls = []

    class _EP:
        def __init__(self, name):
            self.name = name

        def load(self):
            return lambda: calls.append(self.name)

    monkeypatch.setattr(
        "importlib.metadata.entry_points",
        lambda group=None: [_EP("good"), _EP("skipped")],
    )
    monkeypatch.setenv("HT_VLLM_OMNI_TPU_PLUGINS", "good")
    loaded = plugins.load_general_plugins(force=True)
    assert loaded == ["good"] and calls == ["good"]


def test_engine_reports_stage_durations():
    pipe = _pipe()
    cfg = OmniDiffusionConfig()
    eng = DiffusionEngine(
        cfg, pipeline=pipe,
        default_params=DiffusionSamplingParams(
            height=32, width=32, num_inference_steps=2,
            guidance_scale=1.0, seed=0,
        ),
    )
    eng.add_request(OmniPrompt(text="a tree"))
    outs = []
    while eng.has_unfinished_requests():
        outs.extend(eng.step())
    final = outs[-1]
    assert final.finished
    sd = final.metrics["stage_durations"]
    assert sd["denoise_s"] > 0 and sd["calls"] >= 1
