"""Perceptual accuracy harness (benchmarks/accuracy.py): metric sanity
and an end-to-end bf16-vs-int8 image comparison through a real
pipeline."""

import subprocess
import sys

import numpy as np

sys.path.insert(0, "benchmarks")
from accuracy import perceptual_distance, run, ssim  # noqa: E402


def test_ssim_basics():
    rng = np.random.default_rng(0)
    a = rng.random((64, 64, 3))
    assert ssim(a, a) > 0.999
    assert ssim(a, 1 - a) < 0.2
    # small noise stays close
    b = np.clip(a + rng.normal(0, 0.01, a.shape), 0, 1)
    assert ssim(a, b) > 0.9


def test_perceptual_distance_orders_corruptions():
    rng = np.random.default_rng(1)
    img = rng.random((128, 128, 3))
    slight = np.clip(img + rng.normal(0, 0.005, img.shape), 0, 1)
    heavy = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1)
    d0 = perceptual_distance(img, img)
    d1 = perceptual_distance(img, slight)
    d2 = perceptual_distance(img, heavy)
    assert d0 < 1e-6 < d1 < d2


def test_harness_table_and_exit_codes(tmp_path):
    rng = np.random.default_rng(2)
    base = rng.random((64, 64, 3)).astype(np.float32)
    np.save(tmp_path / "m1_bf16.npy", base)
    np.save(
        tmp_path / "m1_fp8.npy",
        np.clip(base + rng.normal(0, 0.002, base.shape), 0, 1).astype(
            np.float32
        ),
    )
    np.save(tmp_path / "m2_bf16.npy", base)
    np.save(
        tmp_path / "m2_fp8.npy",
        rng.random((64, 64, 3)).astype(np.float32),
    )
    assert run(str(tmp_path), "_bf16.npy", "_fp8.npy", 0.05) == 1
    # tight pair alone passes
    (tmp_path / "m2_bf16.npy").unlink()
    (tmp_path / "m2_fp8.npy").unlink()
    assert run(str(tmp_path), "_bf16.npy", "_fp8.npy", 0.05) == 0


def test_cli_runs(tmp_path):
    rng = np.random.default_rng(3)
    base = rng.random((32, 32, 3)).astype(np.float32)
    np.save(tmp_path / "z_bf16.npy", base)
    np.save(tmp_path / "z_fp8.npy", base)
    import os

    out = subprocess.run(
        [sys.executable, "benchmarks/accuracy.py", "--image-dir",
         str(tmp_path)],
        capture_output=True, text=True,
        env=dict(os.environ, HT_OMNI_PLATFORM="cpu"),
    )
    assert out.returncode == 0, out.stderr
    assert "| z |" in out.stdout and "PASS" in out.stdout
