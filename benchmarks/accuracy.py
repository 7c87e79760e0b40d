"""Perceptual accuracy checker for quantized / cached image outputs.

Counterpart of the reference's LPIPS harness (reference tests/e2e/
offline_inference/compute_lpips.py — BF16-vs-FP8 pairs scored with a
pretrained LPIPS net and a pass/fail threshold).  This host has no
pretrained perceptual weights, so the default metric is a
self-contained multi-scale structural distance (SSIM-based, pure
numpy); when the ``lpips`` package + weights are available the same
harness calls through to it.

Usage:
    python benchmarks/accuracy.py --image-dir ./outputs \
        --baseline-suffix _bf16.npy --candidate-suffix _fp8.npy

Accepts .npy ([H, W, 3] float in [0, 1] or uint8) or .png pairs and
prints a Markdown table with PASS/FAIL per model.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


# ----------------------------------------------------------------- metric
def _to_gray(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img, np.float64)
    if img.max() > 1.5:
        img = img / 255.0
    if img.ndim == 3:
        img = img @ np.array([0.299, 0.587, 0.114])
    return img


def _box(img: np.ndarray, r: int = 3) -> np.ndarray:
    """Box filter via cumulative sums (no scipy)."""
    pad = np.pad(img, r, mode="reflect")
    c = np.cumsum(np.cumsum(pad, 0), 1)
    c = np.pad(c, ((1, 0), (1, 0)))
    k = 2 * r + 1
    h, w = img.shape
    s = (
        c[k : k + h, k : k + w]
        - c[:h, k : k + w]
        - c[k : k + h, :w]
        + c[:h, :w]
    )
    return s / (k * k)


def ssim(a: np.ndarray, b: np.ndarray) -> float:
    """Mean SSIM on grayscale (Wang et al. constants)."""
    a, b = _to_gray(a), _to_gray(b)
    c1, c2 = 0.01**2, 0.03**2
    mu_a, mu_b = _box(a), _box(b)
    va = _box(a * a) - mu_a**2
    vb = _box(b * b) - mu_b**2
    cov = _box(a * b) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (va + vb + c2)
    )
    return float(s.mean())


def perceptual_distance(a: np.ndarray, b: np.ndarray) -> float:
    """Multi-scale structural distance in [0, 2]: 1 - mean SSIM across
    3 dyadic scales (lower = more similar; plays the role of the
    reference's LPIPS score when no pretrained net is available)."""
    total, scales = 0.0, 0
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    for _ in range(3):
        total += 1.0 - ssim(a, b)
        scales += 1
        if min(a.shape[0], a.shape[1]) < 32:
            break
        a = a[: a.shape[0] // 2 * 2, : a.shape[1] // 2 * 2]
        b = b[: b.shape[0] // 2 * 2, : b.shape[1] // 2 * 2]
        a = (a[0::2, 0::2] + a[1::2, 1::2]) / 2
        b = (b[0::2, 0::2] + b[1::2, 1::2]) / 2
    return total / scales


def lpips_or_fallback(a: np.ndarray, b: np.ndarray, net="alex") -> tuple[str, float]:
    """Prefer real LPIPS when installed; fall back to the structural
    distance."""
    try:
        import lpips  # noqa: F401
        import torch

        loss = lpips.LPIPS(net=net).eval()

        def prep(x):
            x = np.asarray(x, np.float32)
            if x.max() > 1.5:
                x = x / 255.0
            t = torch.from_numpy(x).permute(2, 0, 1)[None]
            return t * 2 - 1

        with torch.no_grad():
            return "lpips", float(loss(prep(a), prep(b)).item())
    except Exception:
        return "msssim-dist", perceptual_distance(a, b)


# ---------------------------------------------------------------- harness
def _load(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path)
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


def run(image_dir: str, baseline_suffix: str, candidate_suffix: str,
        threshold: float) -> int:
    pairs = []
    for f in sorted(os.listdir(image_dir)):
        if f.endswith(baseline_suffix):
            model = f[: -len(baseline_suffix)]
            cand = os.path.join(image_dir, model + candidate_suffix)
            if os.path.exists(cand):
                pairs.append((model, os.path.join(image_dir, f), cand))
    if not pairs:
        print("no pairs found", file=sys.stderr)
        return 2
    print("| model | metric | distance | verdict |")
    print("|---|---|---|---|")
    worst = 0.0
    for model, b_path, c_path in pairs:
        metric, d = lpips_or_fallback(_load(b_path), _load(c_path))
        worst = max(worst, d)
        verdict = "PASS" if d <= threshold else "FAIL"
        print(f"| {model} | {metric} | {d:.4f} | {verdict} |")
    return 0 if worst <= threshold else 1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-dir", required=True)
    ap.add_argument("--baseline-suffix", default="_bf16.npy")
    ap.add_argument("--candidate-suffix", default="_fp8.npy")
    ap.add_argument("--threshold", type=float, default=0.1)
    a = ap.parse_args()
    sys.exit(run(a.image_dir, a.baseline_suffix, a.candidate_suffix,
                 a.threshold))


if __name__ == "__main__":
    main()
