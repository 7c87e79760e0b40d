"""Diffusion family latency benchmark.

Counterpart of the reference's diffusion performance dashboards
(reference benchmarks/diffusion/performance_dashboard/*.md — e.g.
Qwen-Image 512^2/20 steps mean latency on A100).  Measures end-to-end
and per-denoise-step latency for any registered family at a given
resolution/step count and prints ONE JSON line.

Usage:
    python benchmarks/diffusion_bench.py --family z-image \
        --size 512x512 --steps 20 [--model-path /ckpt] [--runs 3]

Without checkpoints the family runs its released architecture at
random init — latency then measures the SYSTEM (compile-cached denoise
loop, scheduler, VAE), not model quality.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="z-image")
    ap.add_argument("--size", default="512x512")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--guidance-scale", type=float, default=3.0)
    ap.add_argument("--model-path", default=None)
    ap.add_argument("--prompt", default="a lighthouse at dusk")
    args = ap.parse_args()

    from ht_vllm_omni_tpu.diffusion.data import (
        DiffusionSamplingParams,
        OmniDiffusionConfig,
    )
    from ht_vllm_omni_tpu.diffusion.registry import create_pipeline

    w, h = (int(v) for v in args.size.lower().split("x"))
    cfg = OmniDiffusionConfig()
    cfg.family = args.family
    cfg.model_path = args.model_path
    pipe = create_pipeline(cfg)

    class _P:
        text = args.prompt
        negative_text = None

    def one(seed: int) -> float:
        sp = DiffusionSamplingParams(
            height=h, width=w, num_inference_steps=args.steps,
            guidance_scale=args.guidance_scale, seed=seed,
        )
        t0 = time.time()
        if hasattr(pipe, "generate_prompt"):
            out, _ = pipe.generate_prompt(_P(), sp)
        else:  # generic toy DiT takes token ids
            out, _ = pipe.generate(
                [ord(c) % 256 for c in args.prompt], sp
            )
        assert out is not None
        return time.time() - t0

    one(0)  # warm every compile
    lats = [one(i + 1) for i in range(args.runs)]
    mean = sum(lats) / len(lats)
    print(json.dumps({
        "metric": f"{args.family} {args.size} {args.steps}-step latency",
        "value": round(mean, 4),
        "unit": "s",
        "per_step_ms": round(mean / args.steps * 1000, 2),
        "p_worst_s": round(max(lats), 4),
        "runs": args.runs,
        "random_init": args.model_path is None,
    }))


if __name__ == "__main__":
    main()
