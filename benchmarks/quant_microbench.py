"""Microbenchmark: fused dequant-matmul variants vs the HBM roofline.

Times each weight-only quant GEMM at the decode shapes of the flagship
models and reports achieved weight-stream bandwidth (GB/s) — the right
metric, since decode is weight-bandwidth-bound (VERDICT r2 #1: int4 must
beat int8 must beat bf16 proportional to weight bytes).

Methodology (tunneled-TPU-safe): the axon tunnel neither syncs on
block_until_ready nor keeps dispatch latency off the clock, so we time
a jitted lax.scan of N dependency-chained invocations with a FORCED
host readback (float(sum)) at two lengths and report the MARGINAL cost
(t_long - t_short) / (n_long - n_short).  The fixed ~30-40 ms tunnel
round-trip cancels in the difference.

Usage: python benchmarks/quant_microbench.py [--m 8]
"""

from __future__ import annotations

import argparse
import functools
import pathlib
import sys
import time

print = functools.partial(print, flush=True)

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.ops import quant_matmul as qm

# (name, K, N) decode-critical shapes: qwen2.5-0.5B and 7B trunks
SHAPES = [
    ("0.5b qkv", 896, 1152),
    ("0.5b o", 896, 896),
    ("0.5b gate_up", 896, 9728),
    ("0.5b down", 4864, 896),
    ("0.5b lm_head", 896, 151936),
    ("7b gate_up", 3584, 37888),
    ("7b down", 18944, 3584),
]

N_SHORT, N_LONG = 16, 80


def _chain(op, n):
    @jax.jit
    def chained(x0, *ws):
        def body(c, _):
            y = op(c, *ws)
            eps = (jnp.sum(y.astype(jnp.float32)) * 1e-24).astype(c.dtype)
            return c + eps, ()

        c, _ = jax.lax.scan(body, x0, None, length=n)
        return jnp.sum(c.astype(jnp.float32))

    return chained

def _run(f, x, ws):
    float(f(x, *ws))  # compile + sync
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(x, *ws))  # host readback = true sync
        best = min(best, time.perf_counter() - t0)
    return best


def device_time(op, x, ws=()):
    """Marginal per-invocation device time of op(x, *ws) -> [M, N]."""
    t_short = _run(_chain(op, N_SHORT), x, ws)
    t_long = _run(_chain(op, N_LONG), x, ws)
    return max(t_long - t_short, 1e-9) / (N_LONG - N_SHORT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=8)
    args = ap.parse_args()
    m = args.m

    print(f"device: {jax.devices()[0].device_kind}, M={m}")
    header = f"{'shape':<16}{'variant':<14}{'us':>9}{'GB/s':>9}{'x bf16':>8}"
    print(header)

    for name, k, n in SHAPES:
        x = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16)
        w_q8, s8 = qm.quantize_int8(w)
        w_p4, s4 = qm.quantize_int4(w)
        w_pa, sa, za = qm.quantize_awq_int4(w)
        w_f8, sf8 = qm.quantize_fp8(w)

        variants = [
            (
                "bf16",
                lambda c, w: jnp.dot(
                    c, w, preferred_element_type=jnp.float32
                ),
                (w,),
                2 * k * n,
            ),
            (
                "int8-xla",
                lambda c, wq, s: qm.matmul_int8(c, wq, s),
                (w_q8, s8),
                k * n,
            ),
            (
                "int8-pallas",
                lambda c, wq, s: qm.matmul_int8_pallas(c, wq, s),
                (w_q8, s8),
                k * n,
            ),
            (
                "int4",
                lambda c, wp, s: qm.matmul_int4(c, wp, s),
                (w_p4, s4),
                k * n // 2,
            ),
            (
                "awq",
                lambda c, wp, s, z: qm.matmul_int4_zp(c, wp, s, z),
                (w_pa, sa, za),
                k * n // 2,
            ),
            (
                "fp8",
                lambda c, w8, s: qm.matmul_fp8(c, w8, s),
                (w_f8, sf8),
                k * n,
            ),
        ]
        t_bf16 = None
        for vname, fn, ws, wbytes in variants:
            try:
                t = device_time(fn, x, ws)
            except Exception as e:  # pragma: no cover
                msg = str(e).splitlines()[0][:90]
                print(f"{name:<16}{vname:<14}  FAILED: {msg}")
                continue
            if vname == "bf16":
                t_bf16 = t
            gbs = wbytes / t / 1e9
            rel = t_bf16 / t if t_bf16 else float("nan")
            print(
                f"{name:<16}{vname:<14}{t * 1e6:>9.1f}{gbs:>9.0f}"
                f"{rel:>8.2f}"
            )
        print()


if __name__ == "__main__":
    main()
