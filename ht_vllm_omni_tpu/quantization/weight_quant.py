"""Weight-only quantization of stacked-layer param pytrees.

Counterpart of the reference's per-component quant config + factory
(reference vllm_omni/quantization/factory.py:44-119): pick a method
(int8 per-channel / int4 group-wise), choose which weights participate,
transform the params once at load.  Quantized leaves replace the fp leaf
``name`` with ``name:q8``/``name:q4`` + ``name:scale`` (still stacked
[L, ...], so the lax.scan layer structure is unchanged); the model's
linear indirection (models/qwen2._linear) dispatches to the fused
dequant+matmul Pallas kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.ops.quant_matmul import quantize_int4, quantize_int8

QUANT_SUFFIX_PACKED = {"int8": ":q8", "int4": ":q4"}
QUANT_SUFFIX_SCALE = {"int8": ":s8", "int4": ":s4"}

# the big per-layer matmul weights [L, K, N]
_DEFAULT_TARGETS = ("wq", "wk", "wv", "wo", "gate", "up", "down")


def quantize_params(
    params: dict,
    method: str,
    targets: tuple[str, ...] = _DEFAULT_TARGETS,
    group_size: int = 128,
) -> dict:
    if method not in ("int8", "int4"):
        raise ValueError(f"unknown quant method {method!r}")
    out = dict(params)
    for name in targets:
        w = params.get(name)
        if w is None or w.ndim != 3:
            continue
        if method == "int8":
            q, s = jax.vmap(quantize_int8)(w)
        else:
            if w.shape[1] % group_size or w.shape[1] % 2:
                continue  # K not groupable: leave this weight in fp
            q, s = jax.vmap(lambda m: quantize_int4(m, group_size))(w)
        del out[name]
        out[name + QUANT_SUFFIX_PACKED[method]] = q
        out[name + QUANT_SUFFIX_SCALE[method]] = jnp.asarray(s)
    return out
