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

from ht_vllm_omni_tpu.ops.quant_matmul import (
    quantize_awq_int4,
    quantize_fp8,
    quantize_int4,
    quantize_int8,
)

QUANT_SUFFIX_PACKED = {
    "int8": ":q8", "int4": ":q4", "fp8": ":f8", "awq": ":q4z",
}
QUANT_SUFFIX_SCALE = {
    "int8": ":s8", "int4": ":s4", "fp8": ":sf8", "awq": ":s4z",
}

# the big per-layer matmul weights [L, K, N]; wqkv/wgu are the fused
# forms (models/qwen2.fuse_params runs BEFORE quantization on a single
# mesh, so decode keeps 4 wide GEMMs per layer instead of 7 narrow ones)
_DEFAULT_TARGETS = (
    "wq", "wk", "wv", "wo", "gate", "up", "down", "wqkv", "wgu",
)

_ALIASES = {"int4-awq": "awq", "fp8_e4m3": "fp8"}


def quantize_params(
    params: dict,
    method: str,
    targets: tuple[str, ...] = _DEFAULT_TARGETS,
    group_size: int = 128,
    quantize_lm_head: bool = False,
) -> dict:
    method = _ALIASES.get(method, method)
    if method not in ("int8", "int4", "fp8", "awq"):
        raise ValueError(f"unknown quant method {method!r}")
    out = dict(params)
    if quantize_lm_head:
        # the head is the largest single weight stream at decode; tied
        # embeddings get a dedicated quantized [H, V] copy (the fp embed
        # stays for token gathers)
        head = params.get("lm_head")
        if head is None and "embed" in params:
            head = params["embed"].T
        if head is not None and not (
            method in ("int4", "awq")
            and (head.shape[0] % group_size or head.shape[0] % 2)
        ):
            if method == "int8":
                q, s = quantize_int8(head)
            elif method == "fp8":
                q, s = quantize_fp8(head)
            elif method == "awq":
                q, s, z = quantize_awq_int4(head, group_size)
                out["lm_head:z4"] = jnp.asarray(z)
            else:
                q, s = quantize_int4(head, group_size)
            out.pop("lm_head", None)
            out["lm_head" + QUANT_SUFFIX_PACKED[method]] = q
            s = jnp.asarray(s)
            if method in ("int4", "awq"):
                s = _pad_group_rows(s)
                if method == "awq":
                    out["lm_head:z4"] = _pad_group_rows(out["lm_head:z4"])
            out["lm_head" + QUANT_SUFFIX_SCALE[method]] = s
    for name in targets:
        w = params.get(name)
        if w is None or w.ndim != 3:
            continue
        if method == "int8":
            q, s = jax.vmap(quantize_int8)(w)
        elif method == "fp8":
            q, s = jax.vmap(quantize_fp8)(w)
        elif method == "awq":
            if w.shape[1] % group_size or w.shape[1] % 2:
                continue
            q, s, z = jax.vmap(
                lambda m: quantize_awq_int4(m, group_size)
            )(w)
            out[name + ":z4"] = jnp.asarray(z)
        else:
            if w.shape[1] % group_size or w.shape[1] % 2:
                continue  # K not groupable: leave this weight in fp
            q, s = jax.vmap(lambda m: quantize_int4(m, group_size))(w)
        del out[name]
        out[name + QUANT_SUFFIX_PACKED[method]] = q
        if method in ("int4", "awq"):
            # pre-pad group rows to the sublane multiple ONCE — the
            # Pallas matmuls otherwise re-pad inside the decode scan
            # (measured ~10 ms per 256-step chunk as XLA pad ops)
            s = _pad_group_rows(jnp.asarray(s))
            if method == "awq":
                out[name + ":z4"] = _pad_group_rows(out[name + ":z4"])
        out[name + QUANT_SUFFIX_SCALE[method]] = jnp.asarray(s)
    return out


def _pad_group_rows(s: jax.Array) -> jax.Array:
    """Pad [..., K/G, N] group rows up to a multiple of 8."""
    pad = (-s.shape[-2]) % 8
    if not pad:
        return s
    widths = [(0, 0)] * s.ndim
    widths[-2] = (0, pad)
    return jnp.pad(s.astype(jnp.float32), widths)


def load_awq_layer(qweight, qzeros, scales) -> dict:
    """One AWQ checkpoint layer (qweight/qzeros/scales tensors) ->
    {':q4z', ':s4z', ':z4'} leaves in this module's layout."""
    from ht_vllm_omni_tpu.ops.quant_matmul import unpack_awq_checkpoint

    packed, s, z = unpack_awq_checkpoint(qweight, qzeros, scales)
    return {":q4z": packed, ":s4z": s, ":z4": z}
