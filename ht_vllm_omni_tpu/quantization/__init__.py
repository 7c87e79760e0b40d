"""Weight quantization (reference vllm_omni/quantization/ counterpart)."""

from ht_vllm_omni_tpu.quantization.weight_quant import (
    QUANT_SUFFIX_PACKED,
    QUANT_SUFFIX_SCALE,
    quantize_params,
)

__all__ = ["quantize_params", "QUANT_SUFFIX_PACKED", "QUANT_SUFFIX_SCALE"]
