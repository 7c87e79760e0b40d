"""Small shared utilities (math helpers, platform probing, logging)."""

from ht_vllm_omni_tpu.utils.math_utils import cdiv, next_power_of_2, round_up
from ht_vllm_omni_tpu.utils.platform import (
    is_tpu_backend,
    pallas_interpret_mode,
)

__all__ = [
    "cdiv",
    "round_up",
    "next_power_of_2",
    "is_tpu_backend",
    "pallas_interpret_mode",
]
