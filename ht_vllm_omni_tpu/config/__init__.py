"""Engine configuration dataclasses.

Flattened, first-class equivalents of the reference's sprawling config
stack (vLLM EngineArgs + OmniEngineArgs extras, reference
vllm_omni/engine/arg_utils.py:57, and OmniModelConfig,
vllm_omni/config/model.py:61).  Stage/pipeline DAG config lives in
ht_vllm_omni_tpu/config/stage_config.py.
"""

from ht_vllm_omni_tpu.config.engine_config import (
    CacheConfig,
    EngineConfig,
    ModelArchConfig,
    ParallelConfig,
    SchedulerConfig,
)

__all__ = [
    "CacheConfig",
    "EngineConfig",
    "ModelArchConfig",
    "ParallelConfig",
    "SchedulerConfig",
]
