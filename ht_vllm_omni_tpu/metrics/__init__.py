from ht_vllm_omni_tpu.metrics.stats import (
    OrchestratorAggregator,
    RequestE2EStats,
    StageStats,
)

__all__ = ["StageStats", "RequestE2EStats", "OrchestratorAggregator"]
