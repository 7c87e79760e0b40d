from ht_vllm_omni_tpu.distributed.omni_coordinator.coordinator import (
    InstanceInfo,
    OmniCoordinator,
    StageStatus,
)
from ht_vllm_omni_tpu.distributed.omni_coordinator.client import (
    CoordinatorClient,
)
from ht_vllm_omni_tpu.distributed.omni_coordinator.load_balancer import (
    pick_instance,
)

__all__ = [
    "OmniCoordinator",
    "CoordinatorClient",
    "InstanceInfo",
    "StageStatus",
    "pick_instance",
]
