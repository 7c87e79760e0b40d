from ht_vllm_omni_tpu.distributed.connectors.base import OmniConnectorBase
from ht_vllm_omni_tpu.distributed.connectors.factory import (
    OmniConnectorFactory,
)

__all__ = ["OmniConnectorBase", "OmniConnectorFactory"]
