from ht_vllm_omni_tpu.models.fish_speech.config import (
    FishSpeechConfig,
    FishSpeechFastConfig,
    slow_ar_arch_config,
)

__all__ = [
    "FishSpeechConfig",
    "FishSpeechFastConfig",
    "slow_ar_arch_config",
]
