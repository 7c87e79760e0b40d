from ht_vllm_omni_tpu.lora.manager import LoRAManager, LoRARequest

__all__ = ["LoRAManager", "LoRARequest"]
