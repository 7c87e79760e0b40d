from ht_vllm_omni_tpu.models.cosyvoice3.config import CosyVoice3Config

__all__ = ["CosyVoice3Config"]
