"""HunyuanImage-3 configs (reference vllm_omni/diffusion/models/
hunyuan_image_3/hunyuan_image_3_transformer.py:1084 HunyuanImage3Config)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class HunyuanImage3ArchConfig:
    # trunk (Hunyuan MoE decoder)
    vocab_size: int = 290943
    hidden_size: int = 4096
    intermediate_size: int = 11008          # shared-expert MLP width
    moe_intermediate_size: int = 3072       # routed-expert MLP width
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    attention_head_dim: int = 128
    num_experts: int = 64
    moe_topk: int = 8
    num_shared_expert: int = 1
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    use_qk_norm: bool = True
    # image side (reference :158-162)
    latent_channels: int = 32
    patch_size: int = 1
    patch_embed_hidden_dim: int = 1024
    vae_downsample_factor: int = 16
    image_base_size: int = 1024
    # flow matching
    flow_shift: float = 3.0
    num_train_timesteps: int = 1000

    @property
    def head_dim(self) -> int:
        return self.attention_head_dim

    @classmethod
    def tiny(cls) -> "HunyuanImage3ArchConfig":
        return cls(
            vocab_size=128, hidden_size=32, intermediate_size=48,
            moe_intermediate_size=16, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            attention_head_dim=8, num_experts=4, moe_topk=2,
            latent_channels=4, patch_embed_hidden_dim=16,
            vae_downsample_factor=2, image_base_size=64,
        )
