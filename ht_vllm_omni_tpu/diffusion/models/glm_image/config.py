"""GLM-Image DiT config (reference
vllm_omni/diffusion/models/glm_image/glm_image_transformer.py:713-800)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class GlmImageArchConfig:
    in_channels: int = 16
    out_channels: int = 16
    patch_size: int = 2
    num_layers: int = 28
    num_attention_heads: int = 20
    attention_head_dim: int = 128
    time_embed_dim: int = 512
    condition_dim: int = 256
    text_embed_dim: int = 4096
    prior_vq_quantizer_codebook_size: int = 16384
    rope_theta: float = 10000.0

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def tiny(cls) -> "GlmImageArchConfig":
        return cls(
            in_channels=4, out_channels=4, num_layers=2,
            num_attention_heads=4, attention_head_dim=8,
            time_embed_dim=16, condition_dim=8, text_embed_dim=16,
            prior_vq_quantizer_codebook_size=64,
        )
