"""Flux2 transformer config (reference
vllm_omni/diffusion/models/flux2/flux2_transformer.py:551-600)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Flux2ArchConfig:
    in_channels: int = 128          # 2x2-packed VAE channels
    num_layers: int = 8             # dual-stream blocks
    num_single_layers: int = 48
    attention_head_dim: int = 128
    num_attention_heads: int = 48
    joint_attention_dim: int = 15360  # stacked text-encoder layers
    mlp_ratio: float = 3.0
    axes_dims_rope: tuple[int, ...] = (32, 32, 32, 32)
    rope_theta: float = 2000.0
    eps: float = 1e-6
    guidance_embeds: bool = True

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def tiny(cls) -> "Flux2ArchConfig":
        return cls(
            in_channels=16, num_layers=2, num_single_layers=2,
            attention_head_dim=8, num_attention_heads=4,
            joint_attention_dim=48, axes_dims_rope=(2, 2, 2, 2),
            guidance_embeds=False,
        )
