"""Flux family configuration.

Shapes follow the reference FluxTransformer2DModel defaults (reference
vllm_omni/diffusion/models/flux/flux_transformer.py:497-510: 19
dual-stream + 38 single-stream blocks, 24 heads x 128 head_dim, packed
in_channels 64, T5 joint dim 4096, CLIP pooled dim 768, guidance
embeddings for the distilled dev checkpoints, rope axes (16, 56, 56)).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class FluxArchConfig:
    patch_size: int = 1  # flux packs 2x2 OUTSIDE the transformer
    in_channels: int = 64
    out_channels: int = 64
    num_layers: int = 19
    num_single_layers: int = 38
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096
    pooled_projection_dim: int = 768
    guidance_embeds: bool = True
    axes_dims_rope: tuple[int, int, int] = (16, 56, 56)
    rope_theta: float = 10000.0
    dtype: str = "bfloat16"

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @staticmethod
    def tiny() -> "FluxArchConfig":
        return FluxArchConfig(
            in_channels=16,
            out_channels=16,
            num_layers=2,
            num_single_layers=2,
            attention_head_dim=32,
            num_attention_heads=4,
            joint_attention_dim=64,
            pooled_projection_dim=32,
            axes_dims_rope=(8, 12, 12),
            dtype="float32",
        )
