"""Wan2.2 video family configuration.

Shapes follow the reference WanTransformer3DModel defaults (reference
vllm_omni/diffusion/models/wan2_2/wan2_2_transformer.py:777-794: 40
layers x 40 heads x 128 head_dim, patch (1, 2, 2), UMT5 text_dim 4096)
and the Wan causal-3D video VAE (temporal compression 4x, spatial 8x).
Tiny variants keep every structural feature (3D rope, dual noise
experts, temporal up/down sampling) at test scale.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class WanVideoArchConfig:
    patch_size: tuple[int, int, int] = (1, 2, 2)
    num_attention_heads: int = 40
    attention_head_dim: int = 128
    in_channels: int = 16
    out_channels: int = 16
    text_dim: int = 4096
    freq_dim: int = 256
    ffn_dim: int = 13824
    num_layers: int = 40
    cross_attn_norm: bool = True
    eps: float = 1e-6
    rope_theta: float = 10000.0
    dtype: str = "bfloat16"

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def rope_dims(self) -> tuple[int, int, int]:
        """(t, h, w) split of head_dim (reference
        wan2_2_transformer.py:204-208)."""
        d = self.attention_head_dim
        return (d - 2 * (d // 3), d // 3, d // 3)

    @staticmethod
    def tiny() -> "WanVideoArchConfig":
        return WanVideoArchConfig(
            num_attention_heads=4,
            attention_head_dim=24,  # rope split (8, 8, 8)
            in_channels=4,
            out_channels=4,
            text_dim=64,
            freq_dim=32,
            ffn_dim=128,
            num_layers=2,
            dtype="float32",
        )


@dataclasses.dataclass
class WanVideoVAEConfig:
    """Wan causal-3D KL autoencoder (reference AutoencoderKLWan via
    pipeline_wan2_2.py:21): dim_mult stages with spatial 2x per stage
    transition and temporal 2x where flagged -> spatial 8x, temporal 4x
    on the full model."""

    base_dim: int = 96
    z_dim: int = 16
    dim_mult: tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    input_channels: int = 3
    # stage transitions that also resample time (full model: 2 of 3)
    temporal_resample: tuple[bool, ...] = (False, True, True)
    latents_mean: tuple[float, ...] = (0.0,) * 16
    latents_std: tuple[float, ...] = (1.0,) * 16
    dtype: str = "float32"

    @property
    def spatial_ratio(self) -> int:
        return 2 ** (len(self.dim_mult) - 1)

    @property
    def temporal_ratio(self) -> int:
        return 2 ** sum(self.temporal_resample)

    @staticmethod
    def tiny() -> "WanVideoVAEConfig":
        return WanVideoVAEConfig(
            base_dim=8,
            z_dim=4,
            dim_mult=(1, 2),
            num_res_blocks=1,
            temporal_resample=(True,),
            latents_mean=(0.0,) * 4,
            latents_std=(1.0,) * 4,
        )
