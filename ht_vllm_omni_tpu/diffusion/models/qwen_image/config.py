"""Qwen-Image family configuration.

Shapes follow the reference transformer / VAE defaults (reference
vllm_omni/diffusion/models/qwen_image/qwen_image_transformer.py:921-936,
autoencoder_kl_qwenimage.py:679-694).  The tiny-scale defaults used by
tests shrink every axis but keep every structural feature (dual stream,
3-axis RoPE, causal-3D VAE) intact.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class QwenImageArchConfig:
    """QwenImageTransformer2DModel shape (reference
    qwen_image_transformer.py:921; full model: 60 layers x 24 heads x 128
    head_dim = 3072 wide, in_channels 64 = 16 latent channels x 2x2
    patch)."""

    patch_size: int = 2
    in_channels: int = 64
    out_channels: int = 16
    num_layers: int = 60
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 3584  # text-encoder hidden width
    axes_dims_rope: tuple[int, int, int] = (16, 56, 56)
    rope_theta: float = 10000.0
    dtype: str = "bfloat16"

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @staticmethod
    def tiny() -> "QwenImageArchConfig":
        # pairs with QwenImageVAEConfig.tiny(): z_dim 4 -> 16 packed
        return QwenImageArchConfig(
            in_channels=16,
            out_channels=4,
            num_layers=2,
            attention_head_dim=32,
            num_attention_heads=4,
            joint_attention_dim=64,
            axes_dims_rope=(8, 12, 12),
        )


@dataclasses.dataclass
class QwenImageVAEConfig:
    """AutoencoderKLQwenImage shape (reference
    autoencoder_kl_qwenimage.py:679: Wan-style causal-3D KL autoencoder,
    8x spatial compression, 16 latent channels)."""

    base_dim: int = 96
    z_dim: int = 16
    dim_mult: tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    input_channels: int = 3
    # per-channel latent normalisation (reference :689-693)
    latents_mean: tuple[float, ...] = (
        -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517,
        1.5508, 0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497,
        0.2503, -0.2921,
    )
    latents_std: tuple[float, ...] = (
        2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
        3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
    )
    dtype: str = "float32"

    @property
    def spatial_ratio(self) -> int:
        return 2 ** (len(self.dim_mult) - 1)

    @staticmethod
    def tiny() -> "QwenImageVAEConfig":
        return QwenImageVAEConfig(
            base_dim=8,
            z_dim=4,
            dim_mult=(1, 2),
            num_res_blocks=1,
            latents_mean=(0.0,) * 4,
            latents_std=(1.0,) * 4,
        )
