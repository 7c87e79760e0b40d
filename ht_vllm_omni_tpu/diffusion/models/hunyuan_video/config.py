"""HunyuanVideo 1.5 transformer config (reference
vllm_omni/diffusion/models/hunyuan_video/hunyuan_video_15_transformer.py
:532-612)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class HunyuanVideoArchConfig:
    in_channels: int = 65          # 32 noise + 32 cond latents + 1 mask
    out_channels: int = 32
    num_attention_heads: int = 16
    attention_head_dim: int = 128
    num_layers: int = 54
    num_refiner_layers: int = 2
    mlp_ratio: float = 4.0
    patch_size: int = 1
    patch_size_t: int = 1
    text_embed_dim: int = 3584     # MLLM (Qwen2.5-VL) features
    text_embed_2_dim: int = 1472   # ByT5 glyph features
    image_embed_dim: int = 1152
    rope_theta: float = 256.0
    rope_axes_dim: tuple[int, ...] = (16, 56, 56)

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def latent_channels(self) -> int:
        return self.out_channels

    @classmethod
    def tiny(cls) -> "HunyuanVideoArchConfig":
        return cls(
            in_channels=9, out_channels=4, num_attention_heads=4,
            attention_head_dim=8, num_layers=2, num_refiner_layers=1,
            text_embed_dim=16, text_embed_2_dim=12, image_embed_dim=8,
            rope_axes_dim=(2, 4, 2),
        )
