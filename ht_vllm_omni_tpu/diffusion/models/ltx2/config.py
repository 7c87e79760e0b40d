"""LTX2 configs (reference
vllm_omni/diffusion/models/ltx2/ltx2_transformer.py)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class LTX2ArchConfig:
    # video stream
    in_channels: int = 128
    patch_size: int = 1
    patch_size_t: int = 1
    num_attention_heads: int = 32
    attention_head_dim: int = 128
    cross_attention_dim: int = 4096
    # audio stream
    audio_in_channels: int = 64
    audio_num_attention_heads: int = 8
    audio_attention_head_dim: int = 64
    audio_cross_attention_dim: int = 2048
    num_layers: int = 48
    caption_dim: int = 4096
    eps: float = 1e-6
    rope_theta: float = 10000.0

    @property
    def dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def audio_dim(self) -> int:
        return self.audio_num_attention_heads * self.audio_attention_head_dim

    @classmethod
    def tiny(cls) -> "LTX2ArchConfig":
        return cls(
            in_channels=4, num_attention_heads=4, attention_head_dim=6,
            cross_attention_dim=16, audio_in_channels=4,
            audio_num_attention_heads=2, audio_attention_head_dim=6,
            audio_cross_attention_dim=16, num_layers=2, caption_dim=16,
        )
