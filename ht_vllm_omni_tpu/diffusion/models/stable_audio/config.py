"""Stable Audio Open configs (reference
vllm_omni/diffusion/models/stable_audio/stable_audio_transformer.py
:378-412 and the diffusers AutoencoderOobleck layout)."""

from __future__ import annotations

import math
from dataclasses import dataclass


@dataclass(frozen=True)
class StableAudioArchConfig:
    in_channels: int = 64
    out_channels: int = 64
    num_layers: int = 24
    attention_head_dim: int = 64
    num_attention_heads: int = 24
    num_key_value_attention_heads: int = 12
    cross_attention_dim: int = 768
    cross_attention_input_dim: int = 768
    global_states_input_dim: int = 1536
    time_proj_dim: int = 256
    ff_mult: int = 4

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def rotary_dim(self) -> int:
        return self.attention_head_dim // 2

    @classmethod
    def tiny(cls) -> "StableAudioArchConfig":
        return cls(
            in_channels=8, out_channels=8, num_layers=2,
            attention_head_dim=8, num_attention_heads=4,
            num_key_value_attention_heads=2, cross_attention_dim=16,
            cross_attention_input_dim=16, global_states_input_dim=32,
            time_proj_dim=32,
        )


@dataclass(frozen=True)
class OobleckConfig:
    """Oobleck VAE decoder (diffusers AutoencoderOobleck): snake-gated
    residual units around strided transposed convs."""

    audio_channels: int = 2
    decoder_channels: int = 128
    latent_dim: int = 64
    upsampling_ratios: tuple[int, ...] = (8, 8, 4, 4, 2)
    sampling_rate: int = 44100

    @property
    def hop_length(self) -> int:
        return math.prod(self.upsampling_ratios)

    @classmethod
    def tiny(cls) -> "OobleckConfig":
        return cls(
            audio_channels=1, decoder_channels=8, latent_dim=8,
            upsampling_ratios=(2, 2), sampling_rate=16000,
        )
