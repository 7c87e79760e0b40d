"""Bagel configs (reference
vllm_omni/diffusion/models/bagel/bagel_transformer.py: Qwen2MoTConfig
:201-263 + Bagel wrapper :1068-1118)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class BagelArchConfig:
    # Qwen2-MoT trunk (Qwen2.5-7B shape in the released checkpoint)
    vocab_size: int = 152064
    hidden_size: int = 3584
    intermediate_size: int = 18944
    num_hidden_layers: int = 28
    num_attention_heads: int = 28
    num_key_value_heads: int = 4
    rope_theta: float = 1000000.0
    rms_norm_eps: float = 1e-6
    # generation head
    latent_channels: int = 16
    latent_patch_size: int = 2
    max_latent_size: int = 64      # per-side latent patches
    timestep_shift: float = 3.0
    # special ids (added tokens; add_special_tokens in the reference)
    start_of_image: int = 151652
    end_of_image: int = 151653

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def patch_latent_dim(self) -> int:
        return self.latent_patch_size**2 * self.latent_channels

    @classmethod
    def tiny(cls) -> "BagelArchConfig":
        return cls(
            vocab_size=128, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, latent_channels=4,
            latent_patch_size=2, max_latent_size=8,
            start_of_image=120, end_of_image=121,
        )
