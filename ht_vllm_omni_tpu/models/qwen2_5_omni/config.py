"""Qwen2.5-Omni token2wav configs.

Field defaults mirror the released HF configs
(transformers Qwen2_5OmniDiTConfig / Qwen2_5OmniBigVGANConfig; the
reference consumes them in
vllm_omni/model_executor/models/qwen2_5_omni/qwen2_5_omni_token2wav.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass


@dataclass(frozen=True)
class DiTConfig:
    mel_dim: int = 80
    hidden_size: int = 1024
    num_hidden_layers: int = 22
    num_attention_heads: int = 16
    head_dim: int = 64
    ff_mult: int = 2
    emb_dim: int = 512              # codec embedding width
    num_embeds: int = 8193          # codec vocab (+1 row in the table)
    repeats: int = 2                # mel frames per codec token (50 Hz)
    enc_dim: int = 128              # ECAPA output width
    enc_emb_dim: int = 192          # x-vector speaker embedding width
    block_size: int = 24
    look_ahead_layers: tuple[int, ...] = (10,)
    look_backward_layers: tuple[int, ...] = (0, 20)
    rope_theta: float = 10000.0

    # ECAPA-TDNN speaker encoder
    enc_channels: tuple[int, ...] = (256, 256, 256, 256, 768)
    enc_kernel_sizes: tuple[int, ...] = (5, 3, 3, 3, 1)
    enc_dilations: tuple[int, ...] = (1, 2, 3, 4, 1)
    enc_res2net_scale: int = 2
    enc_se_channels: int = 64
    enc_attention_channels: int = 64

    @classmethod
    def tiny(cls) -> "DiTConfig":
        return cls(
            mel_dim=8, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, head_dim=8, emb_dim=16,
            num_embeds=33, enc_dim=12, enc_emb_dim=6, block_size=4,
            look_ahead_layers=(1,), look_backward_layers=(0,),
            enc_channels=(8, 8, 8, 16), enc_kernel_sizes=(5, 3, 3, 1),
            enc_dilations=(1, 2, 3, 1), enc_res2net_scale=2,
            enc_se_channels=4, enc_attention_channels=4,
        )


@dataclass(frozen=True)
class BigVGANConfig:
    mel_dim: int = 80
    upsample_initial_channel: int = 1536
    upsample_rates: tuple[int, ...] = (5, 3, 2, 2, 2, 2)
    upsample_kernel_sizes: tuple[int, ...] = (11, 7, 4, 4, 4, 4)
    resblock_kernel_sizes: tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: tuple[tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5),
    )

    @property
    def hop_length(self) -> int:
        return math.prod(self.upsample_rates)

    @classmethod
    def tiny(cls) -> "BigVGANConfig":
        return cls(
            mel_dim=8, upsample_initial_channel=16,
            upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
            resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3, 5),),
        )


@dataclass(frozen=True)
class Token2WavConfig:
    dit: DiTConfig = DiTConfig()
    bigvgan: BigVGANConfig = BigVGANConfig()
    sample_rate: int = 24000

    @classmethod
    def tiny(cls) -> "Token2WavConfig":
        return cls(dit=DiTConfig.tiny(), bigvgan=BigVGANConfig.tiny())
