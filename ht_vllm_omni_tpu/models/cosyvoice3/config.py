"""CosyVoice3 configs (talker + CFM flow + HiFT vocoder).

Field names mirror the reference config blocks (reference
vllm_omni/model_executor/models/cosyvoice3/config.py and the flow/hift
kwargs in cosyvoice3_code2wav.py:47-106).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class FlowConfig:
    vocab_size: int = 6561  # speech-token codebook
    input_size: int = 512  # token embedding dim
    output_size: int = 80  # mel bins
    spk_embed_dim: int = 192
    token_mel_ratio: int = 2
    pre_lookahead_len: int = 3
    input_frame_rate: int = 25
    # mel-DiT estimator
    dit_hidden: int = 256
    dit_layers: int = 4
    dit_heads: int = 8
    # CFM
    sigma_min: float = 1e-6
    t_scheduler: str = "cosine"
    inference_cfg_rate: float = 0.7
    n_timesteps: int = 10

    @staticmethod
    def tiny(**kw) -> "FlowConfig":
        base = dict(
            vocab_size=64, input_size=16, output_size=8, spk_embed_dim=8,
            dit_hidden=16, dit_layers=2, dit_heads=2, n_timesteps=2,
        )
        base.update(kw)
        return FlowConfig(**base)


@dataclasses.dataclass(frozen=True)
class HiftConfig:
    in_channels: int = 80  # mel bins
    base_channels: int = 512
    nb_harmonics: int = 8
    sampling_rate: int = 22050
    nsf_alpha: float = 0.1
    nsf_sigma: float = 0.003
    nsf_voiced_threshold: float = 10.0
    upsample_rates: tuple[int, ...] = (8, 8)
    upsample_kernel_sizes: tuple[int, ...] = (16, 16)
    istft_n_fft: int = 16
    istft_hop_len: int = 4
    resblock_kernel_sizes: tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: tuple[tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5),
    )
    source_resblock_kernel_sizes: tuple[int, ...] = (7, 11)
    source_resblock_dilation_sizes: tuple[tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5),
    )
    lrelu_slope: float = 0.1
    audio_limit: float = 0.99

    @staticmethod
    def tiny(**kw) -> "HiftConfig":
        base = dict(
            in_channels=8, base_channels=16, nb_harmonics=2,
            upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
            resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
            source_resblock_kernel_sizes=(3, 3),
            source_resblock_dilation_sizes=((1,), (1,)),
        )
        base.update(kw)
        return HiftConfig(**base)

    @property
    def total_upsample(self) -> int:
        import numpy as np

        return int(np.prod(self.upsample_rates)) * self.istft_hop_len


@dataclasses.dataclass(frozen=True)
class CosyVoice3Config:
    flow: FlowConfig = dataclasses.field(default_factory=FlowConfig)
    hift: HiftConfig = dataclasses.field(default_factory=HiftConfig)

    @staticmethod
    def tiny() -> "CosyVoice3Config":
        return CosyVoice3Config(
            flow=FlowConfig.tiny(), hift=HiftConfig.tiny()
        )
