"""MiMo-Audio configs (reference vllm_omni/model_executor/models/
mimo_audio/config_mimo_audio.py)."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class MiMoLocalCfg:
    """One of the two small Qwen2-style local transformers."""

    dim: int = 1024
    layers: int = 16
    heads: int = 64
    ffn: int = 4096
    rope_theta: float = 10000.0
    eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.dim // self.heads


@dataclass(frozen=True)
class MiMoAudioAdapterConfig:
    """Adapter side (reference config_mimo_audio.py:16-57: group_size 4,
    8 RVQ channels with per-channel vocab 1025/1025/129x6 and delay
    pattern 0..7)."""

    group_size: int = 4
    audio_channels: int = 8
    speech_vocab_sizes: tuple[int, ...] = (
        1025, 1025, 129, 129, 129, 129, 129, 129,
    )
    speech_empty_ids: tuple[int, ...] = (
        1024, 1024, 128, 128, 128, 128, 128, 128,
    )
    delay_pattern: tuple[int, ...] = (0, 1, 2, 3, 4, 5, 6, 7)
    local: MiMoLocalCfg = field(default_factory=MiMoLocalCfg)
    input_local: MiMoLocalCfg = field(
        default_factory=lambda: MiMoLocalCfg(layers=6)
    )
    empty_token_id: int = 151667   # <|empty|>
    llm_hidden: int = 4096

    @property
    def max_vocab(self) -> int:
        return max(self.speech_vocab_sizes)

    @property
    def delay_iters(self) -> int:
        return self.group_size + max(self.delay_pattern)

    @classmethod
    def tiny(cls, llm_hidden: int = 32) -> "MiMoAudioAdapterConfig":
        return cls(
            group_size=2, audio_channels=3,
            speech_vocab_sizes=(17, 9, 9),
            speech_empty_ids=(16, 8, 8),
            delay_pattern=(0, 1, 2),
            local=MiMoLocalCfg(dim=16, layers=2, heads=2, ffn=32),
            input_local=MiMoLocalCfg(dim=16, layers=1, heads=2, ffn=32),
            empty_token_id=5,
            llm_hidden=llm_hidden,
        )


@dataclass(frozen=True)
class MiMoCode2WavConfig:
    """Audio tokenizer decoder (reference modeling_audio_tokenizer.py:
    AudioDecoder + TransformerVocos + ISTFTHead)."""

    num_quantizers: int = 8
    codebook_size: int = 1025
    d_model: int = 1024
    decoder_layers: int = 8
    decoder_heads: int = 16
    decoder_ffn: int = 4096
    decoder_kernel_size: int = 4
    decoder_stride_size: int = 2
    avg_pooler: int = 2
    n_mels: int = 128
    vocos_layers: int = 8
    vocos_heads: int = 16
    vocos_ffn: int = 4096
    n_fft: int = 1024
    hop_length: int = 256
    sampling_rate: int = 24000
    rope_theta: float = 10000.0
    eps: float = 1e-6

    @classmethod
    def tiny(cls) -> "MiMoCode2WavConfig":
        return cls(
            num_quantizers=3, codebook_size=17, d_model=16,
            decoder_layers=1, decoder_heads=2, decoder_ffn=32,
            decoder_kernel_size=4, decoder_stride_size=2, avg_pooler=2,
            n_mels=8, vocos_layers=1, vocos_heads=2, vocos_ffn=32,
            n_fft=16, hop_length=4,
        )
