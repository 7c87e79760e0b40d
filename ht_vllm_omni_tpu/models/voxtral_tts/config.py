"""Voxtral TTS configs.

Mirrors the reference dataclasses (semantics only):
- AcousticFlowConfig  <- AcousticTransformerArgs + MultimodalAudioModelArgs
  (reference vllm_omni/model_executor/models/voxtral_tts/
   voxtral_tts_audio_generation.py:99-152)
- VoxtralCodecConfig  <- AudioTokenizerArgs
  (reference voxtral_tts/voxtral_tts_audio_tokenizer.py:56-135)

Special audio tokens (voxtral_tts_audio_generation.py:79): the first
codebook reserves id 0 = [EMPTY_AUDIO] and id 1 = [END_AUDIO]; real
codes are offset by NUM_SPECIAL in every codebook.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

NUM_SPECIAL = 2  # [EMPTY_AUDIO]=0, [END_AUDIO]=1
EMPTY_AUDIO = 0
END_AUDIO = 1


def _round_up(n: int, m: int) -> int:
    return m * ((n + m - 1) // m)


@dataclass(frozen=True)
class AcousticFlowConfig:
    """Flow-matching acoustic transformer that expands one LLM hidden
    state into one audio frame of [semantic, acoustic x N] codes."""

    input_dim: int = 3072           # talker trunk hidden size
    dim: int = 768
    n_layers: int = 3
    head_dim: int = 128
    hidden_dim: int = 2048
    n_heads: int = 6
    n_kv_heads: int = 2
    use_biases: bool = False
    norm_eps: float = 1e-5
    sigma: float = 1e-5

    semantic_codebook_size: int = 8192
    acoustic_codebook_size: int = 21   # FSQ levels per acoustic dim
    n_acoustic_codebook: int = 36

    decode_iters: int = 8              # flow Euler grid points
    cfg_alpha: float = 1.2
    noise_scale: float = 1.0

    @property
    def num_codebooks(self) -> int:
        return 1 + self.n_acoustic_codebook

    @property
    def padded_semantic_size(self) -> int:
        # reference pads codebook+specials to a multiple of 128
        return _round_up(self.semantic_codebook_size + NUM_SPECIAL, 128)

    @property
    def codebook_sizes(self) -> tuple[int, ...]:
        """Unpadded per-codebook vocab sizes including specials
        (reference get_codebook_sizes(pad_to_multiple=None))."""
        return (
            self.semantic_codebook_size + NUM_SPECIAL,
        ) + (self.acoustic_codebook_size + NUM_SPECIAL,) * (
            self.n_acoustic_codebook
        )

    @property
    def mm_vocab_size(self) -> int:
        """MultiVocabEmbeddings table rows (padded to 128)."""
        return _round_up(sum(self.codebook_sizes), 128)


@dataclass(frozen=True)
class VoxtralCodecConfig:
    """Decoder half of the Voxtral audio tokenizer (the open-source
    checkpoint ships decoder + quantizer only)."""

    channels: int = 1
    sampling_rate: int = 24000
    patch_size: int = 240            # pretransform_patch_size
    patch_proj_kernel_size: int = 7

    semantic_codebook_size: int = 8192
    semantic_dim: int = 256
    acoustic_codebook_size: int = 21
    acoustic_dim: int = 36

    dim: int = 1024
    hidden_dim: int = 4096
    head_dim: int = 128
    n_heads: int = 8
    n_kv_heads: int = 8
    qk_norm: bool = True
    qk_norm_eps: float = 1e-6
    use_biases: bool = False
    norm_eps: float = 1e-2
    layer_scale: bool = True
    attn_sliding_window_size: int = 16
    half_attn_window_upon_downsampling: bool = True

    encoder_convs_strides: tuple[int, ...] = (2, 2, 2, 1)
    decoder_transformer_lengths: tuple[int, ...] = (2, 2, 2, 2)
    decoder_convs_kernels: tuple[int, ...] = (3, 4, 4, 4)
    decoder_convs_strides: tuple[int, ...] = (1, 2, 2, 2)

    @property
    def latent_dim(self) -> int:
        return self.semantic_dim + self.acoustic_dim

    @property
    def frame_rate(self) -> float:
        return self.sampling_rate / (
            self.patch_size * math.prod(self.encoder_convs_strides)
        )

    @property
    def downsample_factor(self) -> int:
        """Waveform samples per audio frame."""
        return self.patch_size * math.prod(self.encoder_convs_strides)

    @property
    def decoder_windows(self) -> tuple[int, ...]:
        """Sliding-window size for each decoder transformer group.

        The reference threads one mutable window through encoder
        construction (halved at each stride-2 encoder downsample) and
        then doubles it back at each stride-2 decoder upsample
        (voxtral_tts_audio_tokenizer.py:755-845)."""
        w = self.attn_sliding_window_size
        if self.half_attn_window_upon_downsampling:
            for s in self.encoder_convs_strides:
                if s > 1:
                    w //= 2
        wins = []
        if (
            self.half_attn_window_upon_downsampling
            and self.decoder_convs_strides[0] > 1
        ):
            w *= 2
        for idx in range(len(self.decoder_transformer_lengths)):
            wins.append(w)
            nxt = idx + 1
            if (
                nxt < len(self.decoder_convs_strides)
                and self.decoder_convs_strides[nxt] > 1
                and self.half_attn_window_upon_downsampling
            ):
                w *= 2
        return tuple(wins)


@dataclass(frozen=True)
class VoxtralTTSConfig:
    acoustic: AcousticFlowConfig = field(default_factory=AcousticFlowConfig)
    codec: VoxtralCodecConfig = field(default_factory=VoxtralCodecConfig)
