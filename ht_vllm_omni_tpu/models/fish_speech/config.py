"""Fish-Speech S2-Pro configs.

Mirrors the reference configuration mapping (reference
vllm_omni/model_executor/models/fish_speech/configuration_fish_speech.py):
the Slow AR is a Qwen3-style trunk with interleaved (GPT-J) RoPE over a
text+semantic vocab; the Fast AR is a small 4-layer residual-codebook
predictor; the codec is a DAC decoder.
"""

from __future__ import annotations

import dataclasses

from ht_vllm_omni_tpu.config import ModelArchConfig


@dataclasses.dataclass(frozen=True)
class FishSpeechFastConfig:
    hidden_size: int = 1024
    num_hidden_layers: int = 4
    num_attention_heads: int = 16
    num_key_value_heads: int = 16
    head_dim: int = 64
    intermediate_size: int = 4096
    vocab_size: int = 4096  # codebook size
    num_codebooks: int = 10
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    dtype: str = "float32"

    @staticmethod
    def tiny(**kw) -> "FishSpeechFastConfig":
        base = dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=4, head_dim=8, intermediate_size=64,
            vocab_size=48, num_codebooks=4,
        )
        base.update(kw)
        return FishSpeechFastConfig(**base)


@dataclasses.dataclass(frozen=True)
class FishSpeechConfig:
    slow: ModelArchConfig = None  # type: ignore[assignment]
    fast: FishSpeechFastConfig = None  # type: ignore[assignment]
    semantic_begin_id: int = 7  # first semantic token in slow vocab
    semantic_end_id: int = 0  # inclusive; 0 => begin + fast.vocab - 1
    im_end_id: int = 2

    def __post_init__(self) -> None:
        if self.slow is None:
            object.__setattr__(self, "slow", slow_ar_arch_config())
        if self.fast is None:
            object.__setattr__(self, "fast", FishSpeechFastConfig())
        if self.semantic_end_id == 0:
            object.__setattr__(
                self,
                "semantic_end_id",
                self.semantic_begin_id + self.fast.vocab_size - 1,
            )

    @staticmethod
    def tiny() -> "FishSpeechConfig":
        fast = FishSpeechFastConfig.tiny()
        return FishSpeechConfig(
            slow=slow_ar_arch_config(
                vocab_size=96, hidden_size=32, intermediate_size=64,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, head_dim=8, dtype="float32",
            ),
            fast=fast,
        )


def slow_ar_arch_config(**overrides) -> ModelArchConfig:
    """Slow AR trunk: Qwen3 shape with interleaved RoPE (reference
    fish_speech_slow_ar.py:_fix_rope_style — is_neox_style=False)."""
    base = dict(
        model_type="qwen3",
        vocab_size=155776,
        hidden_size=2560,
        intermediate_size=9728,
        num_hidden_layers=36,
        num_attention_heads=32,
        num_key_value_heads=8,
        head_dim=128,
        rope_theta=1_000_000.0,
        qk_norm=True,
        attention_bias=False,
        tie_word_embeddings=True,
        rope_interleaved=True,
        dtype="bfloat16",
    )
    base.update(overrides)
    return ModelArchConfig(**base)
