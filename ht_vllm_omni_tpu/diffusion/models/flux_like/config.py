"""Shared config for flux-architecture variants (Ovis / LongCat).

Both are dual+single-stream DiTs with per-block adaLN-zero and a
timestep-only conditioning vector (no CLIP pooled text, no guidance
embeds); they differ in FFN activations, context-embedder norm and
position-id conventions:

- Ovis-Image (reference ovis_image_transformer.py:340): SwiGLU dual
  FFs, silu-gated single-stream MLP, RMS-normed context embedder,
  joint_attention_dim 2048, 6 dual + 27 single layers.
- LongCat-Image (reference longcat_image_transformer.py:577): plain
  GELU-tanh FFs (ungated), GELU single MLP, modality-id position ids
  with image positions offset by the text length.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class FluxLikeArchConfig:
    in_channels: int = 64
    num_layers: int = 6
    num_single_layers: int = 27
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 2048
    axes_dims_rope: tuple[int, ...] = (16, 56, 56)
    rope_theta: float = 10000.0
    ff_act: str = "swiglu"          # "swiglu" | "gelu"
    single_mlp_act: str = "swiglu"  # "swiglu" | "gelu"
    context_rms_norm: bool = True
    mlp_ratio: float = 4.0

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def ovis_tiny(cls) -> "FluxLikeArchConfig":
        return cls(
            in_channels=16, num_layers=2, num_single_layers=2,
            attention_head_dim=8, num_attention_heads=4,
            joint_attention_dim=32, axes_dims_rope=(2, 4, 2),
        )

    @classmethod
    def longcat_tiny(cls) -> "FluxLikeArchConfig":
        return cls(
            in_channels=16, num_layers=2, num_single_layers=2,
            attention_head_dim=8, num_attention_heads=4,
            joint_attention_dim=32, axes_dims_rope=(2, 4, 2),
            ff_act="gelu", single_mlp_act="gelu",
            context_rms_norm=False,
        )
