"""SD3 / SD3.5 MMDiT architecture config.

Field names mirror the reference SD3Transformer2DModel constructor
(reference vllm_omni/diffusion/models/sd3/sd3_transformer.py:389-446):
``dual_attention_layers`` and ``qk_norm`` distinguish SD3.5 from SD3.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class SD3ArchConfig:
    sample_size: int = 128
    patch_size: int = 2
    in_channels: int = 16
    out_channels: int = 16
    num_layers: int = 24
    num_attention_heads: int = 24
    attention_head_dim: int = 64
    joint_attention_dim: int = 4096
    caption_projection_dim: int = 1536
    pooled_projection_dim: int = 2048
    pos_embed_max_size: int = 192
    dual_attention_layers: tuple[int, ...] = ()
    qk_norm: str = ""  # "rms_norm" for SD3.5
    dtype: str = "float32"

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @staticmethod
    def tiny(**kw) -> "SD3ArchConfig":
        base = dict(
            sample_size=8, patch_size=2, in_channels=4, out_channels=4,
            num_layers=3, num_attention_heads=2, attention_head_dim=8,
            joint_attention_dim=24, caption_projection_dim=16,
            pooled_projection_dim=20, pos_embed_max_size=16,
        )
        base.update(kw)
        return SD3ArchConfig(**base)

    @staticmethod
    def sd3_5_large() -> "SD3ArchConfig":
        return SD3ArchConfig(
            num_layers=38, num_attention_heads=38, attention_head_dim=64,
            qk_norm="rms_norm",
        )

    @staticmethod
    def sd3_5_medium() -> "SD3ArchConfig":
        return SD3ArchConfig(
            num_layers=24, num_attention_heads=24, attention_head_dim=64,
            caption_projection_dim=1536, pos_embed_max_size=384,
            dual_attention_layers=tuple(range(13)), qk_norm="rms_norm",
        )
