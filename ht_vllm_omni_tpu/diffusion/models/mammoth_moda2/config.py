"""MammothModa2 DiT configs (reference vllm_omni/diffusion/models/
mammoth_moda2/mammothmoda2_dit_model.py:493 Transformer2DModel)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class MammothDiTArchConfig:
    patch_size: int = 2
    in_channels: int = 16
    hidden_size: int = 2304
    num_layers: int = 26
    num_refiner_layers: int = 2
    num_attention_heads: int = 24
    num_kv_heads: int = 8
    multiple_of: int = 256
    norm_eps: float = 1e-5
    axes_dim_rope: tuple[int, int, int] = (32, 32, 32)
    text_feat_dim: int = 1024       # AR trunk hidden size
    rope_theta: float = 10000.0
    # SimpleQFormerImageRefiner (reference :188; condenses the AR's
    # image-condition hiddens into a fixed number of queries)
    qformer_queries: int = 128
    qformer_layers: int = 2

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def adaln_dim(self) -> int:
        return min(self.hidden_size, 1024)

    @property
    def ffn_dim(self) -> int:
        inner = 4 * self.hidden_size
        m = self.multiple_of
        return m * ((inner + m - 1) // m)

    @classmethod
    def tiny(cls) -> "MammothDiTArchConfig":
        return cls(
            patch_size=2, in_channels=4, hidden_size=24, num_layers=2,
            num_refiner_layers=1, num_attention_heads=2, num_kv_heads=1,
            multiple_of=16, axes_dim_rope=(4, 4, 4), text_feat_dim=16,
            qformer_queries=4, qformer_layers=1,
        )
