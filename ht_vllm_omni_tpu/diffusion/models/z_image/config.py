"""Z-Image transformer config (reference
vllm_omni/diffusion/models/z_image/z_image_transformer.py:559-625)."""

from __future__ import annotations

from dataclasses import dataclass

ADALN_EMBED_DIM = 256
SEQ_MULTI_OF = 32


@dataclass(frozen=True)
class ZImageArchConfig:
    in_channels: int = 16
    dim: int = 3840
    n_layers: int = 30
    n_refiner_layers: int = 2
    n_heads: int = 30
    n_kv_heads: int = 30
    norm_eps: float = 1e-5
    cap_feat_dim: int = 2560
    patch_size: int = 2
    rope_theta: float = 256.0
    t_scale: float = 1000.0
    axes_dims: tuple[int, ...] = (32, 48, 48)

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @property
    def adaln_dim(self) -> int:
        return min(self.dim, ADALN_EMBED_DIM)

    @property
    def ffn_hidden(self) -> int:
        return int(self.dim / 3 * 8)

    @classmethod
    def tiny(cls) -> "ZImageArchConfig":
        return cls(
            in_channels=4, dim=32, n_layers=2, n_refiner_layers=1,
            n_heads=4, n_kv_heads=2, cap_feat_dim=16,
            axes_dims=(4, 2, 2),
        )
