"""Diffusion configuration + sampling parameters.

Counterpart of reference vllm_omni/diffusion/data.py:34-218
(DiffusionParallelConfig / OmniDiffusionConfig / DiffusionSamplingParams):
parallel sizes map to jax mesh axes (cfg / sp=ulysses / tp / dp) instead
of NCCL groups.
"""

from __future__ import annotations

import dataclasses
from typing import Any


@dataclasses.dataclass
class DiffusionParallelConfig:
    # classifier-free-guidance parallel: 1 (off) or 2 (cond/uncond on
    # separate mesh slices; reference cfg_parallel.py:35)
    cfg_parallel_size: int = 1
    # Ulysses-style sequence parallel (all_to_all head<->seq reshard)
    ulysses_size: int = 1
    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    # PipeFusion (reference group_coordinator.py:623
    # num_pipefusion_patches + DiffusionParallelConfig
    # .pipeline_parallel_size): DiT layers shard over a pp axis and
    # image patches pipeline through the stages with one-step-stale
    # cross-patch KV (diffusion/distributed/pipefusion.py)
    pipeline_parallel_size: int = 1
    # HSDP-equivalent weight sharding (reference diffusion/distributed/
    # hsdp.py): shard stacked DiT weights over the cfg x sp axes and
    # all-gather just-in-time per layer, so big DiTs span the mesh
    fsdp_weights: bool = False

    def __post_init__(self) -> None:
        if self.cfg_parallel_size not in (1, 2):
            raise ValueError("cfg_parallel_size must be 1 or 2")

    @property
    def world_size(self) -> int:
        return (
            self.cfg_parallel_size
            * self.ulysses_size
            * self.tensor_parallel_size
            * self.data_parallel_size
            * self.pipeline_parallel_size
        )


@dataclasses.dataclass
class DiTArchConfig:
    """Generic DiT transformer shape (flux/qwen-image-like)."""

    hidden_size: int = 512
    num_layers: int = 8
    num_heads: int = 8
    patch_size: int = 2
    in_channels: int = 4  # latent channels
    cond_dim: int = 512  # text-cond embedding width
    vocab_size: int = 256  # toy text encoder; real models pass embeds
    max_seq: int = 4096
    dtype: str = "bfloat16"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@dataclasses.dataclass
class DiffusionSamplingParams:
    """Per-request denoise controls (reference
    OmniDiffusionSamplingParams, inputs/data.py:174 — the most-used
    subset of its ~80 fields)."""

    height: int = 64
    width: int = 64
    num_inference_steps: int = 20
    guidance_scale: float = 4.0
    negative_prompt: str | None = None
    seed: int | None = None
    num_outputs: int = 1
    # streaming: emit intermediate latents every N steps (0 = off)
    stream_every: int = 0
    extra: dict[str, Any] = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class OmniDiffusionConfig:
    arch: DiTArchConfig = dataclasses.field(default_factory=DiTArchConfig)
    parallel: DiffusionParallelConfig = dataclasses.field(
        default_factory=DiffusionParallelConfig
    )
    model_path: str | None = None
    vae_scale: int = 8  # latent -> pixel upscale factor
    seed: int = 0
    # pipeline family (diffusion/registry.py); "generic" = plain DiT
    family: str = "generic"
    # extra kwargs for the family's pipeline constructor
    family_options: dict[str, Any] = dataclasses.field(default_factory=dict)
    # step/block caching: None | "tea_cache" | "cache_dit" (reference
    # cache_backend selection, async_omni_engine.py:782-800)
    cache_backend: str | None = None
    cache_config: dict[str, Any] = dataclasses.field(default_factory=dict)
