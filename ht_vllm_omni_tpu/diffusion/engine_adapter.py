"""Build a diffusion stage engine from pipeline-YAML stage config."""

from __future__ import annotations

from ht_vllm_omni_tpu.config.stage_config import StageConfig
from ht_vllm_omni_tpu.diffusion.data import (
    DiffusionParallelConfig,
    DiffusionSamplingParams,
    DiTArchConfig,
    OmniDiffusionConfig,
)
from ht_vllm_omni_tpu.diffusion.diffusion_engine import DiffusionEngine


def build_diffusion_stage(cfg: StageConfig, model_path: str | None):
    args = dict(cfg.engine_args)
    arch = DiTArchConfig(**args.get("dit_arch", {}))
    od = OmniDiffusionConfig(
        arch=arch,
        parallel=DiffusionParallelConfig(**args.get("parallel", {})),
        model_path=args.get("model", model_path),
        seed=args.get("seed", 0),
        family=args.get("family", "generic"),
        family_options=args.get("family_options", {}) or {},
        cache_backend=args.get("cache_backend"),
        cache_config=args.get("cache_config", {}) or {},
    )
    defaults = DiffusionSamplingParams(
        **{
            k: v
            for k, v in cfg.default_sampling_params.items()
            if k in DiffusionSamplingParams.__dataclass_fields__
        }
    )
    return DiffusionEngine(od, default_params=defaults)
