"""Stage / pipeline DAG configuration.

Schema-compatible rebuild of the reference's StageConfigFactory (reference
vllm_omni/config/stage_config.py:224 and per-model pipeline.yaml files,
e.g. vllm_omni/model_executor/models/qwen3_tts/pipeline.yaml): a pipeline
is a list of stages (llm | diffusion; worker_type ar | generation) joined
by connector-typed edges, with per-stage engine args, default sampling
params and final-output flags.

Differences from the reference: no vLLM EngineArgs inheritance — stage
engine args map onto ht_vllm_omni_tpu EngineConfig; ``runtime.devices``
selects a sub-mesh instead of CUDA_VISIBLE_DEVICES.
"""

from __future__ import annotations

import dataclasses
import enum
import os
from typing import Any

import yaml


class StageType(str, enum.Enum):
    LLM = "llm"
    DIFFUSION = "diffusion"


@dataclasses.dataclass
class ConnectorSpec:
    name: str = "InMemoryConnector"
    extra: dict[str, Any] = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class EdgeSpec:
    from_stage: int
    to_stage: int
    # async-chunk window: -1 = whole-output handoff, N>0 = chunked
    window_size: int = -1
    connector: str | None = None


@dataclasses.dataclass
class StageConfig:
    stage_id: int
    model_stage: str
    stage_type: StageType = StageType.LLM
    input_sources: list[int] = dataclasses.field(default_factory=list)
    worker_type: str = "ar"  # "ar" | "generation"
    scheduler_cls: str | None = None
    final_output: bool = False
    final_output_type: str | None = None  # "text" | "audio" | "image" | ...
    is_comprehension: bool = False
    # conversion hook applied when forwarding this stage's outputs to the
    # next stage (reference custom_process_next_stage_input_func)
    custom_process_next_stage_input_func: str | None = None
    custom_process_input_func: str | None = None
    # CFG companion hooks (reference stage_config fields consumed by
    # CfgCompanionTracker / receive_multi_kv_cache): stage 0 may expand
    # each prompt into shadow companion requests; a downstream stage may
    # declare how to collect their KV payloads.
    custom_prompt_expand_func: str | None = None
    custom_cfg_kv_collect_func: str | None = None
    engine_args: dict[str, Any] = dataclasses.field(default_factory=dict)
    runtime: dict[str, Any] = dataclasses.field(default_factory=dict)
    default_sampling_params: dict[str, Any] = dataclasses.field(
        default_factory=dict
    )
    output_connectors: dict[str, str] = dataclasses.field(default_factory=dict)
    input_connectors: dict[str, str] = dataclasses.field(default_factory=dict)
    extra: dict[str, Any] = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class PipelineConfig:
    model_type: str
    stages: list[StageConfig]
    connectors: dict[str, ConnectorSpec] = dataclasses.field(
        default_factory=dict
    )
    edges: list[EdgeSpec] = dataclasses.field(default_factory=list)
    async_chunk: bool = False

    def stage(self, stage_id: int) -> StageConfig:
        for s in self.stages:
            if s.stage_id == stage_id:
                return s
        raise KeyError(stage_id)

    def final_stage_ids(self) -> list[int]:
        return [s.stage_id for s in self.stages if s.final_output]

    def downstream_of(self, stage_id: int) -> list[int]:
        return [
            s.stage_id for s in self.stages if stage_id in s.input_sources
        ]

    def edge(self, from_stage: int, to_stage: int) -> EdgeSpec | None:
        for e in self.edges:
            if e.from_stage == from_stage and e.to_stage == to_stage:
                return e
        return None

    def validate(self) -> None:
        ids = [s.stage_id for s in self.stages]
        if sorted(ids) != list(range(len(ids))):
            raise ValueError(f"stage ids must be 0..n-1, got {ids}")
        for s in self.stages:
            for src in s.input_sources:
                if src not in ids:
                    raise ValueError(
                        f"stage {s.stage_id} references unknown input {src}"
                    )
                if src >= s.stage_id:
                    raise ValueError(
                        "pipeline must be a forward DAG: "
                        f"{src} -> {s.stage_id}"
                    )
        if not any(s.final_output for s in self.stages):
            self.stages[-1].final_output = True
        for e in self.edges:
            if e.connector is not None and e.connector not in self.connectors:
                raise ValueError(f"edge uses unknown connector {e.connector}")


_STAGE_FIELDS = {f.name for f in dataclasses.fields(StageConfig)}


def _parse_stage(raw: dict[str, Any]) -> StageConfig:
    known: dict[str, Any] = {}
    extra: dict[str, Any] = {}
    for key, value in raw.items():
        if key == "stage_type":
            known[key] = StageType(value)
        elif key in _STAGE_FIELDS:
            known[key] = value
        else:
            extra[key] = value
    known.setdefault("engine_args", {})
    known["extra"] = extra
    return StageConfig(**known)


def load_pipeline_config(source: str | dict[str, Any]) -> PipelineConfig:
    """Load from a YAML path or an already-parsed dict."""
    if isinstance(source, str):
        with open(source) as f:
            raw = yaml.safe_load(f)
    else:
        raw = dict(source)

    stages = [_parse_stage(s) for s in raw.get("stages", [])]
    connectors = {
        name: ConnectorSpec(
            name=c.get("name", "InMemoryConnector"),
            extra=c.get("extra", {}),
        )
        for name, c in (raw.get("connectors") or {}).items()
    }
    edges = [
        EdgeSpec(
            from_stage=e["from"],
            to_stage=e["to"],
            window_size=e.get("window_size", -1),
            connector=e.get("connector"),
        )
        for e in (raw.get("edges") or [])
    ]
    cfg = PipelineConfig(
        model_type=raw.get("model_type", "unknown"),
        stages=stages,
        connectors=connectors,
        edges=edges,
        async_chunk=bool(raw.get("async_chunk", False)),
    )
    cfg.validate()
    return cfg


def apply_stage_overrides(
    cfg: PipelineConfig, overrides: dict[str, Any]
) -> PipelineConfig:
    """CLI-style per-stage overrides: keys like ``stage_1.max_num_seqs``
    (reference --stage-N-* args, stage_config.py:562-607); bare keys apply
    to every stage's engine args."""
    for key, value in overrides.items():
        if key.startswith("stage_"):
            head, _, sub = key.partition(".")
            sid = int(head.split("_", 1)[1])
            cfg.stage(sid).engine_args[sub] = value
        else:
            for s in cfg.stages:
                s.engine_args[key] = value
    return cfg


def builtin_pipeline_path(model_type: str) -> str:
    """pipeline.yaml bundled with a model family under models/<name>/."""
    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "models",
        model_type,
        "pipeline.yaml",
    )
    return base
