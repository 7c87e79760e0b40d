"""Mesh construction + sharding rules for AR stages.

One jax.sharding.Mesh per stage with named axes over ICI (SURVEY §2.6's
TPU mapping): "dp" shards request slots (and their KV pages); "tp" shards
attention heads / MLP channels Megatron-style, with the two per-layer
psums expressed inside shard_map (XLA's latency-hiding scheduler overlaps
them with compute).  The reference's RankGenerator order tp-sp-pp-cfg-dp
(parallel_state.py:788) maps here to mesh axis order (dp, tp): tp
innermost so its all-reduces ride the fastest ICI loops.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ht_vllm_omni_tpu.config import ModelArchConfig

DP_AXIS = "dp"
PP_AXIS = "pp"
EP_AXIS = "ep"
TP_AXIS = "tp"


@dataclasses.dataclass
class MeshConfig:
    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    pipeline_parallel_size: int = 1
    # Dedicated expert-parallel axis (reference carves EP out of
    # world \ pp via RankGenerator, parallel_state.py:256-263,854-864):
    # experts shard over ep x tp jointly while dense layers stay
    # tp-sharded / ep-replicated, so a 30B-A3B can run e.g. ep4 x tp2
    # where attention wants tp=2 but 128 experts want 8-way spread.
    expert_parallel_size: int = 1

    @property
    def world_size(self) -> int:
        return (
            self.tensor_parallel_size
            * self.data_parallel_size
            * self.pipeline_parallel_size
            * self.expert_parallel_size
        )


def make_mesh(
    cfg: MeshConfig, devices: list | None = None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = cfg.world_size
    if len(devices) < n:
        raise ValueError(
            f"mesh needs {n} devices, have {len(devices)}"
        )
    arr = np.asarray(devices[:n]).reshape(
        cfg.data_parallel_size,
        cfg.pipeline_parallel_size,
        cfg.expert_parallel_size,
        cfg.tensor_parallel_size,
    )
    return Mesh(arr, (DP_AXIS, PP_AXIS, EP_AXIS, TP_AXIS))


def param_pspecs(
    cfg: ModelArchConfig, fsdp: bool = False, pp: bool = False,
    ep: bool = False,
) -> dict[str, P]:
    """Megatron-style layout: qkv column-parallel, o row-parallel,
    gate/up column-parallel, down row-parallel; norms + embeddings
    replicated (vocab sharding comes with multi-host).

    ``fsdp``: additionally shard each stacked weight's hidden-size dim
    over dp (HSDP-equivalent; gathered just-in-time inside the layer
    scan — qwen2._gather_fsdp).  ``pp``: shard the stacked layer axis
    over the pp mesh axis (each pipeline stage owns L/pp layers)."""
    dpx = DP_AXIS if fsdp else None
    ppx = PP_AXIS if pp else None
    # Expert dim over ep (major) x tp (minor) when the mesh carries a
    # dedicated ep axis — each (ep, tp) pair owns E/(ep*tp) whole
    # experts; dense layers never mention ep, so they replicate across
    # it and the MoE partial is psum'd over ep inside qwen2._mlp.
    epx = (EP_AXIS, TP_AXIS) if ep else TP_AXIS
    specs = {
        "embed": P(),
        "ln1": P(ppx),
        "ln2": P(ppx),
        "post_ln1": P(ppx),
        "post_ln2": P(ppx),
        "wq": P(ppx, dpx, TP_AXIS),
        "wk": P(ppx, dpx, TP_AXIS),
        "wv": P(ppx, dpx, TP_AXIS),
        "wo": P(ppx, TP_AXIS, dpx),
        "gate": P(ppx, dpx, TP_AXIS),
        "up": P(ppx, dpx, TP_AXIS),
        "down": P(ppx, TP_AXIS, dpx),
        "norm_f": P(),
        "lm_head": P(None, TP_AXIS),
        "bq": P(ppx, TP_AXIS),
        "bk": P(ppx, TP_AXIS),
        "bv": P(ppx, TP_AXIS),
        "q_norm": P(ppx),
        "k_norm": P(ppx),
        # MoE: router replicated, experts sharded over the expert axes
        # (tp, or ep x tp with a dedicated ep axis); fsdp shards the
        # expert hidden dim
        "router": P(ppx),
        "egate": P(ppx, epx, dpx, None),
        "eup": P(ppx, epx, dpx, None),
        "edown": P(ppx, epx, None, dpx),
        # shared expert: dense Megatron layout; its sigmoid gate replicated
        "sgate": P(ppx, dpx, TP_AXIS),
        "sup": P(ppx, dpx, TP_AXIS),
        "sdown": P(ppx, TP_AXIS, dpx),
        "shared_gate": P(ppx),
        # MammothModa2 dual und/gen FFN: both experts column/row-parallel
        # like a dense Megatron MLP (deterministic 2-way routing)
        "dgate": P(ppx, None, dpx, TP_AXIS),
        "dup": P(ppx, None, dpx, TP_AXIS),
        "ddown": P(ppx, None, TP_AXIS, dpx),
    }
    # quantized leaves follow their base weight's layout; group/channel
    # scales live on whichever dim survives: col-parallel weights shard
    # scales on the out dim, row-parallel weights keep scales replicated
    # on out but shard int4 K-groups.  fsdp additionally shards the
    # int8/fp8 [L, K, N] leaves like their bf16 twins (per-channel
    # scales stay whole); packed int4/AWQ leaves never see fsdp (the
    # runner rejects that combination).
    for name in ("wq", "wk", "wv", "gate", "up"):  # column-parallel
        specs[name + ":q8"] = P(ppx, dpx, TP_AXIS)
        specs[name + ":q4"] = P(ppx, None, TP_AXIS)
        specs[name + ":f8"] = P(ppx, dpx, TP_AXIS)
        specs[name + ":q4z"] = P(ppx, None, TP_AXIS)
        specs[name + ":s8"] = P(ppx, TP_AXIS)  # [L, N]
        specs[name + ":sf8"] = P(ppx, TP_AXIS)  # [L, N]
        specs[name + ":s4"] = P(ppx, None, TP_AXIS)  # [L, K/G, N]
        specs[name + ":s4z"] = P(ppx, None, TP_AXIS)
        specs[name + ":z4"] = P(ppx, None, TP_AXIS)
    # quantized output head (2-D [H, V] copy, tied or not): replicated
    # like the tied embedding so every shard samples on full logits
    for suf in (":q8", ":q4", ":f8", ":q4z", ":s8", ":sf8", ":s4",
                ":s4z", ":z4"):
        specs["lm_head" + suf] = P()
    for name in ("wo", "down"):  # row-parallel
        specs[name + ":q8"] = P(ppx, TP_AXIS, dpx)
        specs[name + ":q4"] = P(ppx, TP_AXIS, None)
        specs[name + ":f8"] = P(ppx, TP_AXIS, dpx)
        specs[name + ":q4z"] = P(ppx, TP_AXIS, None)
        specs[name + ":s8"] = P(ppx)  # [L, N]
        specs[name + ":sf8"] = P(ppx)  # [L, N]
        specs[name + ":s4"] = P(ppx, TP_AXIS, None)  # K-groups sharded
        specs[name + ":s4z"] = P(ppx, TP_AXIS, None)
        specs[name + ":z4"] = P(ppx, TP_AXIS, None)
    return specs


def cache_pspec(pp: bool = False) -> P:
    """KV cache [L, NSLOTS, 2F]: layers over pp (each pipeline stage
    caches only its own layers), pages over dp, kv features over tp."""
    return P(PP_AXIS if pp else None, DP_AXIS, TP_AXIS)


def shard_params(params: dict, mesh: Mesh) -> dict:
    specs = param_pspecs(None)
    return {
        k: jax.device_put(v, NamedSharding(mesh, specs[k]))
        for k, v in params.items()
    }


def validate_tp(cfg: ModelArchConfig, tp: int, ep: int = 1) -> None:
    if cfg.num_experts and cfg.num_experts % (ep * tp) != 0:
        raise ValueError(
            f"experts {cfg.num_experts} not divisible by "
            f"ep*tp={ep}*{tp}"
        )
    if ep > 1 and not cfg.num_experts:
        raise ValueError("expert_parallel_size > 1 on a dense model")
    if cfg.num_attention_heads % tp != 0:
        raise ValueError(
            f"q heads {cfg.num_attention_heads} not divisible by tp={tp}"
        )
    if cfg.num_key_value_heads % tp != 0:
        raise ValueError(
            f"kv heads {cfg.num_key_value_heads} not divisible by tp={tp}"
            " (kv-head replication not yet implemented)"
        )
