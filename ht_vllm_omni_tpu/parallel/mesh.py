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
TP_AXIS = "tp"


@dataclasses.dataclass
class MeshConfig:
    tensor_parallel_size: int = 1
    data_parallel_size: int = 1

    @property
    def world_size(self) -> int:
        return self.tensor_parallel_size * self.data_parallel_size


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
        cfg.data_parallel_size, cfg.tensor_parallel_size
    )
    return Mesh(arr, (DP_AXIS, TP_AXIS))


def param_pspecs(cfg: ModelArchConfig) -> dict[str, P]:
    """Megatron-style layout: qkv column-parallel, o row-parallel,
    gate/up column-parallel, down row-parallel; norms + embeddings
    replicated (vocab sharding comes with multi-host)."""
    specs = {
        "embed": P(),
        "ln1": P(),
        "ln2": P(),
        "wq": P(None, None, TP_AXIS),
        "wk": P(None, None, TP_AXIS),
        "wv": P(None, None, TP_AXIS),
        "wo": P(None, TP_AXIS, None),
        "gate": P(None, None, TP_AXIS),
        "up": P(None, None, TP_AXIS),
        "down": P(None, TP_AXIS, None),
        "norm_f": P(),
        "lm_head": P(None, TP_AXIS),
        "bq": P(None, TP_AXIS),
        "bk": P(None, TP_AXIS),
        "bv": P(None, TP_AXIS),
        "q_norm": P(),
        "k_norm": P(),
        # MoE: router replicated, experts sharded over tp (expert parallel)
        "router": P(),
        "egate": P(None, TP_AXIS, None, None),
        "eup": P(None, TP_AXIS, None, None),
        "edown": P(None, TP_AXIS, None, None),
        # shared expert: dense Megatron layout; its sigmoid gate replicated
        "sgate": P(None, None, TP_AXIS),
        "sup": P(None, None, TP_AXIS),
        "sdown": P(None, TP_AXIS, None),
        "shared_gate": P(),
    }
    # quantized leaves follow their base weight's layout; group/channel
    # scales live on whichever dim survives: col-parallel weights shard
    # scales on the out dim, row-parallel weights keep scales replicated
    # on out but shard int4 K-groups.
    for name in ("wq", "wk", "wv", "gate", "up"):  # column-parallel
        specs[name + ":q8"] = P(None, None, TP_AXIS)
        specs[name + ":q4"] = P(None, None, TP_AXIS)
        specs[name + ":s8"] = P(None, TP_AXIS)  # [L, N]
        specs[name + ":s4"] = P(None, None, TP_AXIS)  # [L, K/G, N]
    for name in ("wo", "down"):  # row-parallel
        specs[name + ":q8"] = P(None, TP_AXIS, None)
        specs[name + ":q4"] = P(None, TP_AXIS, None)
        specs[name + ":s8"] = P()  # [L, N] replicated
        specs[name + ":s4"] = P(None, TP_AXIS, None)  # K-groups sharded
    return specs


def cache_pspec() -> P:
    """KV cache [L, NSLOTS, 2F]: pages over dp, kv-head features over tp."""
    return P(None, DP_AXIS, TP_AXIS)


def shard_params(params: dict, mesh: Mesh) -> dict:
    specs = param_pspecs(None)
    return {
        k: jax.device_put(v, NamedSharding(mesh, specs[k]))
        for k, v in params.items()
    }


def validate_tp(cfg: ModelArchConfig, tp: int) -> None:
    if cfg.num_experts and cfg.num_experts % tp != 0:
        raise ValueError(
            f"experts {cfg.num_experts} not divisible by tp={tp}"
        )
    if cfg.num_attention_heads % tp != 0:
        raise ValueError(
            f"q heads {cfg.num_attention_heads} not divisible by tp={tp}"
        )
    if cfg.num_key_value_heads % tp != 0:
        raise ValueError(
            f"kv heads {cfg.num_key_value_heads} not divisible by tp={tp}"
            " (kv-head replication not yet implemented)"
        )
