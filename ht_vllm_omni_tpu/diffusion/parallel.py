"""Diffusion parallel context: mesh + axis wiring for served requests.

Counterpart of the reference's diffusion worker distributed init
(reference vllm_omni/diffusion/worker/diffusion_worker.py:100-144
init_distributed_environment + initialize_model_parallel) and the
parallel-state the unified Attention layer consults per forward
(reference vllm_omni/diffusion/attention/layer.py:94).  TPU-first
expression: ONE jax.sharding.Mesh with named axes

    ("cfg", "sp", "tp")

built from OmniDiffusionConfig.parallel — cfg carries the two
classifier-free-guidance branches (distributed/cfg_parallel.py), sp is
Ulysses sequence parallel (distributed/sp_ulysses.py all_to_all
head<->seq reshard), tp is Megatron tensor parallel over attention heads
/ MLP channels with in-layer psums.  Pipelines receive the context at
construction (diffusion/registry.py create_pipeline(parallel=...)),
device_put their DiT weights with the pspecs below, and run every
denoise step inside one jit(shard_map(...)) over this mesh — so every
request served through DiffusionEngine (and therefore
/v1/images/generations) runs multichip, not just library calls.

Weight sharding (HSDP equivalent, reference
vllm_omni/diffusion/distributed/hsdp.py:88,177): with
``fsdp_weights=True`` the stacked-layer DiT leaves are additionally
sharded over the (cfg, sp) axes and all-gathered just-in-time at layer
entry inside the scan (same idiom as models/qwen2._gather_fsdp), so a
DiT whose weights exceed one chip's HBM spans the mesh:
per-device weight bytes ~= total / (cfg * sp * tp).
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ht_vllm_omni_tpu.diffusion.data import DiffusionParallelConfig

CFG_AXIS = "cfg"
PP_AXIS = "pp"
SP_AXIS = "sp"
TP_AXIS = "tp"


@dataclasses.dataclass(frozen=True)
class ShardInfo:
    """What a pipeline forward needs inside shard_map: axis names that
    are active (None = size 1, axis unused) and their sizes.  This is
    the TPU analog of the reference's get_*_parallel_group() lookups
    that its Attention layer performs per forward."""

    cfg_axis: str | None = None
    pp_axis: str | None = None
    sp_axis: str | None = None
    tp_axis: str | None = None
    cfg_size: int = 1
    pp_size: int = 1
    sp_size: int = 1
    tp_size: int = 1
    fsdp_axes: tuple[str, ...] | None = None  # weight-sharding axes

    @property
    def fsdp_size(self) -> int:
        if not self.fsdp_axes:
            return 1
        sizes = {CFG_AXIS: self.cfg_size, SP_AXIS: self.sp_size,
                 TP_AXIS: self.tp_size}
        n = 1
        for a in self.fsdp_axes:
            n *= sizes[a]
        return n


@dataclasses.dataclass(frozen=True)
class DiffusionParallelContext:
    mesh: Mesh
    info: ShardInfo

    @property
    def cfg_size(self) -> int:
        return self.info.cfg_size

    @property
    def pp_size(self) -> int:
        return self.info.pp_size

    @property
    def sp_size(self) -> int:
        return self.info.sp_size

    @property
    def tp_size(self) -> int:
        return self.info.tp_size

    @property
    def world_size(self) -> int:
        return (
            self.cfg_size * self.pp_size * self.sp_size * self.tp_size
        )

    def replicated(self, tree):
        """device_put a pytree fully replicated over this mesh."""
        sh = NamedSharding(self.mesh, P())
        return jax.tree.map(lambda x: jax.device_put(x, sh), tree)

    def shard(self, tree, specs: dict):
        """device_put a flat {name: leaf} dict with per-leaf pspecs."""
        return {
            k: jax.device_put(v, NamedSharding(self.mesh, specs[k]))
            for k, v in tree.items()
        }


def build_context(
    parallel: DiffusionParallelConfig,
    devices: list | None = None,
    fsdp_weights: bool = False,
) -> DiffusionParallelContext | None:
    """Mesh from OmniDiffusionConfig.parallel; None when world_size==1.

    ulysses_size -> sp axis, cfg_parallel_size -> cfg axis,
    tensor_parallel_size -> tp axis (innermost: its per-layer psums ride
    the fastest ICI loops).  data_parallel_size is consumed by the
    engine's request-level batching, not the mesh.
    """
    cfg_n = parallel.cfg_parallel_size
    pp_n = getattr(parallel, "pipeline_parallel_size", 1)
    sp_n = parallel.ulysses_size
    tp_n = parallel.tensor_parallel_size
    n = cfg_n * pp_n * sp_n * tp_n
    if n == 1:
        return None
    devices = devices if devices is not None else jax.devices()
    if len(devices) < n:
        raise ValueError(
            f"diffusion parallel cfg{cfg_n} x pp{pp_n} x sp{sp_n} x "
            f"tp{tp_n} needs {n} devices, have {len(devices)}"
        )
    arr = np.asarray(devices[:n]).reshape(cfg_n, pp_n, sp_n, tp_n)
    mesh = Mesh(arr, (CFG_AXIS, PP_AXIS, SP_AXIS, TP_AXIS))
    fsdp_axes: tuple[str, ...] | None = None
    if fsdp_weights:
        # shard weights over every non-tp axis that exists (tp leaves are
        # already 1/tp by Megatron layout)
        fsdp_axes = tuple(
            a for a, s in ((CFG_AXIS, cfg_n), (SP_AXIS, sp_n)) if s > 1
        ) or None
    info = ShardInfo(
        cfg_axis=CFG_AXIS if cfg_n > 1 else None,
        pp_axis=PP_AXIS if pp_n > 1 else None,
        sp_axis=SP_AXIS if sp_n > 1 else None,
        tp_axis=TP_AXIS if tp_n > 1 else None,
        cfg_size=cfg_n,
        pp_size=pp_n,
        sp_size=sp_n,
        tp_size=tp_n,
        fsdp_axes=fsdp_axes,
    )
    return DiffusionParallelContext(mesh=mesh, info=info)
