"""Device-mesh parallelism (TPU-native replacement of the reference's
torch.distributed/NCCL process groups, reference
vllm_omni/diffusion/distributed/parallel_state.py)."""

from ht_vllm_omni_tpu.parallel.mesh import (
    MeshConfig,
    cache_pspec,
    make_mesh,
    param_pspecs,
)

__all__ = ["MeshConfig", "make_mesh", "param_pspecs", "cache_pspec"]
