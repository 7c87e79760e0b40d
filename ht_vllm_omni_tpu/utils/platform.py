"""Platform probing.

The reference framework has a platform registry selecting CUDA/ROCm/NPU/XPU
workers (reference vllm_omni/platforms/interface.py:21).  Here there are only
two execution substrates: real TPU (Pallas kernels compiled by Mosaic) and
CPU (kernels run in the Pallas interpreter so the full stack is testable
without hardware).
"""

import functools
import os

import jax


@functools.cache
def setup_compilation_cache() -> None:
    """Enable jax's persistent compilation cache (first TPU compile of the
    full decode program costs minutes; cached reruns are seconds)."""
    path = os.environ.get(
        "HT_OMNI_COMPILE_CACHE", os.path.expanduser("~/.cache/jax_comp_cache")
    )
    if path in ("", "0", "off"):
        return
    if jax.default_backend() != "tpu":
        # CPU AOT artifacts are machine-feature sensitive and tests don't
        # need the cache; only the (minutes-long) TPU compiles do.
        return
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@functools.cache
def backend_name() -> str:
    return jax.default_backend()


def is_tpu_backend() -> bool:
    return backend_name() == "tpu"


def pallas_interpret_mode() -> bool:
    """Whether pallas_call should run in interpreter mode.

    True when no TPU is attached (e.g. the CPU test mesh), or when forced
    via HT_OMNI_PALLAS_INTERPRET=1.
    """
    forced = os.environ.get("HT_OMNI_PALLAS_INTERPRET")
    if forced is not None:
        return forced == "1"
    return not is_tpu_backend()
