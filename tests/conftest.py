"""Test bootstrap: run the whole stack on a virtual 8-device CPU mesh.

Mirrors the reference's CPU-forcing conftest (reference tests/conftest.py:14-16)
— unit tests never require real hardware; Pallas kernels run in interpreter
mode (selected automatically by ht_vllm_omni_tpu.utils.platform).
"""

import os
import sys

# The ambient environment pins JAX_PLATFORMS to the TPU plugin (which also
# overrides the env var at import time), so force the platform through
# jax.config — this works as long as no backend has been initialised yet.
# Override with HT_OMNI_TEST_PLATFORM=tpu to exercise real hardware.
_platform = os.environ.get("HT_OMNI_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

# Persistent compilation cache across test runs/processes: the suite is
# dominated by XLA CPU compiles of the same tiny engines (VERDICT r2:
# >30 min sequential); cached, repeat runs fit the CI budget.  Shared
# safely across pytest-xdist workers (the cache is content-addressed).
_cache_dir = os.environ.get(
    "HT_OMNI_TEST_CACHE",
    os.path.join(
        os.path.expanduser("~"), ".cache", "ht_omni_test_xla"
    ),
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
try:
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:  # older jax: flag absent
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
