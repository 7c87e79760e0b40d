"""Fleet-wide profiling wrapper.

Counterpart of the reference OmniTorchProfilerWrapper (reference
vllm_omni/profiler/omni_torch_profiler.py:29-72, started through
collective_rpc("profile") and the /start_profile HTTP endpoints): on TPU
this wraps jax.profiler (xplane traces readable in TensorBoard /
XProf) with stage-tagged trace directories, plus named annotation spans
for the orchestrator hot paths (the NVTX-range analog).
"""

from __future__ import annotations

import contextlib
import os
import time

import jax


class OmniProfiler:
    def __init__(self, base_dir: str = "/tmp/ht_omni_traces") -> None:
        self.base_dir = base_dir
        self.active_dir: str | None = None

    def start(self, tag: str = "omni") -> str:
        stamp = time.strftime("%Y%m%d-%H%M%S")
        self.active_dir = os.path.join(self.base_dir, f"{tag}-{stamp}")
        os.makedirs(self.active_dir, exist_ok=True)
        jax.profiler.start_trace(self.active_dir)
        return self.active_dir

    def stop(self) -> str | None:
        jax.profiler.stop_trace()
        out, self.active_dir = self.active_dir, None
        return out

    @contextlib.contextmanager
    def span(self, name: str):
        """Named annotation visible in the trace timeline (NVTX analog)."""
        with jax.profiler.TraceAnnotation(name):
            yield

    @contextlib.contextmanager
    def trace(self, tag: str = "omni"):
        self.start(tag)
        try:
            yield self
        finally:
            self.stop()
