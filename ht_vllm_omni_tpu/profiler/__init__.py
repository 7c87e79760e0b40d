from ht_vllm_omni_tpu.profiler.omni_profiler import OmniProfiler

__all__ = ["OmniProfiler"]
