"""Diffusion (DiT) engine: request scheduling, denoise loop, CFG/SP
parallelism — TPU-native rebuild of the reference's largest subsystem
(reference vllm_omni/diffusion/, 72k LoC)."""
