"""MiMo-Audio family (global Qwen2 thinker + local RVQ patch decoder),
reference vllm_omni/model_executor/models/mimo_audio/."""
