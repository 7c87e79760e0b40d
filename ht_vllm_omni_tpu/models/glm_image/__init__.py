"""GLM-Image AR family: GLM-4 trunk (sandwich norms, partial
interleaved rotary — models/qwen2.py flags) generating VQ prior tokens
for the GLM-Image DiT (reference
vllm_omni/model_executor/models/glm_image/glm_image_ar.py)."""
