"""Qwen2.5-Omni family: thinker/talker trunks + token2wav (flow-match
DiT mel generator + BigVGAN vocoder), reference
vllm_omni/model_executor/models/qwen2_5_omni/."""
