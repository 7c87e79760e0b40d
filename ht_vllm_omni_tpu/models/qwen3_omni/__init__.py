"""Qwen3-Omni model stack (thinker encoders, talker, codec) in jax.

Real-model counterparts of the reference's Qwen3-Omni family (reference
vllm_omni/model_executor/models/qwen3_omni/): each module is implemented
TPU-first in jax with an HF-weight loader, and numerics are pinned to
the transformers implementation by tiny-random parity tests
(tests/models/test_qwen3_omni_*).
"""
