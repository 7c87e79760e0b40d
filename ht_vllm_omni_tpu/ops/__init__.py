"""TPU compute kernels (Pallas) and jnp-level fused ops.

These replace the CUDA kernel stack the reference leans on (upstream vLLM
paged-attention, flash-attn 2/3, see reference SURVEY §2.9):

- flash_attention: causal/full attention for prefill (MXU-tiled online softmax)
- paged_attention: block-table decode attention over the paged KV cache
- quant ops: weight-only INT8/INT4 fused dequant+matmul
- norm/rope/activation: jnp-level, fused by XLA
"""
