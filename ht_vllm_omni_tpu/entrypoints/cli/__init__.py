"""CLI entrypoints (``python -m ht_vllm_omni_tpu serve ...``)."""
