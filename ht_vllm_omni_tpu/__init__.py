"""ht_vllm_omni_tpu: a TPU-native omni-modality inference and serving framework.

A from-scratch jax/XLA/Pallas/pjit re-design of the capabilities of
vLLM-Omni (reference: /root/reference vllm_omni/): quantized AR decoding with
paged-KV continuous batching, a heterogeneous multi-stage pipeline runtime
(thinker -> talker -> codec decoder, DiT diffusion stages), connector-based
stage-to-stage tensor/KV transfer with async-chunk streaming, and an
OpenAI-compatible serving layer.

Unlike the reference (an extension layer monkey-patching upstream vLLM,
see reference vllm_omni/patch.py:52-67), everything here is first-class:
prompt embeddings, additional_information payloads and multimodal outputs
are native fields of the request/output types.
"""

__version__ = "0.1.0"

__all__ = [
    "__version__",
]

import os as _os

if _os.environ.get("HT_OMNI_PLATFORM"):
    # Subprocess-level platform pin.  TPU plugin environments override
    # the JAX_PLATFORMS env var at import time, so child processes
    # (example tests, server subprocesses, CLI tools) cannot opt out of
    # the device through the environment alone; setting
    # HT_OMNI_PLATFORM=cpu routes them through jax.config before any
    # backend initialises — also keeps parallel test runners from
    # fighting over the single TPU.
    import jax as _jax

    _jax.config.update(
        "jax_platforms", _os.environ["HT_OMNI_PLATFORM"]
    )
