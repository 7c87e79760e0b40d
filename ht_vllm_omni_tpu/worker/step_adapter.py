"""Per-step decode adapters.

Some AR families do not sample their next token from the trunk's LM
head: each decode step's hidden state drives a model-specific head
whose outputs (a) determine a forced next token and (b) feed back into
the next step's input embedding.  The reference implements this with
``make_omni_output`` + ``embed_multimodal`` round trips through the
engine loop (e.g. Voxtral TTS: flow-matching acoustic transformer +
MultiVocabEmbeddings feedback, reference vllm_omni/model_executor/
models/voxtral_tts/voxtral_tts.py:286, voxtral_tts_audio_generation.py
:1012).  Here the hooks run *inside* the runner's compiled lax.scan
decode chunk — no per-step host round trip.

An adapter provides:

- ``aux_width``: columns of the per-slot int32 aux state (column 0 is
  a validity flag; the rest is adapter-defined, e.g. audio codes).
- ``init_params() -> dict[str, Array]``: flat params, merged into the
  runner's param dict under ``step_adapter/<name>`` keys (replicated
  under a mesh).
- ``embed(params, tokens, aux) -> [S, H]``: next-step input embedding
  (aux row valid) or plain token embedding (fresh slot).
- ``head(params, hidden, positions) -> (tokens [S], aux [S, W])``:
  per-step outputs from the hidden state; ``positions`` are the
  producing positions (used for deterministic per-frame RNG so the
  stage edge can recompute identical outputs from exported hidden
  states).
"""

from __future__ import annotations

import importlib
from typing import Any

PARAM_PREFIX = "step_adapter/"

# name -> "module:function(spec, arch_cfg, seed) -> adapter"
_BUILDERS: dict[str, str] = {
    "voxtral_tts": "ht_vllm_omni_tpu.models.voxtral_tts.adapter:build",
    "mimo_audio": "ht_vllm_omni_tpu.models.mimo_audio.adapter:build",
}


def build_step_adapter(spec: dict, arch_cfg: Any, seed: int = 0):
    name = spec.get("name")
    target = _BUILDERS.get(name)
    if target is None:
        raise ValueError(
            f"unknown step adapter {name!r}; known: {sorted(_BUILDERS)}"
        )
    mod_name, fn_name = target.split(":")
    return getattr(importlib.import_module(mod_name), fn_name)(
        spec, arch_cfg, seed
    )


def sub_params(params: dict) -> dict:
    """Collect the adapter's own params out of the runner param dict."""
    n = len(PARAM_PREFIX)
    return {
        k[n:]: v for k, v in params.items() if k.startswith(PARAM_PREFIX)
    }
