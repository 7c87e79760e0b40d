"""MiMo-Audio per-step decode adapter.

Implements the worker/step_adapter.py hooks for the MiMo-Audio fused
thinker-talker loop (reference vllm_omni/model_executor/models/
mimo_audio/mimo_audio_llm.py):

- ``head``: greedy-sample the global next token from the trunk LM head
  (the reference global MiMoSampler runs with do_sample=False, :541)
  and, from the same hidden state, run the local transformer to emit a
  ``group_size x audio_channels`` patch of RVQ codes (base_local_forward
  :787-839).  The codes ride in the aux row.
- ``embed``: where the next token is <|empty|> and an aux row is valid,
  the input embedding is the re-encoded previous patch
  (_prepare_multimodal_embeddings_with_cache :920-950 — input-local
  transformer over the group, concatenated and downcast); otherwise the
  plain token embedding.

The local loop is greedy, so the stage edge can regenerate identical
codes from exported hidden states via ``expand`` with no RNG contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.models.mimo_audio import local_model
from ht_vllm_omni_tpu.models.mimo_audio.config import (
    MiMoAudioAdapterConfig,
)
from ht_vllm_omni_tpu.worker.step_adapter import sub_params


class MiMoAudioStepAdapter:
    def __init__(
        self,
        acfg: MiMoAudioAdapterConfig,
        arch_cfg,
        seed: int = 0,
        params: dict | None = None,
    ) -> None:
        self.acfg = acfg
        self.arch_cfg = arch_cfg
        self.seed = seed
        self._params = params
        self.aux_width = 1 + acfg.group_size * acfg.audio_channels
        self._expand_fns: dict[int, object] = {}

    # ---------------------------------------------------- runner hooks
    def init_params(self) -> dict:
        if self._params is None:
            self._params = local_model.init_params(
                self.acfg, jax.random.PRNGKey(self.seed + 29)
            )
        return self._params

    def embed(self, params, tokens, aux):
        from ht_vllm_omni_tpu.models import qwen2

        p = sub_params(params)
        tok_e = qwen2.embed_tokens(params, tokens)
        g, c = self.acfg.group_size, self.acfg.audio_channels
        codes = aux[:, 1:].reshape(-1, g, c)
        fb = local_model.reembed(self.acfg, p, codes)
        use_fb = (aux[:, 0] > 0) & (tokens == self.acfg.empty_token_id)
        return jnp.where(use_fb[:, None], fb.astype(tok_e.dtype), tok_e)

    def head(self, params, hidden, positions):
        from ht_vllm_omni_tpu.models import qwen2

        p = sub_params(params)
        logits = qwen2.compute_logits(self.arch_cfg, params, hidden)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        seed = hidden.astype(jnp.float32) @ p["hs_downcast"]
        codes = local_model.local_decode(self.acfg, p, seed)
        aux = jnp.concatenate(
            [
                jnp.ones((codes.shape[0], 1), jnp.int32),
                codes.reshape(codes.shape[0], -1),
            ],
            axis=1,
        )
        return tok, aux

    # ------------------------------------------------------- stage edge
    def expand(
        self, hidden: np.ndarray, first_position: int = 0
    ) -> np.ndarray:
        """Recompute code patches [n, G, C] from exported hidden states
        [n, H] (greedy local decode is deterministic, so these equal
        the in-loop codes)."""
        n = len(hidden)
        g, c = self.acfg.group_size, self.acfg.audio_channels
        if n == 0:
            return np.zeros((0, g, c), np.int32)
        bucket = 1
        while bucket < n:
            bucket *= 2
        fn = self._expand_fns.get(bucket)
        if fn is None:
            acfg = self.acfg

            def run(p, h):
                seed = h @ p["hs_downcast"]
                return local_model.local_decode(acfg, p, seed)

            fn = jax.jit(run)
            self._expand_fns[bucket] = fn
        h_pad = np.zeros((bucket, hidden.shape[1]), np.float32)
        h_pad[:n] = hidden
        return np.asarray(fn(self.init_params(), h_pad))[:n]


def build(spec: dict, arch_cfg, seed: int = 0) -> MiMoAudioStepAdapter:
    """step_adapter registry hook: spec = {"name": "mimo_audio",
    "adapter": {...MiMoAudioAdapterConfig kwargs...}}."""
    kwargs = dict(spec.get("adapter", {}))
    for tkey in ("speech_vocab_sizes", "speech_empty_ids",
                 "delay_pattern"):
        if tkey in kwargs:
            kwargs[tkey] = tuple(kwargs[tkey])
    for lkey in ("local", "input_local"):
        if lkey in kwargs and isinstance(kwargs[lkey], dict):
            from ht_vllm_omni_tpu.models.mimo_audio.config import (
                MiMoLocalCfg,
            )

            kwargs[lkey] = MiMoLocalCfg(**kwargs[lkey])
    kwargs.setdefault("llm_hidden", arch_cfg.hidden_size)
    acfg = MiMoAudioAdapterConfig(**kwargs)
    return MiMoAudioStepAdapter(
        acfg, arch_cfg, seed=spec.get("seed", seed)
    )
