"""Voxtral TTS per-step decode adapter.

Implements the worker/step_adapter.py hooks for the Voxtral audio
generation loop (reference vllm_omni/model_executor/models/voxtral_tts/
voxtral_tts.py:286, voxtral_tts_audio_generation.py:1012):

- ``head``: run the flow-matching acoustic transformer on the step's
  hidden state -> [semantic, acoustic x N] codes; the forced next token
  is EOS when the semantic head emits [END_AUDIO], else the audio
  placeholder token.
- ``embed``: the next step's input embedding is the summed
  MultiVocabEmbeddings lookup of the previous frame's codes (the
  reference's embed_multimodal feedback), falling back to the plain
  token embedding for fresh slots.

Per-frame flow noise is keyed off the frame's sequence position
(acoustic_flow.frame_keys), so ``expand`` — used by the stage-edge
processor to regenerate codes from exported hidden states — yields
byte-identical codes to the ones that fed back in-loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.models.voxtral_tts import acoustic_flow
from ht_vllm_omni_tpu.models.voxtral_tts.config import AcousticFlowConfig
from ht_vllm_omni_tpu.worker.step_adapter import sub_params


class VoxtralStepAdapter:
    def __init__(
        self,
        cfg: AcousticFlowConfig,
        eos_token_id: int,
        audio_token_id: int,
        seed: int = 0,
        params: dict | None = None,
        llm_hidden_size: int | None = None,
    ) -> None:
        self.cfg = cfg
        self.eos_token_id = eos_token_id
        self.audio_token_id = audio_token_id
        self.seed = seed
        self._params = params
        self._llm_hidden = llm_hidden_size or cfg.input_dim
        self.aux_width = 1 + cfg.num_codebooks
        self._expand_fns: dict[int, object] = {}

    # ---------------------------------------------------- runner hooks
    def init_params(self) -> dict:
        if self._params is None:
            self._params = acoustic_flow.init_params(
                self.cfg,
                jax.random.PRNGKey(self.seed + 13),
                llm_hidden_size=self._llm_hidden,
            )
        return self._params

    def embed(self, params, tokens, aux):
        from ht_vllm_omni_tpu.models import qwen2

        p = sub_params(params)
        tok_e = qwen2.embed_tokens(params, tokens)
        valid = aux[:, 0] > 0
        mm = acoustic_flow.mm_embed(self.cfg, p, aux[:, 1:])
        return jnp.where(valid[:, None], mm.astype(tok_e.dtype), tok_e)

    def head(self, params, hidden, positions):
        p = sub_params(params)
        keys = acoustic_flow.frame_keys(self.seed, positions)
        codes = acoustic_flow.decode_frames(self.cfg, p, hidden, keys)
        tok = acoustic_flow.next_token(
            codes, self.eos_token_id, self.audio_token_id
        )
        aux = jnp.concatenate(
            [jnp.ones((codes.shape[0], 1), jnp.int32), codes], axis=1
        )
        return tok, aux

    # ------------------------------------------------------- stage edge
    def expand(
        self, hidden: np.ndarray, first_position: int
    ) -> np.ndarray:
        """Recompute the frame codes for exported hidden states
        [n, D] whose producing positions start at ``first_position``
        (= prompt_len - 1 for the first output token).  Bucketed +
        jitted like the other edge expanders."""
        n = len(hidden)
        if n == 0:
            return np.zeros((0, self.cfg.num_codebooks), np.int32)
        bucket = 1
        while bucket < n:
            bucket *= 2
        fn = self._expand_fns.get(bucket)
        if fn is None:

            def run(p, h, pos):
                keys = acoustic_flow.frame_keys(self.seed, pos)
                return acoustic_flow.decode_frames(self.cfg, p, h, keys)

            fn = jax.jit(run)
            self._expand_fns[bucket] = fn
        h_pad = np.zeros((bucket, hidden.shape[1]), np.float32)
        h_pad[:n] = hidden
        pos = first_position + np.arange(bucket, dtype=np.int32)
        return np.asarray(fn(self.init_params(), h_pad, pos))[:n]


def build(spec: dict, arch_cfg, seed: int = 0) -> VoxtralStepAdapter:
    """step_adapter registry hook: spec = {"name": "voxtral_tts",
    "acoustic": {...AcousticFlowConfig kwargs...},
    "audio_token_id": int, "eos_token_id": int?}."""
    kwargs = dict(spec.get("acoustic", {}))
    kwargs.setdefault("input_dim", arch_cfg.hidden_size)
    cfg = AcousticFlowConfig(**kwargs)
    eos = spec.get("eos_token_id", arch_cfg.eos_token_id)
    audio_tok = spec["audio_token_id"]
    return VoxtralStepAdapter(
        cfg,
        eos_token_id=eos,
        audio_token_id=audio_tok,
        seed=spec.get("seed", seed),
        llm_hidden_size=arch_cfg.hidden_size,
    )
