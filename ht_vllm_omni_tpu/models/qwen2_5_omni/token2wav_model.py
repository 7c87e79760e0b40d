"""Qwen2.5-Omni token2wav stage: codec tokens -> mel (DiT) -> wav
(BigVGAN).

GenerationEngine adapter (engine/generation_engine.py contract) for the
reference Qwen2_5OmniToken2WavModel streaming path (reference
vllm_omni/model_executor/models/qwen2_5_omni/qwen2_5_omni_token2wav.py
:1446-1672): each chunk decodes its window of codec tokens (including
the edge-provided left context, the past/future-cache analogue of
process_little_chunk) and trims the context samples after vocoding.

The per-frame flow noise is keyed off the GLOBAL mel-frame index
(fold_in), so overlapping chunk windows see identical noise and splices
stay consistent — the jax analogue of the reference's pre-allocated
y_all noise buffer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.models.qwen2_5_omni import (
    token2wav_bigvgan as bigvgan,
)
from ht_vllm_omni_tpu.models.qwen2_5_omni import token2wav_dit as dit
from ht_vllm_omni_tpu.models.qwen2_5_omni.config import Token2WavConfig


def _frame_noise(seed: int, start: int, n: int, mel_dim: int) -> jax.Array:
    base = jax.random.PRNGKey(seed)
    idx = start + jnp.arange(n)
    return jax.vmap(
        lambda i: jax.random.normal(jax.random.fold_in(base, i), (mel_dim,))
    )(idx)


class Qwen2_5OmniToken2WavModel:
    def __init__(
        self,
        cfg: Token2WavConfig,
        params: dict | None = None,
        seed: int = 0,
        num_steps: int = 10,
        guidance_scale: float = 0.5,
        ref_mel_frames: int = 64,
    ) -> None:
        self.cfg = cfg
        self.seed = seed
        self.num_steps = num_steps
        self.guidance_scale = guidance_scale
        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        self.params = params or {
            "dit": dit.init_params(cfg.dit, k1),
            "bigvgan": bigvgan.init_params(cfg.bigvgan, k2),
        }
        # default speaker conditioning when a request brings none: a
        # fixed random reference mel + x-vector (real deployments pass
        # them via additional_information, like the reference's
        # conditioning/reference_mel inputs)
        self._default_ref_mel = jax.random.normal(
            k3, (1, ref_mel_frames, cfg.dit.mel_dim)
        ) * 0.1
        self._fns: dict = {}

    @property
    def sample_rate(self) -> int:
        return self.cfg.sample_rate

    def __call__(self, token_ids, prompt_embeds, info, state):
        codes = info.get("codes")
        if codes is not None:
            tokens = np.asarray(codes, np.int32).reshape(-1)
        else:
            tokens = np.asarray(token_ids or [], np.int32)
        t = len(tokens)
        if t == 0:
            return {}
        left = int(info.get("left_context", 0) or 0)
        # global frame offset: frames decoded so far minus the overlap
        start_tok = int(state.get("tok_offset", 0)) - left
        state["tok_offset"] = max(start_tok, 0) + t - left
        repeats = self.cfg.dit.repeats
        n_mel = t * repeats

        spk = info.get("speaker_embedding")
        if spk is None:
            spk = np.zeros((self.cfg.dit.enc_emb_dim,), np.float32)
        spk = np.asarray(spk, np.float32)[None]
        ref_mel = info.get("reference_mel")
        ref_mel = (
            self._default_ref_mel
            if ref_mel is None
            else jnp.asarray(ref_mel, jnp.float32)[None]
        )

        fn = self._fns.get((t, ref_mel.shape[1]))
        if fn is None:
            dcfg, bcfg = self.cfg.dit, self.cfg.bigvgan

            def run(params, toks, spk_e, rmel, y0):
                mel = dit.sample(
                    dcfg, params["dit"], toks[None], spk_e, rmel, y0,
                    num_steps=self.num_steps,
                    guidance_scale=self.guidance_scale,
                )
                return bigvgan.mel_to_wav(bcfg, params["bigvgan"], mel)

            fn = jax.jit(run)
            self._fns[(t, ref_mel.shape[1])] = fn

        y0 = _frame_noise(
            self.seed, max(start_tok, 0) * repeats, n_mel,
            self.cfg.dit.mel_dim,
        )[None]
        wav = np.asarray(fn(self.params, tokens, spk, ref_mel, y0))[0]
        samples_per_tok = repeats * self.cfg.bigvgan.hop_length
        return {
            "audio": wav[left * samples_per_tok:],
            "sample_rate": np.asarray(self.sample_rate),
        }
