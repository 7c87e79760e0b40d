"""GenerationEngine adapter: DAC codes -> waveform stage.

Stage-1 counterpart of the reference's Fish-Speech DAC decode stage
(reference vllm_omni/model_executor/models/fish_speech/
fish_speech_dac_decoder.py), following the GenerationModel contract
(engine/generation_engine.py): chunk payloads carry
additional_information["codes"] [n_codebooks, n]; returns NEW audio
samples past the chunk's left context.
"""

from __future__ import annotations

import jax
import numpy as np

from ht_vllm_omni_tpu.models.fish_speech.dac_decoder import (
    DacDecoderConfig,
    decode,
    init_params,
)


class FishSpeechDacModel:
    def __init__(
        self,
        cfg: DacDecoderConfig,
        params: dict | None = None,
        seed: int = 0,
        sample_rate: int = 44100,
    ) -> None:
        self.cfg = cfg
        self.params = params or init_params(cfg, jax.random.PRNGKey(seed))
        self.sample_rate = sample_rate
        self._fns: dict[int, object] = {}

    def __call__(self, token_ids, prompt_embeds, info, state):
        codes = info.get("codes")
        if codes is None:
            if not token_ids:
                return {}
            codes = np.tile(
                np.asarray(token_ids, np.int32)[None],
                (self.cfg.n_codebooks, 1),
            )
        codes = np.asarray(codes, np.int32)
        if codes.shape[0] != self.cfg.n_codebooks:
            codes = np.tile(codes[:1], (self.cfg.n_codebooks, 1))
        codes = np.clip(codes, 0, self.cfg.codebook_size - 1)
        t = codes.shape[1]
        if t == 0:
            return {}
        left = int(info.get("left_context", 0) or 0)
        fn = self._fns.get(t)
        if fn is None:
            fn = jax.jit(lambda p, c: decode(self.cfg, p, c))
            self._fns[t] = fn
        wav = np.asarray(fn(self.params, codes[None]))[0]
        return {
            "audio": wav[left * self.cfg.hop_length :],
            "sample_rate": np.asarray(self.sample_rate),
        }
