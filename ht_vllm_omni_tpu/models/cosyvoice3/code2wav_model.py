"""CosyVoice3 code2wav stage: speech tokens -> CFM mel -> HiFT wav.

GenerationEngine adapter (engine/generation_engine.py contract) for the
reference CosyVoice3Code2Wav stage (reference
vllm_omni/model_executor/models/cosyvoice3/cosyvoice3_code2wav.py:37):
chunk payloads carry token ids (+ optional speaker embedding under
additional_information["speaker_embedding"]); left-context frames are
decoded and trimmed like the other codec stages.
"""

from __future__ import annotations

import jax
import numpy as np

from ht_vllm_omni_tpu.models.cosyvoice3 import flow, hifigan
from ht_vllm_omni_tpu.models.cosyvoice3.config import CosyVoice3Config


class CosyVoice3Code2WavModel:
    def __init__(
        self,
        cfg: CosyVoice3Config,
        params: dict | None = None,
        seed: int = 0,
    ) -> None:
        self.cfg = cfg
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        self.params = params or {
            "flow": flow.init_params(cfg.flow, k1),
            "hift": hifigan.init_params(cfg.hift, k2),
        }
        self._fns: dict[int, object] = {}
        self._step = 0

    @property
    def sample_rate(self) -> int:
        return self.cfg.hift.sampling_rate

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
        spk = info.get("speaker_embedding")
        if spk is None:
            spk = np.zeros((self.cfg.flow.spk_embed_dim,), np.float32)
        spk = np.asarray(spk, np.float32)[None]
        fn = self._fns.get(t)
        if fn is None:
            fcfg, hcfg = self.cfg.flow, self.cfg.hift

            def run(params, toks, spk_e, key):
                k1, k2 = jax.random.split(key)
                mel = flow.token2mel(
                    fcfg, params["flow"], toks, spk_e, k1
                )
                return hifigan.mel_to_wav(hcfg, params["hift"], mel, k2)

            fn = jax.jit(run)
            self._fns[t] = fn
        self._step += 1
        wav = np.asarray(
            fn(
                self.params, tokens[None], spk,
                jax.random.PRNGKey(self._step),
            )
        )[0]
        per_tok = self.cfg.flow.token_mel_ratio * self.cfg.hift.total_upsample
        return {
            "audio": wav[left * per_tok :],
            "sample_rate": np.asarray(self.sample_rate),
        }
