"""MiMo-Audio code2wav stage: RVQ code patches -> waveform.

GenerationEngine adapter (engine/generation_engine.py contract) for the
reference MiMoAudioToken2Wav stage (reference vllm_omni/model_executor/
models/mimo_audio/mimo_audio_code2wav.py:388): chunk payloads carry the
channel-major code matrix under additional_information["codes"];
left-context frames are decoded and trimmed like the other codec
stages (the reference's streaming_decode left/right overlap,
modeling_audio_tokenizer.py:846-902).
"""

from __future__ import annotations

import jax
import numpy as np

from ht_vllm_omni_tpu.models.mimo_audio import code2wav
from ht_vllm_omni_tpu.models.mimo_audio.config import MiMoCode2WavConfig


class MiMoAudioCode2WavModel:
    def __init__(
        self,
        cfg: MiMoCode2WavConfig,
        params: dict | None = None,
        seed: int = 0,
    ) -> None:
        self.cfg = cfg
        self.params = params or code2wav.init_params(
            cfg, jax.random.PRNGKey(seed)
        )
        self._fns: dict[int, object] = {}

    @property
    def sample_rate(self) -> int:
        return self.cfg.sampling_rate

    @property
    def samples_per_frame(self) -> int:
        """One code frame -> avg_pooler x stride positions -> hop
        samples each (reference frames_per_token,
        modeling_audio_tokenizer.py:884)."""
        return (
            self.cfg.avg_pooler
            * self.cfg.decoder_stride_size
            * self.cfg.hop_length
        )

    def __call__(self, token_ids, prompt_embeds, info, state):
        codes = info.get("codes")
        if codes is None:
            return {}
        codes = np.asarray(codes, np.int32)
        if codes.ndim == 2:  # [C, T] channel-major (edge convention)
            codes = codes.T
        t = codes.shape[0]
        if t == 0:
            return {}
        nq = self.cfg.num_quantizers
        if codes.shape[1] < nq:
            codes = np.pad(codes, ((0, 0), (0, nq - codes.shape[1])))
        codes = np.clip(codes[:, :nq], 0, self.cfg.codebook_size - 1)
        left = int(info.get("left_context", 0) or 0)
        fn = self._fns.get(t)
        if fn is None:
            cfg = self.cfg

            def run(params, toks):
                return code2wav.decode(cfg, params, toks)

            fn = jax.jit(run)
            self._fns[t] = fn
        wav = np.asarray(fn(self.params, codes), np.float32)
        return {
            "audio": wav[left * self.samples_per_frame:],
            "sample_rate": np.asarray(self.sample_rate),
        }
