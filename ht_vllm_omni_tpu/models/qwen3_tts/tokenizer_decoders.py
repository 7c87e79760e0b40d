"""Qwen3-TTS speech-tokenizer decoders (code -> waveform).

The reference ships two generations (reference vllm_omni/
model_executor/models/qwen3_tts/qwen3_tts_code2wav.py:21 routes to
either):

- **25 Hz (v1)** — tokenizer_25hz/modeling_qwen3_tts_tokenizer_v1.py:
  a block-causal flow-matching DiT (AdaLN-Zero blocks, RoPE on head 0
  only, per-layer look-ahead/backward block masks, ECAPA speaker
  conditioning, code-drop CFG) into a BigVGAN vocoder.  This is the
  SAME architecture as Qwen2.5-Omni's token2wav — the jax modules in
  models/qwen2_5_omni/token2wav_dit|bigvgan are reused directly; only
  the ODE solver differs (plain Euler, :1219-1229, vs RK4).
- **12.5 Hz (v2)** — tokenizer_12hz/modeling_qwen3_tts_tokenizer_v2.py:
  a sliding-window causal pre-transformer + ConvNeXt upsampling +
  SnakeBeta residual decoder.  This is the architecture of
  Qwen3-Omni's Code2Wav — models/qwen3_omni/code2wav.py is reused with
  a v2-shaped config.

Both classes implement the GenerationEngine model contract
(engine/generation_engine.py) with chunk + left-context streaming.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.models.qwen2_5_omni import (
    token2wav_bigvgan as bigvgan,
)
from ht_vllm_omni_tpu.models.qwen2_5_omni import token2wav_dit as dit
from ht_vllm_omni_tpu.models.qwen2_5_omni.config import (
    BigVGANConfig,
    DiTConfig,
)
from ht_vllm_omni_tpu.models.qwen3_omni import code2wav as c2w12


def v1_dit_config(**hf) -> DiTConfig:
    """Qwen3TTSTokenizerV1DecoderDiTConfig kwargs -> DiTConfig (field
    names are identical; both decoders share the lineage)."""
    known = {f.name for f in dataclasses.fields(DiTConfig)}
    kw = {k: v for k, v in hf.items() if k in known}
    for tkey in (
        "look_ahead_layers", "look_backward_layers", "enc_channels",
        "enc_kernel_sizes", "enc_dilations",
    ):
        if tkey in kw:
            kw[tkey] = tuple(kw[tkey])
    return DiTConfig(**kw)


def v1_bigvgan_config(**hf) -> BigVGANConfig:
    known = {f.name for f in dataclasses.fields(BigVGANConfig)}
    kw = {k: v for k, v in hf.items() if k in known}
    for tkey in ("upsample_rates", "upsample_kernel_sizes",
                 "resblock_kernel_sizes"):
        if tkey in kw:
            kw[tkey] = tuple(kw[tkey])
    if "resblock_dilation_sizes" in kw:
        kw["resblock_dilation_sizes"] = tuple(
            tuple(v) for v in kw["resblock_dilation_sizes"]
        )
    return BigVGANConfig(**kw)


def _frame_noise(seed: int, start: int, n: int, mel_dim: int):
    """Global-frame-keyed noise so chunked decoding equals the full
    sequence (same scheme as qwen2_5_omni/token2wav_model.py)."""
    keys = jax.vmap(
        lambda i: jax.random.fold_in(jax.random.PRNGKey(seed), i)
    )(start + jnp.arange(n))
    return jax.vmap(
        lambda k: jax.random.normal(k, (mel_dim,), jnp.float32)
    )(keys)


class Qwen3TTSTokenizer25HzDecoder:
    """v1 code2wav stage model: DiT flow (Euler) + BigVGAN."""

    def __init__(
        self,
        dit_cfg: DiTConfig | None = None,
        bigvgan_cfg: BigVGANConfig | None = None,
        params: dict | None = None,
        seed: int = 0,
        num_steps: int = 10,
        guidance_scale: float = 0.5,
        ref_mel_frames: int = 64,
    ) -> None:
        self.dit_cfg = dit_cfg or DiTConfig()
        self.bigvgan_cfg = bigvgan_cfg or BigVGANConfig()
        self.seed = seed
        self.num_steps = num_steps
        self.guidance_scale = guidance_scale
        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        self.params = params or {
            "dit": dit.init_params(self.dit_cfg, k1),
            "bigvgan": bigvgan.init_params(self.bigvgan_cfg, k2),
        }
        self._default_ref_mel = jax.random.normal(
            k3, (1, ref_mel_frames, self.dit_cfg.mel_dim)
        ) * 0.1
        self._fns: dict = {}

    @property
    def sample_rate(self) -> int:
        return 24000

    @property
    def samples_per_token(self) -> int:
        return self.dit_cfg.repeats * self.bigvgan_cfg.hop_length

    def __call__(self, token_ids, prompt_embeds, info, state):
        codes = info.get("codes")
        tokens = (
            np.asarray(codes, np.int32).reshape(-1)
            if codes is not None
            else np.asarray(token_ids or [], np.int32)
        )
        t = len(tokens)
        if t == 0:
            return {}
        left = int(info.get("left_context", 0) or 0)
        start_tok = max(int(state.get("tok_offset", 0)) - left, 0)
        state["tok_offset"] = start_tok + t - left

        spk = info.get("speaker_embedding")
        if spk is None:
            spk = np.zeros((self.dit_cfg.enc_emb_dim,), np.float32)
        spk = np.asarray(spk, np.float32)[None]
        ref_mel = info.get("reference_mel")
        ref_mel = (
            self._default_ref_mel
            if ref_mel is None
            else jnp.asarray(ref_mel, jnp.float32)[None]
        )

        fn = self._fns.get((t, ref_mel.shape[1]))
        if fn is None:
            dcfg, bcfg = self.dit_cfg, self.bigvgan_cfg
            ns, gs = self.num_steps, self.guidance_scale

            def run(params, toks, spk_e, rmel, y0):
                mel = dit.sample(
                    dcfg, params["dit"], toks[None], spk_e, rmel, y0,
                    num_steps=ns, guidance_scale=gs, solver="euler",
                )
                return bigvgan.mel_to_wav(bcfg, params["bigvgan"], mel)

            fn = jax.jit(run)
            self._fns[(t, ref_mel.shape[1])] = fn

        y0 = _frame_noise(
            self.seed, start_tok * self.dit_cfg.repeats,
            t * self.dit_cfg.repeats, self.dit_cfg.mel_dim,
        )[None]
        wav = np.asarray(fn(self.params, tokens, spk, ref_mel, y0))[0]
        return {
            "audio": wav[left * self.samples_per_token:],
            "sample_rate": np.asarray(self.sample_rate),
        }


class Qwen3TTSTokenizer12HzDecoder:
    """v2 code2wav stage model: causal pre-transformer + ConvNeXt
    upsampling + SnakeBeta decoder (models/qwen3_omni/code2wav.py)."""

    def __init__(
        self,
        cfg: c2w12.Code2WavConfig | None = None,
        params: dict | None = None,
        seed: int = 0,
        sample_rate: int = 24000,
    ) -> None:
        self.cfg = cfg or c2w12.Code2WavConfig()
        self._sample_rate = sample_rate
        self.params = params or c2w12.init_params(
            self.cfg, jax.random.PRNGKey(seed)
        )
        self._fns: dict = {}

    @property
    def sample_rate(self) -> int:
        return self._sample_rate

    @property
    def samples_per_token(self) -> int:
        return self.cfg.total_upsample

    def __call__(self, token_ids, prompt_embeds, info, state):
        codes = info.get("codes")
        if codes is not None:
            codes = np.asarray(codes, np.int32)
            if codes.ndim == 1:
                codes = codes[None]
        else:
            codes = np.asarray(token_ids or [], np.int32)[None]
        t = codes.shape[-1]
        if t == 0:
            return {}
        if codes.shape[0] != self.cfg.num_quantizers:
            # single-codebook talker stream -> replicate across the
            # quantizer axis (mean over quantizers is then identity)
            codes = np.broadcast_to(
                codes[:1], (self.cfg.num_quantizers, t)
            ).copy()
        codes = np.clip(codes, 0, self.cfg.codebook_size - 1)
        left = int(info.get("left_context", 0) or 0)
        fn = self._fns.get((codes.shape[0], t))
        if fn is None:
            cfg = self.cfg

            def run(params, toks):
                return c2w12.decode(cfg, params, toks)

            fn = jax.jit(run)
            self._fns[(codes.shape[0], t)] = fn
        wav = np.asarray(fn(self.params, codes)).reshape(-1)
        return {
            "audio": wav[left * self.samples_per_token:],
            "sample_rate": np.asarray(self.sample_rate),
        }
