"""Stable Audio Open pipeline: text + duration -> audio.

Mirrors the reference StableAudioPipeline (reference
vllm_omni/diffusion/models/stable_audio/pipeline_stable_audio.py):

- T5-class text features (bundled trunk) projected in-model;
- duration conditioning: start/end seconds -> learned number
  embeddings; the pair concatenates into the global token and also
  appends to the cross-attention sequence (:301-332);
- CFG over a negative prompt; flow-match Euler (the reference's
  EDM-style scheduler is a training-time choice — the flow stepping
  here keeps the same model interface);
- Oobleck decoder turns latents into the waveform.

The engine routes this family through the audio output type
("tts"-style payloads: {"audio", "sample_rate"}).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.config import ModelArchConfig
from ht_vllm_omni_tpu.diffusion.data import DiffusionSamplingParams
from ht_vllm_omni_tpu.diffusion.models.stable_audio import (
    oobleck,
    transformer,
)
from ht_vllm_omni_tpu.diffusion.models.stable_audio.config import (
    OobleckConfig,
    StableAudioArchConfig,
)
from ht_vllm_omni_tpu.diffusion.schedulers.unipc import FlowEulerScheduler
from ht_vllm_omni_tpu.models import qwen2


class StableAudioPipeline:
    is_audio = True

    def __init__(
        self,
        arch: StableAudioArchConfig | None = None,
        vae_cfg: OobleckConfig | None = None,
        text_cfg: ModelArchConfig | None = None,
        params: dict | None = None,
        seed: int = 0,
        tokenizer=None,
        max_text_len: int = 128,
        max_seconds: float = 47.0,
    ) -> None:
        self.arch = arch or StableAudioArchConfig.tiny()
        self.vae_cfg = vae_cfg or OobleckConfig.tiny()
        if self.vae_cfg.latent_dim != self.arch.in_channels:
            raise ValueError("vae latent_dim must match DiT in_channels")
        self.text_cfg = text_cfg or ModelArchConfig(
            hidden_size=self.arch.cross_attention_input_dim,
            num_hidden_layers=2,
            num_attention_heads=2,
            num_key_value_heads=2,
            intermediate_size=48,
            vocab_size=384,
        )
        self.max_seconds = max_seconds
        self.tokenizer = tokenizer
        self.max_text_len = max_text_len
        half = self.arch.global_states_input_dim // 2
        key = jax.random.PRNGKey(seed)
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        params = params or {}
        self.params = {
            "transformer": params.get("transformer")
            or transformer.init_params(self.arch, k1),
            "vae": params.get("vae")
            or oobleck.init_params(self.vae_cfg, k2),
            "text": params.get("text")
            or qwen2.init_params(self.text_cfg, k3),
            # number conditioners: Fourier features of the normalised
            # second count -> linear (StableAudioProjectionModel)
            "sec_start_w": jax.random.normal(
                k4, (64, half), jnp.float32
            ) * 0.05,
            "sec_end_w": jax.random.normal(
                k5, (64, half), jnp.float32
            ) * 0.05,
        }
        self._fns: dict = {}

    # --------------------------------------------------------------- text
    def _tokenize(self, text: str) -> list[int]:
        if self.tokenizer is not None:
            return list(self.tokenizer(text))
        v = self.text_cfg.vocab_size
        return [b % v for b in text.encode("utf-8")] or [0]

    def encode_text(self, text: str) -> np.ndarray:
        ids = self._tokenize(text)[: self.max_text_len]
        fn = self._fns.get("text_encode")
        if fn is None:
            cfg = self.text_cfg

            def run(params, token_ids, length):
                emb = qwen2.embed_tokens(params, token_ids)
                pos = jnp.arange(token_ids.shape[0], dtype=jnp.int32)
                h, _ = qwen2.prefill(cfg, params, emb, pos, length)
                return h

            fn = jax.jit(run)
            self._fns["text_encode"] = fn
        n = len(ids)
        pad = -n % 32
        arr = jnp.asarray(ids + [0] * pad, jnp.int32)
        h = fn(self.params["text"], arr, jnp.int32(n))
        return np.asarray(h[:n], np.float32)

    def _seconds_embed(self, which: str, seconds: float) -> np.ndarray:
        """Normalised scalar -> Fourier features -> linear [half]."""
        s = min(max(seconds, 0.0), self.max_seconds) / self.max_seconds
        freqs = np.exp(
            -math.log(10000.0) * np.arange(32, dtype=np.float64) / 32
        )
        feat = np.concatenate(
            [np.cos(2 * math.pi * s * freqs), np.sin(2 * math.pi * s * freqs)]
        ).astype(np.float32)
        return feat @ np.asarray(self.params[which], np.float32)

    # ------------------------------------------------------------ denoise
    def generate_prompt(
        self,
        prompt,
        sp: DiffusionSamplingParams,
        stepwise_state: dict | None = None,
    ) -> tuple[dict | None, dict]:
        state = stepwise_state or {}
        if "latents" not in state:
            state.update(self._prepare(prompt, sp))
        count = (
            sp.stream_every if sp.stream_every > 0 else sp.num_inference_steps
        )
        sched = state["sched"]
        fn = self._fns.get("transformer")
        if fn is None:
            fn = jax.jit(functools.partial(transformer.forward, self.arch))
            self._fns["transformer"] = fn
        gscale = float(sp.guidance_scale or 1.0)
        do_cfg = state["do_cfg"]
        nb = state["txt"].shape[0]

        end = min(state["step"] + count, sp.num_inference_steps)
        latents = state["latents"]
        for step in range(state["step"], end):
            sigma = sched.timestep(step)
            t = jnp.full((nb,), sigma, jnp.float32)
            v = fn(
                self.params["transformer"],
                jnp.concatenate([latents] * nb, 0),
                state["txt"],
                state["glob"],
                t,
            )
            if do_cfg:
                pos, neg = (
                    v[:1].astype(jnp.float32), v[1:].astype(jnp.float32),
                )
                pred = neg + gscale * (pos - neg)
            else:
                pred = v[:1].astype(jnp.float32)
            latents, state["sched_state"] = sched.step(
                state["sched_state"], pred, latents
            )
        state["latents"] = latents
        state["step"] = end
        if end >= sp.num_inference_steps:
            dec = self._fns.get("decode")
            if dec is None:
                vcfg = self.vae_cfg

                def run(params, z):
                    return oobleck.decode(
                        vcfg, params, z.transpose(0, 2, 1)
                    )

                dec = jax.jit(run)
                self._fns["decode"] = dec
            wav = np.asarray(dec(self.params["vae"], latents))[0]
            return {
                "audio": wav.reshape(-1) if wav.shape[-1] == 1 else wav,
                "sample_rate": np.asarray(self.vae_cfg.sampling_rate),
            }, state
        return None, state

    def generate(
        self,
        token_ids,
        sp: DiffusionSamplingParams,
        negative_token_ids=None,
        prompt_embeds=None,
        stepwise_state: dict | None = None,
    ):
        class _P:
            pass

        p = _P()
        p.text = bytes(
            [t % 256 for t in (token_ids or [32])]
        ).decode("latin-1")
        p.negative_text = (
            bytes([t % 256 for t in negative_token_ids]).decode("latin-1")
            if negative_token_ids
            else None
        )
        p.embeds = prompt_embeds
        return self.generate_prompt(p, sp, stepwise_state)

    # ------------------------------------------------------------ prepare
    def _prepare(self, prompt, sp: DiffusionSamplingParams) -> dict:
        info = getattr(prompt, "additional_information", None) or {}
        seconds = float(info.get("audio_end_in_s", 4.0))
        start_s = float(info.get("audio_start_in_s", 0.0))
        lat_len = max(
            int(
                seconds
                * self.vae_cfg.sampling_rate
                / self.vae_cfg.hop_length
            ),
            8,
        )
        lat_len = lat_len + (-lat_len % 8)

        text = getattr(prompt, "text", None) or ""
        pos = self.encode_text(text)
        do_cfg = sp.guidance_scale is not None and sp.guidance_scale > 1.0
        branches = [pos]
        if do_cfg:
            neg = getattr(prompt, "negative_text", None) or " "
            branches.append(self.encode_text(neg))
        nb = len(branches)

        half = self.arch.global_states_input_dim // 2
        s0 = self._seconds_embed("sec_start_w", start_s)
        s1 = self._seconds_embed("sec_end_w", seconds)
        glob = np.tile(
            np.concatenate([s0, s1])[None], (nb, 1)
        ).astype(np.float32)

        # cross-attention sequence: text tokens + the two duration rows
        # padded into the text width (reference appends seconds rows)
        s_txt = max(b.shape[0] for b in branches) + 2
        s_txt = s_txt + (-s_txt % 8)
        dim = self.arch.cross_attention_input_dim
        txt = np.zeros((nb, s_txt, dim), np.float32)
        for i, b_ in enumerate(branches):
            txt[i, : b_.shape[0]] = b_
            txt[i, b_.shape[0]] = s0[:dim] if len(s0) >= dim else np.resize(
                s0, dim
            )
            txt[i, b_.shape[0] + 1] = (
                s1[:dim] if len(s1) >= dim else np.resize(s1, dim)
            )

        key = jax.random.PRNGKey(sp.seed if sp.seed is not None else 0)
        noise = jax.random.normal(
            key, (1, self.arch.in_channels, lat_len), jnp.float32
        )
        sched = FlowEulerScheduler(sp.num_inference_steps, mu=0.5)
        return {
            "latents": noise,
            "txt": jnp.asarray(txt),
            "glob": jnp.asarray(glob),
            "sched": sched,
            "sched_state": sched.init_state(),
            "do_cfg": do_cfg,
            "step": 0,
        }
