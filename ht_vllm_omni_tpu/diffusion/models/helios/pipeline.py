"""Helios pipeline: chunked long-video generation with rolling memory.

Mirrors the reference HeliosPipeline / HeliosPyramidPipeline (reference
vllm_omni/diffusion/models/helios/pipeline_helios.py — both registry
rows resolve to the same class): the video generates chunk by chunk;
each new chunk denoises while attending to the short/mid/long-term
memory of previously generated latent frames at their true frame
indices, and only the current chunk attends to the text (guidance
cross-attention).  The reference's multi-stage HeliosScheduler is
expressed as a per-chunk flow-match Euler schedule here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.config import ModelArchConfig
from ht_vllm_omni_tpu.diffusion.data import DiffusionSamplingParams
from ht_vllm_omni_tpu.diffusion.models.helios import transformer as helios
from ht_vllm_omni_tpu.diffusion.models.wan_video import vae3d
from ht_vllm_omni_tpu.diffusion.models.wan_video.config import (
    WanVideoArchConfig,
    WanVideoVAEConfig,
)
from ht_vllm_omni_tpu.diffusion.schedulers.unipc import (
    FlowEulerScheduler,
    calculate_shift,
)
from ht_vllm_omni_tpu.models import qwen2


class HeliosPipeline:
    def __init__(
        self,
        arch: WanVideoArchConfig | None = None,
        vae_cfg: WanVideoVAEConfig | None = None,
        text_cfg: ModelArchConfig | None = None,
        params: dict | None = None,
        seed: int = 0,
        tokenizer=None,
        chunk_frames: int = 4,      # latent frames denoised per chunk
        short_window: int = 4,      # latent frames of short-term memory
        max_text_len: int = 128,
    ) -> None:
        self.arch = arch or WanVideoArchConfig.tiny()
        self.vae_cfg = vae_cfg or WanVideoVAEConfig.tiny()
        self.text_cfg = text_cfg or ModelArchConfig(
            hidden_size=self.arch.text_dim,
            num_hidden_layers=2,
            num_attention_heads=2,
            num_key_value_heads=2,
            intermediate_size=48,
            vocab_size=384,
        )
        self.tokenizer = tokenizer
        self.chunk_frames = chunk_frames
        self.short_window = short_window
        self.max_text_len = max_text_len
        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        params = params or {}
        self.params = {
            "transformer": params.get("transformer")
            or helios.init_params(self.arch, k1),
            "vae": params.get("vae")
            or vae3d.init_params(self.vae_cfg, k2),
            "text": params.get("text")
            or qwen2.init_params(self.text_cfg, k3),
        }
        self._fns: dict = {}

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
        pad = -n % 16
        arr = jnp.asarray(ids + [0] * pad, jnp.int32)
        h = fn(self.params["text"], arr, jnp.int32(n))
        return np.asarray(h[:n], np.float32)

    def _chunk_fn(self, with_history: bool):
        key = ("chunk", with_history)
        fn = self._fns.get(key)
        if fn is None:
            fn = jax.jit(
                functools.partial(helios.forward, self.arch),
                static_argnames=("history_offsets", "chunk_frame_offset"),
            )
            self._fns[key] = fn
        return fn

    def generate_prompt(
        self,
        prompt,
        sp: DiffusionSamplingParams,
        stepwise_state: dict | None = None,
    ) -> tuple[np.ndarray | None, dict]:
        state = stepwise_state or {}
        if "chunks" not in state:
            state.update(self._prepare(prompt, sp))
        gscale = float(sp.guidance_scale or 1.0)
        do_cfg = state["do_cfg"]
        nb = state["txt"].shape[0]

        # denoise ONE chunk per call (the pipeline-level streaming unit)
        ci = state["chunk_idx"]
        lat_h, lat_w = state["lat_hw"]
        key = jax.random.fold_in(state["key"], ci)
        x = jax.random.normal(
            key,
            (1, self.arch.in_channels, self.chunk_frames, lat_h, lat_w),
            jnp.float32,
        )
        history = None
        history_offsets = ()
        if state["chunks"]:
            done = jnp.concatenate(state["chunks"], axis=2)
            hist = done[:, :, -self.short_window:]
            first = done.shape[2] - hist.shape[2]
            history = {"short": jnp.concatenate([hist] * nb, 0)}
            history_offsets = (("short", first),)
        sched = FlowEulerScheduler(
            sp.num_inference_steps,
            mu=calculate_shift(
                self.chunk_frames * (lat_h // 2) * (lat_w // 2)
            ),
        )
        st = sched.init_state()
        fn = self._chunk_fn(history is not None)
        offset = ci * self.chunk_frames
        for step in range(sp.num_inference_steps):
            sigma = sched.timestep(step)
            t = jnp.full((nb,), sigma * 1000.0, jnp.float32)
            v = fn(
                self.params["transformer"],
                jnp.concatenate([x] * nb, 0),
                t,
                state["txt"],
                state["txt_lens"],
                history,
                history_offsets=history_offsets,
                chunk_frame_offset=offset,
            )
            if do_cfg:
                pos, neg = (
                    v[:1].astype(jnp.float32), v[1:].astype(jnp.float32),
                )
                pred = neg + gscale * (pos - neg)
            else:
                pred = v[:1].astype(jnp.float32)
            x, st = sched.step(st, pred, x)
        state["chunks"].append(x)
        state["chunk_idx"] = ci + 1

        if state["chunk_idx"] >= state["num_chunks"]:
            lat = jnp.concatenate(state["chunks"], axis=2)
            dec = self._fns.get("decode")
            if dec is None:
                cfg = self.vae_cfg

                def run(params, z):
                    z = jnp.transpose(z, (0, 2, 3, 4, 1))
                    z = vae3d.denormalize_latents(cfg, z)
                    vid = vae3d.decode(cfg, params, z)
                    return jnp.clip(vid * 0.5 + 0.5, 0.0, 1.0)

                dec = jax.jit(run)
                self._fns["decode"] = dec
            vid = np.asarray(dec(self.params["vae"], lat))[0]
            return (vid * 255.0).astype(np.uint8), state
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
        p.embeds = None
        p.additional_information = {}
        return self.generate_prompt(p, sp, stepwise_state)

    def _prepare(self, prompt, sp: DiffusionSamplingParams) -> dict:
        info = getattr(prompt, "additional_information", None) or {}
        num_chunks = int(info.get("num_chunks", 2))
        ratio = self.vae_cfg.spatial_ratio
        lat_h = max(sp.height // ratio, 2)
        lat_w = max(sp.width // ratio, 2)

        text = getattr(prompt, "text", None) or ""
        pos = self.encode_text(text)
        do_cfg = sp.guidance_scale is not None and sp.guidance_scale > 1.0
        branches = [pos]
        if do_cfg:
            neg = getattr(prompt, "negative_text", None) or " "
            branches.append(self.encode_text(neg))
        s_txt = max(b.shape[0] for b in branches)
        s_txt = s_txt + (-s_txt % 8)
        txt = np.zeros(
            (len(branches), s_txt, self.arch.text_dim), np.float32
        )
        lens = np.zeros((len(branches),), np.int32)
        for i, b_ in enumerate(branches):
            txt[i, : b_.shape[0]] = b_
            lens[i] = b_.shape[0]

        return {
            "chunks": [],
            "chunk_idx": 0,
            "num_chunks": num_chunks,
            "lat_hw": (lat_h, lat_w),
            "txt": jnp.asarray(txt),
            "txt_lens": jnp.asarray(lens),
            "key": jax.random.PRNGKey(
                sp.seed if sp.seed is not None else 0
            ),
            "do_cfg": do_cfg,
            "step": 0,
        }
