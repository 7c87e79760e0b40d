"""LTX2 pipelines: t2v and i2v, jointly generating video AND audio.

Mirrors the reference LTX2Pipeline / LTX2ImageToVideoPipeline
(reference vllm_omni/diffusion/models/ltx2/pipeline_ltx2*.py): both
latent streams denoise together under one flow-match schedule with
text CFG; i2v keeps the encoded first latent frame CLEAN throughout
denoising (conditioning-by-replacement).  Video decodes through the
causal-3D VAE, audio latents through the Oobleck decoder.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.config import ModelArchConfig
from ht_vllm_omni_tpu.diffusion.data import DiffusionSamplingParams
from ht_vllm_omni_tpu.diffusion.models.ltx2 import transformer
from ht_vllm_omni_tpu.diffusion.models.ltx2.config import LTX2ArchConfig
from ht_vllm_omni_tpu.diffusion.models.stable_audio import oobleck
from ht_vllm_omni_tpu.diffusion.models.stable_audio.config import (
    OobleckConfig,
)
from ht_vllm_omni_tpu.diffusion.models.wan_video import vae3d
from ht_vllm_omni_tpu.diffusion.models.wan_video.config import (
    WanVideoVAEConfig,
)
from ht_vllm_omni_tpu.diffusion.schedulers.unipc import (
    FlowEulerScheduler,
    calculate_shift,
)
from ht_vllm_omni_tpu.models import qwen2


class LTX2Pipeline:
    i2v = False

    def __init__(
        self,
        arch: LTX2ArchConfig | None = None,
        vae_cfg: WanVideoVAEConfig | None = None,
        audio_vae_cfg: OobleckConfig | None = None,
        text_cfg: ModelArchConfig | None = None,
        params: dict | None = None,
        seed: int = 0,
        tokenizer=None,
        max_text_len: int = 128,
    ) -> None:
        self.arch = arch or LTX2ArchConfig.tiny()
        zc = self.arch.in_channels
        self.vae_cfg = vae_cfg or WanVideoVAEConfig(
            base_dim=8, z_dim=zc, dim_mult=(1, 2), num_res_blocks=1,
            temporal_resample=(True,),
            latents_mean=(0.0,) * zc, latents_std=(1.0,) * zc,
        )
        self.audio_vae_cfg = audio_vae_cfg or OobleckConfig(
            audio_channels=1, decoder_channels=8,
            latent_dim=self.arch.audio_in_channels,
            upsampling_ratios=(2, 2), sampling_rate=16000,
        )
        self.text_cfg = text_cfg or ModelArchConfig(
            hidden_size=self.arch.caption_dim,
            num_hidden_layers=2,
            num_attention_heads=2,
            num_key_value_heads=2,
            intermediate_size=48,
            vocab_size=384,
        )
        self.tokenizer = tokenizer
        self.max_text_len = max_text_len
        key = jax.random.PRNGKey(seed)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        params = params or {}
        self.params = {
            "transformer": params.get("transformer")
            or transformer.init_params(self.arch, k1),
            "vae": params.get("vae")
            or vae3d.init_params(self.vae_cfg, k2),
            "audio_vae": params.get("audio_vae")
            or oobleck.init_params(self.audio_vae_cfg, k3),
            "text": params.get("text")
            or qwen2.init_params(self.text_cfg, k4),
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

    def generate_prompt(
        self,
        prompt,
        sp: DiffusionSamplingParams,
        stepwise_state: dict | None = None,
    ) -> tuple[dict | None, dict]:
        state = stepwise_state or {}
        if "v_lat" not in state:
            state.update(self._prepare(prompt, sp))
        count = (
            sp.stream_every if sp.stream_every > 0 else sp.num_inference_steps
        )
        sched = state["sched"]
        fn = self._fns.get("transformer")
        if fn is None:
            fn = jax.jit(
                functools.partial(transformer.forward, self.arch),
                static_argnames=("grid",),
            )
            self._fns["transformer"] = fn
        gscale = float(sp.guidance_scale or 1.0)
        do_cfg = state["do_cfg"]
        nb = state["txt"].shape[0]
        grid = state["grid"]
        f, hh, ww = grid

        end = min(state["step"] + count, sp.num_inference_steps)
        v_lat, a_lat = state["v_lat"], state["a_lat"]
        cond = state.get("cond_frame")  # clean first-frame tokens (i2v)
        for step in range(state["step"], end):
            if cond is not None:
                per_frame = hh * ww
                v_lat = v_lat.at[:, :per_frame].set(cond)
            sigma = sched.timestep(step)
            t = jnp.full((nb,), sigma, jnp.float32)
            vv, av = fn(
                self.params["transformer"],
                jnp.concatenate([v_lat] * nb, 0),
                jnp.concatenate([a_lat] * nb, 0),
                state["txt"], state["txt_mask"], t, grid,
            )
            if do_cfg:
                vpred = av_ = None
                vp, vn = vv[:1].astype(jnp.float32), vv[1:].astype(
                    jnp.float32
                )
                ap, an = av[:1].astype(jnp.float32), av[1:].astype(
                    jnp.float32
                )
                vpred = vn + gscale * (vp - vn)
                apred = an + gscale * (ap - an)
            else:
                vpred = vv[:1].astype(jnp.float32)
                apred = av[:1].astype(jnp.float32)
            v_lat, state["v_sched"] = sched.step(
                state["v_sched"], vpred, v_lat
            )
            a_lat, state["a_sched"] = state["a_sched_obj"].step(
                state["a_sched"], apred, a_lat
            )
        if cond is not None:
            v_lat = v_lat.at[:, : hh * ww].set(cond)
        state["v_lat"], state["a_lat"] = v_lat, a_lat
        state["step"] = end
        if end >= sp.num_inference_steps:
            return self._decode(state), state
        return None, state

    def _decode(self, state) -> dict:
        f, hh, ww = state["grid"]
        zc = self.arch.in_channels
        v = state["v_lat"].reshape(1, f, hh, ww, zc)
        dec = self._fns.get("decode_v")
        if dec is None:
            cfg = self.vae_cfg

            def run(params, z):
                z = vae3d.denormalize_latents(cfg, z)
                vid = vae3d.decode(cfg, params, z)
                return jnp.clip(vid * 0.5 + 0.5, 0.0, 1.0)

            dec = jax.jit(run)
            self._fns["decode_v"] = dec
        vid = np.asarray(dec(self.params["vae"], v))[0]
        vid = (vid * 255.0).astype(np.uint8)

        deca = self._fns.get("decode_a")
        if deca is None:
            acfg = self.audio_vae_cfg

            def run_a(params, z):
                return oobleck.decode(acfg, params, z)

            deca = jax.jit(run_a)
            self._fns["decode_a"] = deca
        wav = np.asarray(deca(self.params["audio_vae"], state["a_lat"]))[0]
        return {
            "video": vid,
            "audio": wav.reshape(-1) if wav.shape[-1] == 1 else wav,
            "sample_rate": np.asarray(self.audio_vae_cfg.sampling_rate),
        }

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

    def _init_image(self, prompt) -> np.ndarray | None:
        mm = getattr(prompt, "multi_modal_data", None) or {}
        info = getattr(prompt, "additional_information", None) or {}
        img = mm.get("image")
        if img is None:
            img = info.get("init_image")
        if img is None:
            return None
        if isinstance(img, (list, tuple)):
            img = img[0]
        img = np.asarray(img, np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        return img

    def _prepare(self, prompt, sp: DiffusionSamplingParams) -> dict:
        info = getattr(prompt, "additional_information", None) or {}
        frames = int(info.get("num_frames", 5))
        tstride = self.vae_cfg.temporal_ratio
        lat_f = 1 + (frames - 1) // tstride
        ratio = self.vae_cfg.spatial_ratio
        lat_h = max(sp.height // ratio, 2)
        lat_w = max(sp.width // ratio, 2)
        grid = (lat_f, lat_h, lat_w)
        s_v = lat_f * lat_h * lat_w
        s_a = int(info.get("audio_latent_frames", 4 * lat_f))

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
            (len(branches), s_txt, self.arch.caption_dim), np.float32
        )
        mask = np.zeros((len(branches), s_txt), np.int32)
        for i, b_ in enumerate(branches):
            txt[i, : b_.shape[0]] = b_
            mask[i, : b_.shape[0]] = 1

        key = jax.random.PRNGKey(sp.seed if sp.seed is not None else 0)
        kv, ka = jax.random.split(key)
        v_lat = jax.random.normal(
            kv, (1, s_v, self.arch.in_channels), jnp.float32
        )
        a_lat = jax.random.normal(
            ka, (1, s_a, self.arch.audio_in_channels), jnp.float32
        )

        cond_frame = None
        init = self._init_image(prompt) if self.i2v else None
        if init is not None:
            img = init * 2.0 - 1.0
            if img.shape[:2] != (sp.height, sp.width):
                ri = (
                    np.arange(sp.height) * img.shape[0] // sp.height
                ).clip(0, img.shape[0] - 1)
                ci = (
                    np.arange(sp.width) * img.shape[1] // sp.width
                ).clip(0, img.shape[1] - 1)
                img = img[ri][:, ci]
            efn = self._fns.get("encode_frame")
            if efn is None:
                vcfg = self.vae_cfg

                def erun(params, x):
                    z = vae3d.encode(vcfg, params, x)
                    return vae3d.normalize_latents(vcfg, z)

                efn = jax.jit(erun)
                self._fns["encode_frame"] = efn
            z0 = efn(self.params["vae"], jnp.asarray(img)[None, None])
            # [1, 1, lat_h, lat_w, C] -> first latent frame's tokens
            z0 = z0[:, 0, :lat_h, :lat_w]
            pad_h, pad_w = lat_h - z0.shape[1], lat_w - z0.shape[2]
            if pad_h or pad_w:
                z0 = jnp.pad(
                    z0, ((0, 0), (0, pad_h), (0, pad_w), (0, 0))
                )
            cond_frame = z0.reshape(1, lat_h * lat_w, -1)

        sched = FlowEulerScheduler(
            sp.num_inference_steps, mu=calculate_shift(s_v)
        )
        a_sched = FlowEulerScheduler(
            sp.num_inference_steps, mu=calculate_shift(s_a)
        )
        return {
            "v_lat": v_lat,
            "a_lat": a_lat,
            "cond_frame": cond_frame,
            "grid": grid,
            "txt": jnp.asarray(txt),
            "txt_mask": jnp.asarray(mask),
            "sched": sched,
            "v_sched": sched.init_state(),
            "a_sched_obj": a_sched,
            "a_sched": a_sched.init_state(),
            "do_cfg": do_cfg,
            "step": 0,
        }


class LTX2ImageToVideoPipeline(LTX2Pipeline):
    i2v = True
