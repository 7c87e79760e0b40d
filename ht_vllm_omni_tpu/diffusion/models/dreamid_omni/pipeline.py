"""DreamID-Omni pipeline: text (+reference image) -> video WITH audio.

Mirrors the reference DreamIDOmniPipeline (reference vllm_omni/
diffusion/models/dreamid_omni/pipeline_dreamid_omni.py): both
modalities denoise jointly through the fused Wan trunks under one
flow-match schedule (UniPC, shift 5 in the reference :222-250), with
text CFG across both streams; the video decodes through the causal-3D
VAE and the audio latents through the Oobleck decoder (the reference's
MMAudio VAE is mel-based — the waveform substitution is noted here).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.config import ModelArchConfig
from ht_vllm_omni_tpu.diffusion.data import DiffusionSamplingParams
from ht_vllm_omni_tpu.diffusion.models.dreamid_omni import fusion
from ht_vllm_omni_tpu.diffusion.models.stable_audio import oobleck
from ht_vllm_omni_tpu.diffusion.models.stable_audio.config import (
    OobleckConfig,
)
from ht_vllm_omni_tpu.diffusion.models.wan_video import (
    transformer as wan,
    vae3d,
)
from ht_vllm_omni_tpu.diffusion.models.wan_video.config import (
    WanVideoArchConfig,
    WanVideoVAEConfig,
)
from ht_vllm_omni_tpu.diffusion.schedulers.unipc import (
    FlowUniPCScheduler,
)
from ht_vllm_omni_tpu.models import qwen2


class DreamIDOmniPipeline:
    def __init__(
        self,
        video_arch: WanVideoArchConfig | None = None,
        audio_arch: WanVideoArchConfig | None = None,
        vae_cfg: WanVideoVAEConfig | None = None,
        audio_vae_cfg: OobleckConfig | None = None,
        text_cfg: ModelArchConfig | None = None,
        params: dict | None = None,
        seed: int = 0,
        tokenizer=None,
        max_text_len: int = 128,
    ) -> None:
        self.vcfg = video_arch or WanVideoArchConfig.tiny()
        # audio trunk: same architecture family, 1D grid (f, 1, 1)
        import dataclasses as _dc

        self.acfg = audio_arch or _dc.replace(
            WanVideoArchConfig.tiny(),
            in_channels=8, out_channels=8, patch_size=(1, 1, 1),
        )
        if self.vcfg.num_layers != self.acfg.num_layers:
            raise ValueError("fused trunks need equal layer counts")
        self.vae_cfg = vae_cfg or WanVideoVAEConfig.tiny()
        self.audio_vae_cfg = audio_vae_cfg or OobleckConfig.tiny()
        self.text_cfg = text_cfg or ModelArchConfig(
            hidden_size=self.vcfg.text_dim,
            num_hidden_layers=2,
            num_attention_heads=2,
            num_key_value_heads=2,
            intermediate_size=48,
            vocab_size=384,
        )
        if self.acfg.text_dim != self.vcfg.text_dim:
            raise ValueError("trunks must share the text feature width")
        self.tokenizer = tokenizer
        self.max_text_len = max_text_len
        key = jax.random.PRNGKey(seed)
        k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
        params = params or {}
        self.params = params.get("fused") or {
            "video": wan.init_params(self.vcfg, k1),
            "audio": wan.init_params(self.acfg, k2),
            "video_fusion": fusion.init_fusion_params(self.vcfg, k3),
            "audio_fusion": fusion.init_fusion_params(self.acfg, k4),
        }
        self.vae_params = params.get("vae") or vae3d.init_params(
            self.vae_cfg, k5
        )
        ov_key, txt_key = jax.random.split(k6)
        self.audio_vae_params = params.get("audio_vae") or (
            oobleck.init_params(self.audio_vae_cfg, ov_key)
        )
        self.text_params = params.get("text") or qwen2.init_params(
            self.text_cfg, txt_key
        )
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
        h = fn(self.text_params, arr, jnp.int32(n))
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
        fn = self._fns.get("fused")
        if fn is None:
            fn = jax.jit(
                functools.partial(fusion.forward, self.vcfg, self.acfg)
            )
            self._fns["fused"] = fn
        gscale = float(sp.guidance_scale or 1.0)
        do_cfg = state["do_cfg"]

        end = min(state["step"] + count, sp.num_inference_steps)
        v_lat, a_lat = state["v_lat"], state["a_lat"]
        for step in range(state["step"], end):
            sigma = sched.timestep(step)
            preds = []
            for branch in range(2 if do_cfg else 1):
                t = jnp.full((1,), sigma * 1000.0, jnp.float32)
                vv, av = fn(
                    self.params, v_lat, a_lat, t,
                    state["txt"][branch], state["txt_lens"][branch],
                    state["txt"][branch], state["txt_lens"][branch],
                )
                preds.append((vv.astype(jnp.float32),
                              av.astype(jnp.float32)))
            if do_cfg:
                (pv, pa), (nv, na) = preds
                vpred = nv + gscale * (pv - nv)
                apred = na + gscale * (pa - na)
            else:
                vpred, apred = preds[0]
            v_lat, state["v_sched"] = sched.step(
                state["v_sched"], vpred, v_lat
            )
            a_lat, state["a_sched"] = state["a_sched_obj"].step(
                state["a_sched"], apred, a_lat
            )
        state["v_lat"], state["a_lat"] = v_lat, a_lat
        state["step"] = end
        if end >= sp.num_inference_steps:
            return self._decode(state), state
        return None, state

    def _decode(self, state) -> dict:
        dec = self._fns.get("decode_v")
        if dec is None:
            cfg = self.vae_cfg

            def run(params, z):
                z = jnp.transpose(z, (0, 2, 3, 4, 1))
                z = vae3d.denormalize_latents(cfg, z)
                vid = vae3d.decode(cfg, params, z)
                return jnp.clip(vid * 0.5 + 0.5, 0.0, 1.0)

            dec = jax.jit(run)
            self._fns["decode_v"] = dec
        vid = np.asarray(dec(self.vae_params, state["v_lat"]))[0]
        vid = (vid * 255.0).astype(np.uint8)

        deca = self._fns.get("decode_a")
        if deca is None:
            acfg_v = self.audio_vae_cfg

            def run_a(params, z):
                return oobleck.decode(acfg_v, params, z)

            deca = jax.jit(run_a)
            self._fns["decode_a"] = deca
        # audio latents [1, C, F, 1, 1] -> [1, F, C]
        a = state["a_lat"][:, :, :, 0, 0].transpose(0, 2, 1)
        wav = np.asarray(deca(self.audio_vae_params, a))[0]
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
        p.negative_text = None
        p.embeds = None
        return self.generate_prompt(p, sp, stepwise_state)

    def _prepare(self, prompt, sp: DiffusionSamplingParams) -> dict:
        info = getattr(prompt, "additional_information", None) or {}
        frames = int(info.get("num_frames", 5))
        tstride = self.vae_cfg.temporal_ratio
        lat_f = 1 + (frames - 1) // tstride
        ratio = self.vae_cfg.spatial_ratio
        lat_h = max(sp.height // ratio, 2)
        lat_w = max(sp.width // ratio, 2)
        a_frames = int(info.get("audio_latent_frames", 4 * lat_f))

        text = getattr(prompt, "text", None) or ""
        pos = self.encode_text(text)
        do_cfg = sp.guidance_scale is not None and sp.guidance_scale > 1.0
        branches = [pos]
        if do_cfg:
            branches.append(self.encode_text(" "))
        s_txt = max(b.shape[0] for b in branches)
        s_txt = s_txt + (-s_txt % 8)
        txt = np.zeros(
            (len(branches), 1, s_txt, self.vcfg.text_dim), np.float32
        )
        lens = np.zeros((len(branches), 1), np.int32)
        for i, b_ in enumerate(branches):
            txt[i, 0, : b_.shape[0]] = b_
            lens[i, 0] = b_.shape[0]

        key = jax.random.PRNGKey(sp.seed if sp.seed is not None else 0)
        kv, ka = jax.random.split(key)
        v_lat = jax.random.normal(
            kv,
            (1, self.vcfg.in_channels, lat_f, lat_h, lat_w),
            jnp.float32,
        )
        a_lat = jax.random.normal(
            ka, (1, self.acfg.in_channels, a_frames, 1, 1), jnp.float32
        )
        sched = FlowUniPCScheduler(sp.num_inference_steps, mu=1.6)
        a_sched = FlowUniPCScheduler(sp.num_inference_steps, mu=1.6)
        return {
            "v_lat": v_lat,
            "a_lat": a_lat,
            "txt": jnp.asarray(txt),
            "txt_lens": jnp.asarray(lens),
            "sched": sched,
            "v_sched": sched.init_state(),
            "a_sched_obj": a_sched,
            "a_sched": a_sched.init_state(),
            "do_cfg": do_cfg,
            "step": 0,
        }
