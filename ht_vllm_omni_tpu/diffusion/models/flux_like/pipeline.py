"""Ovis-Image and LongCat-Image pipelines.

Both follow the Flux text-to-image recipe (packed 2x2 latents, true CFG,
flow-match shift); they differ in position-id conventions (reference
pipeline_ovis_image.py, pipeline_longcat_image.py):

- Ovis: flux-style ids — text at the origin, image grid at axes (0,h,w);
- LongCat: modality ids on axis 0 (text 0, target image 1, edit
  conditioning image 2) with image grid positions offset by the text
  length on the h/w axes (prepare_pos_ids, pipeline_longcat_image_edit
  .py:455-476); the edit variant appends the VAE-encoded input image
  as extra tokens, only the target segment is denoised.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.config import ModelArchConfig
from ht_vllm_omni_tpu.diffusion.data import DiffusionSamplingParams
from ht_vllm_omni_tpu.diffusion.models.flux_like import transformer
from ht_vllm_omni_tpu.diffusion.models.flux_like.config import (
    FluxLikeArchConfig,
)
from ht_vllm_omni_tpu.diffusion.models.qwen_image import vae
from ht_vllm_omni_tpu.diffusion.models.qwen_image.config import (
    QwenImageVAEConfig,
)
from ht_vllm_omni_tpu.diffusion.models.qwen_image.pipeline import (
    pack_latents,
    unpack_latents,
)
from ht_vllm_omni_tpu.diffusion.schedulers.unipc import (
    FlowEulerScheduler,
    FlowUniPCScheduler,
    calculate_shift,
)
from ht_vllm_omni_tpu.models import qwen2


class _FluxLikePipeline:
    arch_factory = FluxLikeArchConfig.ovis_tiny
    ids_scheme = "flux"  # "flux" | "longcat"

    def __init__(
        self,
        arch: FluxLikeArchConfig | None = None,
        vae_cfg: QwenImageVAEConfig | None = None,
        text_cfg: ModelArchConfig | None = None,
        params: dict | None = None,
        seed: int = 0,
        scheduler: str = "euler",
        tokenizer=None,
        max_text_len: int = 256,
    ) -> None:
        self.arch = arch or type(self).arch_factory()
        zc = self.arch.in_channels // 4
        self.vae_cfg = vae_cfg or QwenImageVAEConfig(
            base_dim=8, z_dim=zc, dim_mult=(1, 2), num_res_blocks=1,
            latents_mean=(0.0,) * zc, latents_std=(1.0,) * zc,
        )
        self.text_cfg = text_cfg or ModelArchConfig(
            hidden_size=self.arch.joint_attention_dim,
            num_hidden_layers=2,
            num_attention_heads=2,
            num_key_value_heads=2,
            intermediate_size=64,
            vocab_size=512,
        )
        self.scheduler_kind = scheduler
        self.tokenizer = tokenizer
        self.max_text_len = max_text_len
        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        params = params or {}
        self.params = {
            "transformer": params.get("transformer")
            or transformer.init_params(self.arch, k1),
            "vae": params.get("vae") or vae.init_params(self.vae_cfg, k2),
            "text": params.get("text")
            or qwen2.init_params(self.text_cfg, k3),
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

    # ----------------------------------------------------------- pos ids
    def _img_ids(
        self, ht: int, wt: int, s_txt: int, modality: int
    ) -> np.ndarray:
        ids = np.zeros((ht * wt, 3), np.int64)
        gh, gw = np.meshgrid(np.arange(ht), np.arange(wt), indexing="ij")
        if self.ids_scheme == "longcat":
            ids[:, 0] = modality
            ids[:, 1] = gh.reshape(-1) + s_txt
            ids[:, 2] = gw.reshape(-1) + s_txt
        else:
            ids[:, 0] = max(modality - 1, 0)  # target 0, cond 1 (flux)
            ids[:, 1] = gh.reshape(-1)
            ids[:, 2] = gw.reshape(-1)
        return ids

    def _txt_ids(self, s_txt: int) -> np.ndarray:
        return np.zeros((s_txt, 3), np.int64)

    # ------------------------------------------------------------ denoise
    def generate_prompt(
        self,
        prompt,
        sp: DiffusionSamplingParams,
        stepwise_state: dict | None = None,
    ) -> tuple[np.ndarray | None, dict]:
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
        cond = state.get("cond_latents")

        end = min(state["step"] + count, sp.num_inference_steps)
        latents = state["latents"]
        for step in range(state["step"], end):
            sigma = sched.timestep(step)
            t = jnp.full((nb,), sigma, jnp.float32)
            inp = (
                latents
                if cond is None
                else jnp.concatenate([latents, cond], axis=1)
            )
            v = fn(
                self.params["transformer"],
                jnp.concatenate([inp] * nb, 0),
                state["txt"],
                t,
                state["txt_rope"],
                state["img_rope"],
            )
            v = v[:, : latents.shape[1]]
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
            lat_h, lat_w = state["lat_hw"]
            dec = self._fns.get("decode")
            if dec is None:
                cfg = self.vae_cfg

                def run(params, tokens):
                    lat = unpack_latents(tokens, lat_h, lat_w)
                    lat = vae.denormalize_latents(
                        cfg, lat.transpose(0, 2, 3, 1)
                    )
                    img = vae.decode(cfg, params, lat)
                    return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)

                dec = jax.jit(run)
                self._fns["decode"] = dec
            img = dec(self.params["vae"], latents)[0]
            return (
                np.asarray(img * 255.0, np.float32).astype(np.uint8),
                state,
            )
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
    def _cond_image(self, prompt) -> np.ndarray | None:
        return None  # base families are text-to-image only

    def _prepare(self, prompt, sp: DiffusionSamplingParams) -> dict:
        ratio = self.vae_cfg.spatial_ratio
        lat_h = max(2 * (sp.height // (ratio * 2)), 2)
        lat_w = max(2 * (sp.width // (ratio * 2)), 2)
        seq_len = (lat_h // 2) * (lat_w // 2)

        text = getattr(prompt, "text", None) or ""
        embeds = getattr(prompt, "embeds", None)
        pos = (
            np.asarray(embeds, np.float32)
            if embeds is not None
            else self.encode_text(text)
        )
        do_cfg = sp.guidance_scale is not None and sp.guidance_scale > 1.0
        branches = [pos]
        if do_cfg:
            neg = getattr(prompt, "negative_text", None) or " "
            branches.append(self.encode_text(neg))
        s_txt = max(b.shape[0] for b in branches)
        s_txt = s_txt + (-s_txt % 8)
        txt = np.zeros(
            (len(branches), s_txt, self.arch.joint_attention_dim),
            np.float32,
        )
        for i, b_ in enumerate(branches):
            txt[i, : b_.shape[0]] = b_

        key = jax.random.PRNGKey(sp.seed if sp.seed is not None else 0)
        noise = jax.random.normal(
            key, (1, self.arch.in_channels // 4, lat_h, lat_w),
            jnp.float32,
        )
        img_ids = self._img_ids(lat_h // 2, lat_w // 2, s_txt, 1)
        state: dict = {}
        cond_img = self._cond_image(prompt)
        if cond_img is not None:
            fn = self._fns.get("encode_cond")
            if fn is None:
                cfg = self.vae_cfg

                def run(params, x):
                    z = vae.encode(cfg, params, x)
                    return vae.normalize_latents(cfg, z)

                fn = jax.jit(run)
                self._fns["encode_cond"] = fn
            img = cond_img
            if img.shape[:2] != (sp.height, sp.width):
                ri = (
                    np.arange(sp.height) * img.shape[0] // sp.height
                ).clip(0, img.shape[0] - 1)
                ci = (
                    np.arange(sp.width) * img.shape[1] // sp.width
                ).clip(0, img.shape[1] - 1)
                img = img[ri][:, ci]
            z = fn(self.params["vae"], jnp.asarray(img * 2.0 - 1.0)[None])
            z = jnp.transpose(z, (0, 3, 1, 2))[:, :, :lat_h, :lat_w]
            state["cond_latents"] = pack_latents(z)
            img_ids = np.concatenate(
                [img_ids, self._img_ids(lat_h // 2, lat_w // 2, s_txt, 2)]
            )

        mu = calculate_shift(seq_len)
        sched = (
            FlowUniPCScheduler(sp.num_inference_steps, mu=mu)
            if self.scheduler_kind == "unipc"
            else FlowEulerScheduler(sp.num_inference_steps, mu=mu)
        )
        state.update({
            "latents": pack_latents(noise),
            "txt": jnp.asarray(txt),
            "txt_rope": transformer.rope_tables(
                self.arch, self._txt_ids(s_txt)
            ),
            "img_rope": transformer.rope_tables(self.arch, img_ids),
            "lat_hw": (lat_h, lat_w),
            "sched": sched,
            "sched_state": sched.init_state(),
            "do_cfg": do_cfg,
            "step": 0,
        })
        return state


class OvisImagePipeline(_FluxLikePipeline):
    arch_factory = FluxLikeArchConfig.ovis_tiny
    ids_scheme = "flux"


class LongCatImagePipeline(_FluxLikePipeline):
    arch_factory = FluxLikeArchConfig.longcat_tiny
    ids_scheme = "longcat"


class LongCatImageEditPipeline(LongCatImagePipeline):
    """Edit variant: the VAE-encoded input image rides as a modality-2
    conditioning segment (pipeline_longcat_image_edit.py)."""

    def _cond_image(self, prompt) -> np.ndarray | None:
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
