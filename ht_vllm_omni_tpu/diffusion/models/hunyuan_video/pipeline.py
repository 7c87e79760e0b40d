"""HunyuanVideo 1.5 pipelines (t2v + i2v).

Mirrors the reference HunyuanVideo15Pipeline /
HunyuanVideo15I2VPipeline (reference vllm_omni/diffusion/models/
hunyuan_video/pipeline_hunyuan_video_1_5*.py):

- two text streams: MLLM features (refined in-model) and ByT5 glyph
  features, each with its own mask (here: two bundled text trunks);
- the model input concatenates [noise latents, conditioning latents,
  mask] channel-wise (:451); t2v passes zeros, i2v plants the encoded
  first frame in the conditioning latents with mask 1 on frame 0;
- true CFG over negative prompts; flow-match Euler; the causal-3D
  video VAE (shared with the Wan family) decodes the result.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.config import ModelArchConfig
from ht_vllm_omni_tpu.diffusion.data import DiffusionSamplingParams
from ht_vllm_omni_tpu.diffusion.models.hunyuan_video import transformer
from ht_vllm_omni_tpu.diffusion.models.hunyuan_video.config import (
    HunyuanVideoArchConfig,
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


class HunyuanVideoPipeline:
    def __init__(
        self,
        arch: HunyuanVideoArchConfig | None = None,
        vae_cfg: WanVideoVAEConfig | None = None,
        text_cfg: ModelArchConfig | None = None,
        params: dict | None = None,
        seed: int = 0,
        tokenizer=None,
        max_text_len: int = 256,
    ) -> None:
        self.arch = arch or HunyuanVideoArchConfig.tiny()
        zc = self.arch.latent_channels
        self.vae_cfg = vae_cfg or WanVideoVAEConfig(
            base_dim=8, z_dim=zc, dim_mult=(1, 2), num_res_blocks=1,
            temporal_resample=(True,),
            latents_mean=(0.0,) * zc, latents_std=(1.0,) * zc,
        )
        self.text_cfg = text_cfg or ModelArchConfig(
            hidden_size=self.arch.text_embed_dim,
            num_hidden_layers=2,
            num_attention_heads=2,
            num_key_value_heads=2,
            intermediate_size=64,
            vocab_size=512,
        )
        self.text2_cfg = ModelArchConfig(
            hidden_size=self.arch.text_embed_2_dim,
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
            "text": params.get("text")
            or qwen2.init_params(self.text_cfg, k3),
            "text2": params.get("text2")
            or qwen2.init_params(self.text2_cfg, k4),
        }
        self._fns: dict = {}

    # --------------------------------------------------------------- text
    def _tokenize(self, text: str, vocab: int) -> list[int]:
        if self.tokenizer is not None:
            return [t % vocab for t in self.tokenizer(text)]
        return [b % vocab for b in text.encode("utf-8")] or [0]

    def _encode(self, which: str, cfg, text: str) -> np.ndarray:
        ids = self._tokenize(text, cfg.vocab_size)[: self.max_text_len]
        fn = self._fns.get(f"text_{which}")
        if fn is None:

            def run(params, token_ids, length):
                emb = qwen2.embed_tokens(params, token_ids)
                pos = jnp.arange(token_ids.shape[0], dtype=jnp.int32)
                h, _ = qwen2.prefill(cfg, params, emb, pos, length)
                return h

            fn = jax.jit(run)
            self._fns[f"text_{which}"] = fn
        n = len(ids)
        pad = -n % 32
        arr = jnp.asarray(ids + [0] * pad, jnp.int32)
        h = fn(self.params[which], arr, jnp.int32(n))
        return np.asarray(h[:n], np.float32)

    # ------------------------------------------------------------ denoise
    def _transformer_fn(self):
        fn = self._fns.get("transformer")
        if fn is None:
            fn = jax.jit(functools.partial(transformer.forward, self.arch))
            self._fns["transformer"] = fn
        return fn

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
        fn = self._transformer_fn()
        gscale = float(sp.guidance_scale or 1.0)
        do_cfg = state["do_cfg"]
        nb = state["txt"].shape[0]

        end = min(state["step"] + count, sp.num_inference_steps)
        latents = state["latents"]  # [1, C, F, H, W]
        for step in range(state["step"], end):
            sigma = sched.timestep(step)
            t = jnp.full((nb,), sigma * 1000.0, jnp.float32)
            inp = jnp.concatenate(
                [latents, state["cond"], state["mask"]], axis=1
            )
            v = fn(
                self.params["transformer"],
                jnp.concatenate([inp] * nb, 0),
                state["txt"], state["txt_mask"],
                state["txt2"], state["txt2_mask"],
                state["img_embeds"],
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
            return self._decode(latents), state
        return None, state

    def _decode(self, latents) -> np.ndarray:
        fn = self._fns.get("decode")
        if fn is None:
            cfg = self.vae_cfg

            def run(params, z):
                # NCFHW -> channels-last [B, F, H, W, C]
                z = jnp.transpose(z, (0, 2, 3, 4, 1))
                z = vae3d.denormalize_latents(cfg, z)
                vid = vae3d.decode(cfg, params, z)
                return jnp.clip(vid * 0.5 + 0.5, 0.0, 1.0)

            fn = jax.jit(run)
            self._fns["decode"] = fn
        vid = fn(self.params["vae"], latents)[0]  # [F, H, W, 3]
        return np.asarray(vid * 255.0, np.float32).astype(np.uint8)

    # ------------------------------------------------------------ prepare
    def _init_image(self, prompt) -> np.ndarray | None:
        mm = getattr(prompt, "multi_modal_data", None) or {}
        img = mm.get("image")
        if img is None:
            info = getattr(prompt, "additional_information", None) or {}
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
        zc = self.arch.latent_channels

        text = getattr(prompt, "text", None) or ""
        pos = self._encode("text", self.text_cfg, text)
        pos2 = self._encode("text2", self.text2_cfg, text)
        do_cfg = sp.guidance_scale is not None and sp.guidance_scale > 1.0
        branches = [(pos, pos2)]
        if do_cfg:
            neg = getattr(prompt, "negative_text", None) or " "
            branches.append(
                (
                    self._encode("text", self.text_cfg, neg),
                    self._encode("text2", self.text2_cfg, neg),
                )
            )
        nb = len(branches)

        def pad_stack(items, dim):
            s = max(x.shape[0] for x in items)
            s = s + (-s % 8)
            out = np.zeros((nb, s, dim), np.float32)
            mask = np.zeros((nb, s), np.int32)
            for i, x in enumerate(items):
                out[i, : x.shape[0]] = x
                mask[i, : x.shape[0]] = 1
            return jnp.asarray(out), jnp.asarray(mask)

        txt, txt_mask = pad_stack(
            [b[0] for b in branches], self.arch.text_embed_dim
        )
        txt2, txt2_mask = pad_stack(
            [b[1] for b in branches], self.arch.text_embed_2_dim
        )

        key = jax.random.PRNGKey(sp.seed if sp.seed is not None else 0)
        noise = jax.random.normal(
            key, (1, zc, lat_f, lat_h, lat_w), jnp.float32
        )
        cond = jnp.zeros_like(noise)
        mask = jnp.zeros((1, 1, lat_f, lat_h, lat_w), jnp.float32)
        init = self._init_image(prompt)
        if init is not None:
            # i2v: encode the first frame, plant it at latent frame 0
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
            z0 = efn(
                self.params["vae"], jnp.asarray(img)[None, None]
            )  # [1, 1, lat_h, lat_w, C] channels-last
            z0 = jnp.transpose(z0, (0, 4, 1, 2, 3))[:, :, 0]
            z0 = z0[:, :, :lat_h, :lat_w]
            pad_h, pad_w = lat_h - z0.shape[2], lat_w - z0.shape[3]
            if pad_h or pad_w:
                z0 = jnp.pad(
                    z0, ((0, 0), (0, 0), (0, pad_h), (0, pad_w))
                )
            cond = cond.at[:, :, 0].set(z0)
            mask = mask.at[:, :, 0].set(1.0)

        img_embeds = jnp.zeros(
            (nb, 4, self.arch.image_embed_dim), jnp.float32
        )

        seq_len = lat_f * lat_h * lat_w
        sched = FlowEulerScheduler(
            sp.num_inference_steps, mu=calculate_shift(seq_len)
        )
        return {
            "latents": noise,
            "cond": cond,
            "mask": mask,
            "txt": txt, "txt_mask": txt_mask,
            "txt2": txt2, "txt2_mask": txt2_mask,
            "img_embeds": img_embeds,
            "sched": sched,
            "sched_state": sched.init_state(),
            "do_cfg": do_cfg,
            "step": 0,
        }


class HunyuanVideoI2VPipeline(HunyuanVideoPipeline):
    """Same pipeline; i2v is selected by an input image riding in the
    prompt (reference pipeline_hunyuan_video_1_5_i2v.py)."""
