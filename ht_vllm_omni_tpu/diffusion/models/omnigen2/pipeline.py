"""OmniGen2 pipeline: text (+optional reference images) -> image.

Mirrors the reference OmniGen2Pipeline (reference vllm_omni/diffusion/
models/omnigen2/pipeline_omnigen2.py): Qwen-family text features
(text_feat_dim) condition the Lumina2-style trunk; reference images are
VAE-encoded, patchified and refined through the dedicated ref-image
refiner before joining the joint sequence; flow-match Euler with true
CFG over the negative prompt.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.config import ModelArchConfig
from ht_vllm_omni_tpu.diffusion.data import DiffusionSamplingParams
from ht_vllm_omni_tpu.diffusion.models.omnigen2 import transformer
from ht_vllm_omni_tpu.diffusion.models.omnigen2.transformer import (
    OmniGen2ArchConfig,
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
    calculate_shift,
)
from ht_vllm_omni_tpu.models import qwen2


class OmniGen2Pipeline:
    def __init__(
        self,
        arch: OmniGen2ArchConfig | None = None,
        vae_cfg: QwenImageVAEConfig | None = None,
        text_cfg: ModelArchConfig | None = None,
        params: dict | None = None,
        seed: int = 0,
        tokenizer=None,
        max_text_len: int = 256,
    ) -> None:
        self.arch = arch or OmniGen2ArchConfig.tiny()
        zc = self.arch.in_channels
        self.vae_cfg = vae_cfg or QwenImageVAEConfig(
            base_dim=8, z_dim=zc, dim_mult=(1, 2), num_res_blocks=1,
            latents_mean=(0.0,) * zc, latents_std=(1.0,) * zc,
        )
        self.text_cfg = text_cfg or ModelArchConfig(
            hidden_size=self.arch.text_feat_dim,
            num_hidden_layers=2,
            num_attention_heads=2,
            num_key_value_heads=2,
            intermediate_size=48,
            vocab_size=384,
        )
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
            fn = jax.jit(
                functools.partial(transformer.forward, self.arch),
                static_argnames=("grid", "ref_grids"),
            )
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
                state.get("ref_tokens"),
                t,
                state["grid"],
                state["ref_grids"],
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

    def _ref_images(self, prompt) -> list[np.ndarray]:
        mm = getattr(prompt, "multi_modal_data", None) or {}
        info = getattr(prompt, "additional_information", None) or {}
        imgs = mm.get("image")
        if imgs is None:
            imgs = info.get("init_image")
        if imgs is None:
            return []
        if not isinstance(imgs, (list, tuple)):
            imgs = [imgs]
        out = []
        for im in imgs:
            im = np.asarray(im, np.float32)
            if im.max() > 1.5:
                im = im / 255.0
            out.append(im)
        return out

    def _prepare(self, prompt, sp: DiffusionSamplingParams) -> dict:
        ratio = self.vae_cfg.spatial_ratio
        ps = self.arch.patch_size
        lat_h = max(ps * (sp.height // (ratio * ps)), ps)
        lat_w = max(ps * (sp.width // (ratio * ps)), ps)
        grid = (lat_h // ps, lat_w // ps)
        seq_len = grid[0] * grid[1]

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
            (len(branches), s_txt, self.arch.text_feat_dim), np.float32
        )
        for i, b_ in enumerate(branches):
            txt[i, : b_.shape[0]] = b_

        # reference images -> VAE latents -> patch tokens
        ref_tokens = None
        ref_grids: tuple = ()
        refs = self._ref_images(prompt)
        if refs:
            fn = self._fns.get("encode_ref")
            if fn is None:
                cfg = self.vae_cfg

                def run(params, x):
                    z = vae.encode(cfg, params, x)
                    return vae.normalize_latents(cfg, z)

                fn = jax.jit(run)
                self._fns["encode_ref"] = fn
            segs, grids = [], []
            for im in refs:
                z = fn(
                    self.params["vae"],
                    jnp.asarray(im * 2.0 - 1.0)[None],
                )
                z = jnp.transpose(z, (0, 3, 1, 2))
                rh = (z.shape[2] // ps) * ps
                rw = (z.shape[3] // ps) * ps
                z = z[:, :, :rh, :rw]
                segs.append(pack_latents(z))
                grids.append((rh // ps, rw // ps))
            ref_tokens = jnp.concatenate(segs, axis=1)
            ref_grids = tuple(grids)
            if do_cfg:
                ref_tokens = jnp.concatenate([ref_tokens] * 2, 0)

        key = jax.random.PRNGKey(sp.seed if sp.seed is not None else 0)
        noise = jax.random.normal(
            key, (1, self.arch.in_channels, lat_h, lat_w), jnp.float32
        )
        sched = FlowEulerScheduler(
            sp.num_inference_steps, mu=calculate_shift(seq_len)
        )
        return {
            "latents": pack_latents(noise),
            "txt": jnp.asarray(txt),
            "ref_tokens": ref_tokens,
            "ref_grids": ref_grids,
            "grid": grid,
            "lat_hw": (lat_h, lat_w),
            "sched": sched,
            "sched_state": sched.init_state(),
            "do_cfg": do_cfg,
            "step": 0,
        }
