"""Bagel text-to-image pipeline.

Mirrors the reference BagelPipeline + Bagel.generate_image (reference
vllm_omni/diffusion/models/bagel/pipeline_bagel.py,
bagel_transformer.py:1623-1780):

- the MoT trunk denoises in-context: each step packs
  [prompt ; <start_of_image> ; x_t patches ; <end_of_image>], embeds
  the latent patches through vae2llm + learned 2D position embeddings
  + the timestep embedding, and reads the velocity back via llm2vae;
- timesteps run 1 -> 0 through the shift warp
  ``s*t / (1 + (s-1) t)`` with ``x <- x - v dt`` (:1657-1661);
- text CFG contrasts the prompt-conditioned branch against an
  empty-prompt branch (cfg_text of the reference; img-CFG applies to
  editing and rides the same machinery);
- the shared causal VAE decodes the final latents.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.diffusion.data import DiffusionSamplingParams
from ht_vllm_omni_tpu.diffusion.models.bagel import mot
from ht_vllm_omni_tpu.diffusion.models.bagel.config import BagelArchConfig
from ht_vllm_omni_tpu.diffusion.models.qwen_image import vae
from ht_vllm_omni_tpu.diffusion.models.qwen_image.config import (
    QwenImageVAEConfig,
)


class BagelPipeline:
    def __init__(
        self,
        arch: BagelArchConfig | None = None,
        vae_cfg: QwenImageVAEConfig | None = None,
        params: dict | None = None,
        seed: int = 0,
        tokenizer=None,
        max_text_len: int = 128,
    ) -> None:
        self.arch = arch or BagelArchConfig.tiny()
        zc = self.arch.latent_channels
        self.vae_cfg = vae_cfg or QwenImageVAEConfig(
            base_dim=8, z_dim=zc, dim_mult=(1, 2), num_res_blocks=1,
            latents_mean=(0.0,) * zc, latents_std=(1.0,) * zc,
        )
        self.tokenizer = tokenizer
        self.max_text_len = max_text_len
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        params = params or {}
        self.params = {
            "mot": params.get("mot") or mot.init_params(self.arch, k1),
            "vae": params.get("vae") or vae.init_params(self.vae_cfg, k2),
        }
        self._fns: dict = {}

    def _tokenize(self, text: str) -> list[int]:
        if self.tokenizer is not None:
            return list(self.tokenizer(text))
        v = self.arch.vocab_size
        return [b % min(v, 120) for b in text.encode("utf-8")] or [0]

    def _step_fn(self):
        fn = self._fns.get("step")
        if fn is None:
            cfg = self.arch

            def run(params, prompt_ids, x_t, pos_ids, t, prompt_len):
                """One velocity eval; prompt_len static via closure
                split (jit over static_argnums)."""
                n_vae = x_t.shape[0]
                # embed prompt + markers
                emb_prompt = params["embed"][prompt_ids]
                soi = params["embed"][cfg.start_of_image][None]
                eoi = params["embed"][cfg.end_of_image][None]
                lat = (
                    x_t @ params["vae2llm_w"] + params["vae2llm_b"]
                    + params["latent_pos"][pos_ids]
                )
                temb = jax.nn.silu(
                    mot.sinus_t(t[None]) @ params["t_w1"] + params["t_b1"]
                )
                temb = temb @ params["t_w2"] + params["t_b2"]
                lat = lat + temb
                x = jnp.concatenate([emb_prompt, soi, lat, eoi], 0)
                s = x.shape[0]
                pl = prompt_ids.shape[0]
                positions = jnp.arange(s)
                gen_mask = jnp.zeros((s,), jnp.int32)
                gen_mask = gen_mask.at[pl + 1: pl + 1 + n_vae].set(1)
                h = mot.forward(cfg, params, x, positions, gen_mask, pl)
                v = (
                    h[pl + 1: pl + 1 + n_vae] @ params["llm2vae_w"]
                    + params["llm2vae_b"]
                )
                return v

            fn = jax.jit(run)
            self._fns["step"] = fn
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
        fn = self._step_fn()
        gscale = float(sp.guidance_scale or 1.0)
        do_cfg = state["do_cfg"]
        ts, dts = state["ts"], state["dts"]

        end = min(state["step"] + count, sp.num_inference_steps - 1)
        x_t = state["latents"]  # [n_vae, patch_latent_dim]
        for step in range(state["step"], end):
            t = jnp.float32(ts[step])
            v = fn(
                self.params["mot"], state["prompt_ids"], x_t,
                state["pos_ids"], t, None,
            )
            if do_cfg:
                v_un = fn(
                    self.params["mot"], state["empty_ids"], x_t,
                    state["pos_ids"], t, None,
                )
                v = v_un.astype(jnp.float32) + gscale * (
                    v.astype(jnp.float32) - v_un.astype(jnp.float32)
                )
            x_t = x_t - v.astype(jnp.float32) * jnp.float32(dts[step])
        state["latents"] = x_t
        state["step"] = end
        if end >= sp.num_inference_steps - 1:
            return self._decode(state), state
        return None, state

    def _decode(self, state) -> np.ndarray:
        lat_h, lat_w = state["lat_hw"]
        ps = self.arch.latent_patch_size
        zc = self.arch.latent_channels
        ht, wt = lat_h // ps, lat_w // ps
        x = state["latents"].reshape(1, ht, wt, ps, ps, zc)
        x = x.transpose(0, 5, 1, 3, 2, 4).reshape(1, zc, lat_h, lat_w)
        dec = self._fns.get("decode")
        if dec is None:
            cfg = self.vae_cfg

            def run(params, lat):
                lat = vae.denormalize_latents(
                    cfg, lat.transpose(0, 2, 3, 1)
                )
                img = vae.decode(cfg, params, lat)
                return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)

            dec = jax.jit(run)
            self._fns["decode"] = dec
        img = dec(self.params["vae"], x)[0]
        return np.asarray(img * 255.0, np.float32).astype(np.uint8)

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
        ratio = self.vae_cfg.spatial_ratio
        ps = self.arch.latent_patch_size
        lat_h = max(ps * (sp.height // (ratio * ps)), ps)
        lat_w = max(ps * (sp.width // (ratio * ps)), ps)
        ht, wt = lat_h // ps, lat_w // ps
        n_vae = ht * wt

        ids = self._tokenize(
            getattr(prompt, "text", None) or ""
        )[: self.max_text_len]
        pad = -len(ids) % 8
        prompt_ids = np.asarray(ids + [0] * pad, np.int32)
        empty_ids = np.zeros_like(prompt_ids)

        # 2D latent positions into the learned table (row-major over the
        # max_latent_size grid)
        gh, gw = np.meshgrid(np.arange(ht), np.arange(wt), indexing="ij")
        pos_ids = (
            gh * self.arch.max_latent_size + gw
        ).reshape(-1).astype(np.int32)
        pos_ids = np.clip(pos_ids, 0, self.arch.max_latent_size**2 - 1)

        key = jax.random.PRNGKey(sp.seed if sp.seed is not None else 0)
        noise = jax.random.normal(
            key, (n_vae, self.arch.patch_latent_dim), jnp.float32
        )
        shift = self.arch.timestep_shift
        ts = np.linspace(1.0, 0.0, sp.num_inference_steps)
        ts = shift * ts / (1 + (shift - 1) * ts)
        dts = ts[:-1] - ts[1:]
        do_cfg = sp.guidance_scale is not None and sp.guidance_scale > 1.0
        return {
            "latents": noise,
            "prompt_ids": jnp.asarray(prompt_ids),
            "empty_ids": jnp.asarray(empty_ids),
            "pos_ids": jnp.asarray(pos_ids),
            "lat_hw": (lat_h, lat_w),
            "ts": ts[:-1],
            "dts": dts,
            "do_cfg": do_cfg,
            "step": 0,
        }
