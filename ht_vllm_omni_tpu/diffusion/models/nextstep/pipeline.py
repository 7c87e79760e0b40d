"""NextStep-1.1 pipeline: AR continuous-token image generation.

Mirrors the reference NextStep11Pipeline (reference vllm_omni/diffusion/
models/nextstep_1_1/pipeline_nextstep_1_1.py):

- the caption is suffixed with ``<|image_area|>H*W`` (in latent-grid
  units, :355-360) and a BOI token, then the Llama trunk generates
  ``h*w`` continuous latent patches autoregressively — each one sampled
  by the flow-matching head and fed back (:390-520);
- CFG runs a cond + uncond caption pair, "constant" or "linear"
  (annealed) schedule;
- the patches unpatchify into the latent image, which a flux-style KL
  VAE (8x spatial) decodes (:122-131, modeling_flux_vae.py).

Unlike step-count diffusion families, there is no outer denoising loop
to stream: the whole AR scan is ONE compiled program, so
``generate_prompt`` finishes in a single call.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.diffusion.data import DiffusionSamplingParams
from ht_vllm_omni_tpu.diffusion.models.nextstep import model as nextstep
from ht_vllm_omni_tpu.diffusion.models.nextstep.model import (
    NextStepArchConfig,
)
from ht_vllm_omni_tpu.diffusion.models.qwen_image import vae
from ht_vllm_omni_tpu.diffusion.models.qwen_image.config import (
    QwenImageVAEConfig,
)

IMAGE_AREA_TOKEN = "<|image_area|>"


class NextStep11Pipeline:
    def __init__(
        self,
        arch: NextStepArchConfig | None = None,
        vae_cfg: QwenImageVAEConfig | None = None,
        params: dict | None = None,
        seed: int = 0,
        tokenizer=None,
        boi_token_id: int | None = None,
        flow_steps: int = 8,
        cfg_schedule: str = "constant",
        timesteps_shift: float = 1.0,
        scaling_factor: float = 1.0,
        shift_factor: float = 0.0,
    ) -> None:
        self.arch = arch or NextStepArchConfig.tiny()
        self.vae_cfg = vae_cfg or QwenImageVAEConfig.tiny()
        if self.vae_cfg.z_dim != self.arch.latent_channels:
            raise ValueError("vae z_dim must match trunk latent_channels")
        self.tokenizer = tokenizer
        self.boi = (
            boi_token_id
            if boi_token_id is not None
            else self.arch.vocab_size - 2
        )
        self.flow_steps = flow_steps
        self.cfg_schedule = cfg_schedule
        self.timesteps_shift = timesteps_shift
        self.scaling_factor = scaling_factor
        self.shift_factor = shift_factor
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        params = params or {}
        self.params = {
            "model": params.get("model")
            or nextstep.init_params(self.arch, k1),
            "vae": params.get("vae") or vae.init_params(self.vae_cfg, k2),
        }
        self._fns: dict = {}

    # --------------------------------------------------------------- text
    def _tokenize(self, text: str) -> list[int]:
        if self.tokenizer is not None:
            return list(self.tokenizer(text))
        v = self.arch.vocab_size
        return [b % (v - 4) for b in text.encode("utf-8")] or [0]

    def _caption_ids(self, text: str, grid: tuple[int, int]) -> list[int]:
        """Caption + image-area suffix + BOI (reference :355-388)."""
        suffix = f"{IMAGE_AREA_TOKEN}{grid[0]}*{grid[1]}"
        return self._tokenize(text + suffix) + [self.boi]

    # ----------------------------------------------------------- generate
    def generate_prompt(
        self,
        prompt,
        sp: DiffusionSamplingParams,
        stepwise_state: dict | None = None,
    ) -> tuple[np.ndarray | None, dict]:
        state = stepwise_state or {}
        h_px = sp.height or 256
        w_px = sp.width or 256
        down = self.vae_cfg.spatial_ratio * self.arch.latent_patch_size
        grid = (max(h_px // down, 1), max(w_px // down, 1))
        side = self.arch.base_image_grid_size
        if grid[0] > side or grid[1] > side:
            raise ValueError(
                f"grid {grid} exceeds base_image_grid_size {side}"
            )
        gscale = float(sp.guidance_scale or 1.0)

        text = getattr(prompt, "text", None) or ""
        ids = self._caption_ids(text, grid)
        if gscale > 1.0:
            neg = getattr(prompt, "negative_text", None) or ""
            uncond = self._caption_ids(neg, grid)
            s_p = max(len(ids), len(uncond))
            s_p += -s_p % 8
            # left-pad with the first token so BOI stays last
            ids = [ids[0]] * (s_p - len(ids)) + ids
            uncond = [uncond[0]] * (s_p - len(uncond)) + uncond
        else:
            pad = -len(ids) % 8
            ids = [ids[0]] * pad + ids
            uncond = ids

        fn = self._fns.get(("gen", grid, gscale > 1.0))
        if fn is None:
            fn = jax.jit(
                functools.partial(
                    nextstep.generate_image_latents,
                    self.arch,
                    grid=grid,
                    cfg_scale=gscale if gscale > 1.0 else 1.0,
                    flow_steps=self.flow_steps,
                    cfg_schedule=self.cfg_schedule,
                    timesteps_shift=self.timesteps_shift,
                )
            )
            self._fns[("gen", grid, gscale > 1.0)] = fn
        key = jax.random.PRNGKey(sp.seed if sp.seed is not None else 0)
        patches = fn(
            self.params["model"],
            jnp.asarray(ids, jnp.int32),
            jnp.asarray(uncond, jnp.int32),
            key=key,
        )
        img = self._decode(patches, grid)
        state["step"] = sp.num_inference_steps
        return img, state

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
        return self.generate_prompt(p, sp, stepwise_state)

    # ------------------------------------------------------------- decode
    def _decode(
        self, patches: jax.Array, grid: tuple[int, int]
    ) -> np.ndarray:
        fn = self._fns.get(("dec", grid))
        if fn is None:
            cfg = self.vae_cfg
            arch = self.arch
            ht, wt = grid
            scale, shift = self.scaling_factor, self.shift_factor

            def run(params, toks):
                lat = nextstep.unpatchify(arch, toks, ht, wt)
                lat = lat / scale + shift
                img = vae.decode(cfg, params, lat[None])
                return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)

            fn = jax.jit(run)
            self._fns[("dec", grid)] = fn
        return np.asarray(fn(self.params["vae"], patches)[0], np.float32)
