"""HunyuanImage-3 pipeline: text -> image through the unified AR-MoE
trunk (reference vllm_omni/diffusion/models/hunyuan_image_3/
pipeline_hunyuan_image_3.py and the in-file
HunyuanImage3Text2ImagePipeline, hunyuan_image_3_transformer.py:2385).

Flow-match Euler over `num_inference_steps` with static shift warp
sigma' = s*sigma / (1 + (s-1)*sigma); CFG duplicates the prompt with an
unconditional caption (guidance is always active in the reference,
:1005-1008).  The text prefix K/V is computed on the first step and
reused for every later step (reference ImageKVCacheManager); each
subsequent step runs only [timestep, image] rows.  Latents decode
through the shared KL VAE (the reference's AutoencoderKLConv3D runs
with T=1, which degenerates to the 2D decode used here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.diffusion.data import DiffusionSamplingParams
from ht_vllm_omni_tpu.diffusion.models.hunyuan_image3 import model as hy
from ht_vllm_omni_tpu.diffusion.models.hunyuan_image3.config import (
    HunyuanImage3ArchConfig,
)
from ht_vllm_omni_tpu.diffusion.models.qwen_image import vae
from ht_vllm_omni_tpu.diffusion.models.qwen_image.config import (
    QwenImageVAEConfig,
)


class HunyuanImage3Pipeline:
    def __init__(
        self,
        arch: HunyuanImage3ArchConfig | None = None,
        vae_cfg: QwenImageVAEConfig | None = None,
        params: dict | None = None,
        seed: int = 0,
        tokenizer=None,
        scaling_factor: float = 1.0,
        shift_factor: float = 0.0,
    ) -> None:
        self.arch = arch or HunyuanImage3ArchConfig.tiny()
        self.vae_cfg = vae_cfg or QwenImageVAEConfig.tiny()
        if self.vae_cfg.z_dim != self.arch.latent_channels:
            raise ValueError("vae z_dim must match latent_channels")
        self.tokenizer = tokenizer
        self.scaling_factor = scaling_factor
        self.shift_factor = shift_factor
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        params = params or {}
        self.params = {
            "model": params.get("model") or hy.init_params(self.arch, k1),
            "vae": params.get("vae") or vae.init_params(self.vae_cfg, k2),
        }
        self._fns: dict = {}

    def _tokenize(self, text: str) -> list[int]:
        if self.tokenizer is not None:
            return list(self.tokenizer(text))
        v = self.arch.vocab_size
        return [b % v for b in text.encode("utf-8")] or [0]

    # --------------------------------------------------------- schedule
    def _sigmas(self, steps: int) -> np.ndarray:
        """FlowMatchEulerDiscrete timesteps with static shift
        (reference pipeline property :181-194; shift=flow_shift)."""
        s = self.arch.flow_shift
        sig = np.linspace(1.0, 1.0 / steps, steps)
        sig = s * sig / (1.0 + (s - 1.0) * sig)
        return np.concatenate([sig, [0.0]]).astype(np.float32)

    # --------------------------------------------------------- generate
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
        arch = self.arch
        gscale = state["gscale"]
        sig = state["sigmas"]
        end = min(state["step"] + count, sp.num_inference_steps)
        latents = state["latents"]
        for i in range(state["step"], end):
            t = jnp.full(
                (2,), sig[i] * arch.num_train_timesteps, jnp.float32
            )
            lat_in = jnp.concatenate([latents] * 2, 0)
            if i == 0:
                pred, text_kv = self._first_fn(state["grid"])(
                    self.params["model"], state["ids"], lat_in, t,
                    state["cos"], state["sin"],
                )
                state["text_kv"] = text_kv
            else:
                pred = self._step_fn(state["grid"])(
                    self.params["model"], lat_in, t, state["text_kv"],
                    state["cos_q"], state["sin_q"],
                )
            cond, unc = pred[:1], pred[1:]
            pred = unc + gscale * (cond - unc)
            latents = latents + (sig[i + 1] - sig[i]) * pred
        state["latents"] = latents
        state["step"] = end
        if end >= sp.num_inference_steps:
            return self._decode(latents), state
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
        return self.generate_prompt(p, sp, stepwise_state)

    # ---------------------------------------------------------- prepare
    def _prepare(self, prompt, sp: DiffusionSamplingParams) -> dict:
        arch = self.arch
        h_px = sp.height or arch.image_base_size
        w_px = sp.width or arch.image_base_size
        down = arch.vae_downsample_factor
        grid = (max(h_px // down, 1), max(w_px // down, 1))
        n_img = grid[0] * grid[1]

        text = getattr(prompt, "text", None) or ""
        neg = getattr(prompt, "negative_text", None) or ""
        ids = self._tokenize(text)
        unc = self._tokenize(neg)
        s_text = max(len(ids), len(unc))
        s_text += -s_text % 8
        ids = ids + [0] * (s_text - len(ids))
        unc = unc + [0] * (s_text - len(unc))

        cos, sin = hy.build_rope_2d(arch, s_text, grid)
        mask, mask_q = hy.gen_image_masks(s_text, n_img)
        key = jax.random.PRNGKey(sp.seed if sp.seed is not None else 0)
        latents = jax.random.normal(
            key, (1, grid[0], grid[1], arch.latent_channels), jnp.float32
        )
        # reference forces guidance_scale > 1 (:1005-1008)
        gscale = max(float(sp.guidance_scale or 5.0), 1.0 + 1e-6)
        self._masks = getattr(self, "_masks", {})
        self._masks[grid] = (jnp.asarray(mask), jnp.asarray(mask_q))
        return {
            "latents": latents,
            "ids": jnp.asarray([ids, unc], jnp.int32),
            "cos": jnp.asarray(cos), "sin": jnp.asarray(sin),
            "cos_q": jnp.asarray(cos[s_text:]),
            "sin_q": jnp.asarray(sin[s_text:]),
            "grid": grid,
            "sigmas": self._sigmas(sp.num_inference_steps),
            "gscale": gscale,
            "step": 0,
        }

    # ---------------------------------------------------------- compiled
    def _first_fn(self, grid):
        fn = self._fns.get(("first", grid))
        if fn is None:
            cfg = self.arch
            mask = self._masks[grid][0]

            def run(params, ids, lat, t, cos, sin):
                return hy.denoise_first(cfg, params, ids, lat, t,
                                        cos, sin, mask)

            fn = jax.jit(run)
            self._fns[("first", grid)] = fn
        return fn

    def _step_fn(self, grid):
        fn = self._fns.get(("step", grid))
        if fn is None:
            cfg = self.arch
            mask_q = self._masks[grid][1]

            def run(params, lat, t, text_kv, cos_q, sin_q):
                return hy.denoise_step(cfg, params, lat, t, text_kv,
                                       cos_q, sin_q, mask_q)

            fn = jax.jit(run)
            self._fns[("step", grid)] = fn
        return fn

    def _decode(self, latents) -> np.ndarray:
        fn = self._fns.get("decode")
        if fn is None:
            cfg = self.vae_cfg
            scale, shift = self.scaling_factor, self.shift_factor

            def run(params, z):
                z = z / scale + shift
                img = vae.decode(cfg, params, z)
                return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)

            fn = jax.jit(run)
            self._fns["decode"] = fn
        return np.asarray(fn(self.params["vae"], latents)[0], np.float32)
