"""MammothModa2 DiT pipeline: AR-conditioned text/image-to-image.

Mirrors the reference MammothModa2DiTPipeline (reference vllm_omni/
diffusion/models/mammoth_moda2/pipeline_mammothmoda2_dit.py):

- conditions arrive from the AR stage as hidden-state matrices
  (additional_information["text_prompt_embeds" / "image_prompt_embeds"],
  stage_input_processors/mammoth_moda2.py) — text prompt hiddens and
  generated visual-token hiddens;
- the image condition passes through the SimpleQFormer (:181-189), both
  project through the caption embedder and join the denoised tokens;
- flow-match Euler with dynamic time shift m = sqrt(num_tokens)/40
  (schedulers.py:80-88); CFG against an EMPTY condition, gated to the
  ``cfg_range`` fraction of steps (:266);
- latents decode through the shared KL VAE.

Standalone use (no AR stage) falls back to byte-tokenized text through
a bundled trunk so the family also serves plain t2i requests.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.config import ModelArchConfig
from ht_vllm_omni_tpu.diffusion.data import DiffusionSamplingParams
from ht_vllm_omni_tpu.diffusion.models.mammoth_moda2 import transformer
from ht_vllm_omni_tpu.diffusion.models.mammoth_moda2.config import (
    MammothDiTArchConfig,
)
from ht_vllm_omni_tpu.diffusion.models.qwen_image import vae
from ht_vllm_omni_tpu.diffusion.models.qwen_image.config import (
    QwenImageVAEConfig,
)
from ht_vllm_omni_tpu.models import qwen2

VAE_SCALE = 16  # px per latent token pair (reference :240)


class MammothModa2DiTPipeline:
    def __init__(
        self,
        arch: MammothDiTArchConfig | None = None,
        vae_cfg: QwenImageVAEConfig | None = None,
        text_cfg: ModelArchConfig | None = None,
        params: dict | None = None,
        seed: int = 0,
        tokenizer=None,
        cfg_range: tuple[float, float] = (0.0, 1.0),
        scaling_factor: float = 1.0,
        shift_factor: float = 0.0,
    ) -> None:
        self.arch = arch or MammothDiTArchConfig.tiny()
        self.vae_cfg = vae_cfg or QwenImageVAEConfig.tiny()
        if self.vae_cfg.z_dim != self.arch.in_channels:
            raise ValueError("vae z_dim must match DiT in_channels")
        self.text_cfg = text_cfg or ModelArchConfig(
            hidden_size=self.arch.text_feat_dim,
            num_hidden_layers=2, num_attention_heads=2,
            num_key_value_heads=2, intermediate_size=32, vocab_size=256,
            dtype="float32",
        )
        self.tokenizer = tokenizer
        self.cfg_range = cfg_range
        self.scaling_factor = scaling_factor
        self.shift_factor = shift_factor
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

    # ------------------------------------------------------- conditions
    def _fallback_text_condition(self, text: str) -> np.ndarray:
        ids = [
            b % self.text_cfg.vocab_size for b in text.encode("utf-8")
        ] or [0]
        n = len(ids)
        pad = -n % 8
        arr = jnp.asarray(ids + [0] * pad, jnp.int32)
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
        h = fn(self.params["text"], arr, jnp.int32(n))
        return np.asarray(h[:n], np.float32)

    def _project_conditions(
        self, text_cond: np.ndarray, image_cond: np.ndarray
    ) -> jax.Array:
        """Caption-embed the text hiddens, QFormer the image hiddens,
        concatenate (reference :160-192)."""
        key = ("cond", text_cond.shape, image_cond.shape)
        fn = self._fns.get(key)
        if fn is None:
            cfg = self.arch

            def run(p, tc, ic):
                tp = p["transformer"]
                cap = (
                    transformer._rms(tc, tp["cap_norm"], cfg.norm_eps)
                    @ tp["cap_w"] + tp["cap_b"]
                )
                if ic.shape[0] > 0:
                    icp = (
                        transformer._rms(
                            ic, tp["cap_norm"], cfg.norm_eps
                        ) @ tp["cap_w"] + tp["cap_b"]
                    )
                    icp = transformer.qformer(cfg, tp["qformer"], icp)
                    cap = jnp.concatenate([cap, icp], 0)
                return cap

            fn = jax.jit(run)
            self._fns[key] = fn
        return fn(
            self.params, jnp.asarray(text_cond, jnp.float32),
            jnp.asarray(image_cond, jnp.float32),
        )

    # ----------------------------------------------------------- denoise
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
        total = sp.num_inference_steps
        ts = state["timesteps"]
        gscale = float(sp.guidance_scale or 1.0)
        lo, hi = self.cfg_range
        end = min(state["step"] + count, total)
        latents = state["latents"]
        for i in range(state["step"], end):
            t = jnp.float32(ts[i])
            v = self._fwd(state["n_text"])(
                self.params["transformer"], latents, t, state["cond"],
                state["cos"], state["sin"],
            ).astype(jnp.float32)
            g = gscale if lo <= i / total <= hi else 1.0
            if g > 1.0:
                vu = self._fwd(0)(
                    self.params["transformer"], latents, t,
                    state["cond"][:0], state["cos"][state["n_text"]:],
                    state["sin"][state["n_text"]:],
                ).astype(jnp.float32)
                v = vu + g * (v - vu)
            latents = latents + (ts[i + 1] - ts[i]) * v
        state["latents"] = latents
        state["step"] = end
        if end >= total:
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
        p.negative_text = None
        return self.generate_prompt(p, sp, stepwise_state)

    # ------------------------------------------------------------ prepare
    def _prepare(self, prompt, sp: DiffusionSamplingParams) -> dict:
        info = getattr(prompt, "additional_information", None) or {}
        text_cond = info.get("text_prompt_embeds")
        image_cond = info.get("image_prompt_embeds")
        if text_cond is None:
            text_cond = self._fallback_text_condition(
                getattr(prompt, "text", None) or ""
            )
        text_cond = np.asarray(text_cond, np.float32)
        image_cond = (
            np.asarray(image_cond, np.float32)
            if image_cond is not None
            else np.zeros((0, self.arch.text_feat_dim), np.float32)
        )
        cond = self._project_conditions(text_cond, image_cond)
        n_text = cond.shape[0]

        h_px = sp.height or 256
        w_px = sp.width or 256
        # latent grid: 2*px/16 per side (reference :239-241), i.e. the
        # VAE's 8x spatial compression
        hl = max(2 * h_px // VAE_SCALE, self.arch.patch_size)
        wl = max(2 * w_px // VAE_SCALE, self.arch.patch_size)
        hl -= hl % self.arch.patch_size
        wl -= wl % self.arch.patch_size
        grid = (hl // self.arch.patch_size, wl // self.arch.patch_size)
        cos, sin = transformer.rope_tables(self.arch, n_text, grid)

        key = jax.random.PRNGKey(sp.seed if sp.seed is not None else 0)
        latents = jax.random.normal(
            key, (hl, wl, self.arch.in_channels), jnp.float32
        )
        # dynamic time shift (schedulers.py:80-88)
        ts = np.linspace(0.0, 1.0, sp.num_inference_steps + 1,
                         dtype=np.float64)[:-1]
        m = math.sqrt(hl * wl) / 40.0
        ts = ts / (m - m * ts + ts)
        ts = np.concatenate([ts, [1.0]]).astype(np.float32)
        return {
            "latents": latents,
            "cond": cond,
            "cos": jnp.asarray(cos), "sin": jnp.asarray(sin),
            "n_text": n_text,
            "timesteps": ts,
            "step": 0,
        }

    def _fwd(self, n_text: int):
        fn = self._fns.get(("fwd", n_text))
        if fn is None:
            cfg = self.arch
            fn = jax.jit(
                lambda p, lat, t, cond, cos, sin: transformer.forward(
                    cfg, p, lat, t, cond, cos, sin
                )
            )
            self._fns[("fwd", n_text)] = fn
        return fn

    def _decode(self, latents) -> np.ndarray:
        fn = self._fns.get("decode")
        if fn is None:
            cfg = self.vae_cfg
            scale, shift = self.scaling_factor, self.shift_factor

            def run(params, z):
                z = z / scale + shift
                img = vae.decode(cfg, params, z[None])
                return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)

            fn = jax.jit(run)
            self._fns["decode"] = fn
        return np.asarray(fn(self.params["vae"], latents)[0], np.float32)
