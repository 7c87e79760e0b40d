"""Z-Image text-to-image pipeline.

Mirrors the reference ZImagePipeline flow (reference
vllm_omni/diffusion/models/z_image/pipeline_z_image.py:545-640):

- text encoder (Qwen-family trunk, cap_feat_dim hidden) encodes prompt
  and negative prompt;
- the model is called at time (1000 - t)/1000, i.e. ``1 - sigma``, and
  its output is NEGATED before the flow-match Euler step (:560, :619);
- CFG: ``pos + g * (pos - neg)``, optionally norm-rescaled
  (cfg_normalization) and truncated after ``cfg_truncation`` of the
  schedule;
- latents decode through the shared causal VAE.

Step-wise execution carries (latents, scheduler state) in a state dict
between calls, like the other families.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.config import ModelArchConfig
from ht_vllm_omni_tpu.diffusion.data import DiffusionSamplingParams
from ht_vllm_omni_tpu.diffusion.models.qwen_image import vae
from ht_vllm_omni_tpu.diffusion.models.qwen_image.config import (
    QwenImageVAEConfig,
)
from ht_vllm_omni_tpu.diffusion.models.z_image import transformer
from ht_vllm_omni_tpu.diffusion.models.z_image.config import (
    SEQ_MULTI_OF,
    ZImageArchConfig,
)
from ht_vllm_omni_tpu.diffusion.schedulers.unipc import (
    FlowEulerScheduler,
    FlowUniPCScheduler,
    calculate_shift,
)
from ht_vllm_omni_tpu.models import qwen2


class ZImagePipeline:
    def __init__(
        self,
        arch: ZImageArchConfig | None = None,
        vae_cfg: QwenImageVAEConfig | None = None,
        text_cfg: ModelArchConfig | None = None,
        params: dict | None = None,
        seed: int = 0,
        scheduler: str = "euler",
        tokenizer=None,
        cfg_normalization: bool = False,
        cfg_truncation: float = 1.0,
        max_text_len: int = 512,
    ) -> None:
        self.arch = arch or ZImageArchConfig.tiny()
        zc = self.arch.in_channels
        self.vae_cfg = vae_cfg or QwenImageVAEConfig(
            base_dim=8, z_dim=zc, dim_mult=(1, 2), num_res_blocks=1,
            latents_mean=(0.0,) * zc, latents_std=(1.0,) * zc,
        )
        self.text_cfg = text_cfg or ModelArchConfig(
            hidden_size=self.arch.cap_feat_dim,
            num_hidden_layers=2,
            num_attention_heads=2,
            num_key_value_heads=2,
            intermediate_size=64,
            vocab_size=512,
        )
        if self.text_cfg.hidden_size != self.arch.cap_feat_dim:
            raise ValueError(
                "text encoder hidden_size must equal cap_feat_dim"
            )
        self.scheduler_kind = scheduler
        self.tokenizer = tokenizer
        self.cfg_normalization = cfg_normalization
        self.cfg_truncation = cfg_truncation
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
        pad = -n % 64
        ids_arr = jnp.asarray(ids + [0] * pad, jnp.int32)
        h = fn(self.params["text"], ids_arr, jnp.int32(n))
        return np.asarray(h[:n], np.float32)

    # ------------------------------------------------------------ denoise
    def _transformer_fn(self):
        fn = self._fns.get("transformer")
        if fn is None:
            fn = jax.jit(
                functools.partial(transformer.forward, self.arch),
                static_argnames=("img_shape",),
            )
            self._fns["transformer"] = fn
        return fn

    def _decode_prep(self):
        fn = self._fns.get("decode_prep")
        if fn is None:
            cfg = self.vae_cfg

            def run(lat):
                return vae.denormalize_latents(
                    cfg, lat.transpose(0, 2, 3, 1)
                )

            fn = jax.jit(run)
            self._fns["decode_prep"] = fn
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
        lat_h, lat_w = state["lat_hw"]
        do_cfg = state["do_cfg"]
        gscale = float(sp.guidance_scale or 1.0)
        n_steps = sp.num_inference_steps

        end = min(state["step"] + count, n_steps)
        latents = state["latents"]  # [1, S_img, p*p*C] patch tokens
        for step in range(state["step"], end):
            sigma = sched.timestep(step)
            t_model = 1.0 - sigma
            t_norm = step / max(n_steps, 1)
            g = gscale
            if do_cfg and self.cfg_truncation <= 1 and (
                t_norm > self.cfg_truncation
            ):
                g = 0.0
            nb = 2 if (do_cfg and g > 0) else 1
            t = jnp.full((nb,), t_model, jnp.float32)
            out = fn(
                self.params["transformer"],
                jnp.concatenate([latents] * nb, 0),
                state["cap"][:nb],
                state["cap_lens"][:nb],
                t,
                (lat_h, lat_w),
            )
            if nb == 2:
                pos, neg = (
                    out[:1].astype(jnp.float32),
                    out[1:].astype(jnp.float32),
                )
                pred = pos + g * (pos - neg)
                if self.cfg_normalization:
                    cn = jnp.linalg.norm(pos, axis=-1, keepdims=True)
                    nn_ = jnp.linalg.norm(pred, axis=-1, keepdims=True)
                    pred = pred * (cn / jnp.maximum(nn_, 1e-12))
            else:
                pred = out[:1].astype(jnp.float32)
            # the model predicts the negated flow velocity (:619)
            pred = -pred
            latents, state["sched_state"] = sched.step(
                state["sched_state"], pred, latents
            )
        state["latents"] = latents
        state["step"] = end
        if end >= n_steps:
            lat = transformer.unpatchify(self.arch, latents, lat_h, lat_w)
            z = self._decode_prep()(lat)
            img = vae.decode_pixels(
                self.vae_cfg, self.params["vae"], z, self._fns
            )[0]
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
    def _prepare(self, prompt, sp: DiffusionSamplingParams) -> dict:
        ratio = self.vae_cfg.spatial_ratio
        ps = self.arch.patch_size
        lat_h = max(ps * (sp.height // (ratio * ps)), ps)
        lat_w = max(ps * (sp.width // (ratio * ps)), ps)
        seq_len = (lat_h // ps) * (lat_w // ps)

        text = getattr(prompt, "text", None) or ""
        embeds = getattr(prompt, "embeds", None)
        if embeds is not None:
            pos = np.asarray(embeds, np.float32)
        else:
            pos = self.encode_text(text)
        do_cfg = sp.guidance_scale is not None and sp.guidance_scale > 0.0
        branches = [pos]
        if do_cfg:
            neg_text = getattr(prompt, "negative_text", None) or ""
            branches.append(self.encode_text(neg_text or " "))

        s_cap = max(b.shape[0] for b in branches)
        s_cap = s_cap + (-s_cap % SEQ_MULTI_OF)
        cap = np.zeros(
            (len(branches), s_cap, self.arch.cap_feat_dim), np.float32
        )
        lens = np.zeros((len(branches),), np.int32)
        for i, b_ in enumerate(branches):
            cap[i, : b_.shape[0]] = b_
            lens[i] = b_.shape[0]

        key = jax.random.PRNGKey(sp.seed if sp.seed is not None else 0)
        noise = jax.random.normal(
            key, (1, self.arch.in_channels, lat_h, lat_w), jnp.float32
        )
        mu = calculate_shift(seq_len)
        if self.scheduler_kind == "unipc":
            sched = FlowUniPCScheduler(sp.num_inference_steps, mu=mu)
        else:
            sched = FlowEulerScheduler(sp.num_inference_steps, mu=mu)
        return {
            "latents": transformer.patchify(self.arch, noise),
            "cap": jnp.asarray(cap),
            "cap_lens": jnp.asarray(lens),
            "lat_hw": (lat_h, lat_w),
            "sched": sched,
            "sched_state": sched.init_state(),
            "do_cfg": do_cfg,
            "step": 0,
        }
