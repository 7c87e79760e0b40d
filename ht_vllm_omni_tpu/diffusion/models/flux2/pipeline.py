"""Flux2 / Flux2-Klein pipelines.

Mirrors the reference Flux2Pipeline / Flux2KleinPipeline (reference
vllm_omni/diffusion/models/flux2/pipeline_flux2.py,
flux2_klein/pipeline_flux2_klein.py):

- text features are INTERMEDIATE trunk layers stacked channel-wise
  (Mistral-3 layers 10/20/30 for Flux2, Qwen3 9/18/27 for Klein) —
  here the bundled text trunk exposes per-layer hiddens and
  ``out_layers`` picks the stack;
- latents are unpacked-channel tokens (B, H/2 * W/2, C*4) with 4-axis
  ids (0, h, w, 0); the flow-match shift uses the empirical mu fit
  (:243-259);
- base Flux2 runs guidance-free (the released model is
  guidance-distilled; guidance rides the embedding when provided);
  Klein supports true CFG over negative prompts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.config import ModelArchConfig
from ht_vllm_omni_tpu.diffusion.data import DiffusionSamplingParams
from ht_vllm_omni_tpu.diffusion.models.flux2 import transformer
from ht_vllm_omni_tpu.diffusion.models.flux2.config import Flux2ArchConfig
from ht_vllm_omni_tpu.diffusion.models.qwen_image import vae
from ht_vllm_omni_tpu.diffusion.models.qwen_image.config import (
    QwenImageVAEConfig,
)
from ht_vllm_omni_tpu.diffusion.schedulers.unipc import (
    FlowEulerScheduler,
    FlowUniPCScheduler,
)
from ht_vllm_omni_tpu.models import qwen2


def compute_empirical_mu(image_seq_len: int, num_steps: int) -> float:
    """Flux2's fitted resolution/steps -> shift curve
    (pipeline_flux2.py:243)."""
    a1, b1 = 8.73809524e-05, 1.89833333
    a2, b2 = 0.00016927, 0.45666666
    if image_seq_len > 4300:
        return float(a2 * image_seq_len + b2)
    m_200 = a2 * image_seq_len + b2
    m_10 = a1 * image_seq_len + b1
    a = (m_200 - m_10) / 190.0
    b = m_200 - 200.0 * a
    return float(a * num_steps + b)


class Flux2Pipeline:
    supports_cfg = False  # base model is guidance-distilled

    def __init__(
        self,
        arch: Flux2ArchConfig | None = None,
        vae_cfg: QwenImageVAEConfig | None = None,
        text_cfg: ModelArchConfig | None = None,
        params: dict | None = None,
        seed: int = 0,
        scheduler: str = "euler",
        tokenizer=None,
        out_layers: tuple[int, ...] | None = None,
        max_text_len: int = 512,
    ) -> None:
        self.arch = arch or Flux2ArchConfig.tiny()
        zc = self.arch.in_channels // 4
        self.vae_cfg = vae_cfg or QwenImageVAEConfig(
            base_dim=8, z_dim=zc, dim_mult=(1, 2), num_res_blocks=1,
            latents_mean=(0.0,) * zc, latents_std=(1.0,) * zc,
        )
        n_stack = 3
        self.out_layers = out_layers
        self.text_cfg = text_cfg or ModelArchConfig(
            hidden_size=self.arch.joint_attention_dim // n_stack,
            num_hidden_layers=3,
            num_attention_heads=2,
            num_key_value_heads=2,
            intermediate_size=64,
            vocab_size=512,
        )
        if self.out_layers is None:
            # spread over the trunk like the reference's 10/20/30
            nl = self.text_cfg.num_hidden_layers
            self.out_layers = tuple(
                max(1, (i + 1) * nl // n_stack) - 1 for i in range(n_stack)
            )
        stack_dim = self.text_cfg.hidden_size * len(self.out_layers)
        if stack_dim != self.arch.joint_attention_dim:
            raise ValueError(
                "len(out_layers) * text hidden_size must equal "
                "joint_attention_dim"
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
        """Prompt -> [S, n_layers * hidden] stacked intermediate-layer
        features (pipeline_flux2.py:431-445)."""
        ids = self._tokenize(text)[: self.max_text_len]
        fn = self._fns.get("text_encode")
        if fn is None:
            cfg = self.text_cfg

            def run(params, token_ids, length):
                emb = qwen2.embed_tokens(params, token_ids)
                pos = jnp.arange(token_ids.shape[0], dtype=jnp.int32)
                _, layer_h = qwen2.prefill(
                    cfg, params, emb, pos, length,
                    collect_layer_hiddens=True,
                )
                picked = jnp.stack(
                    [layer_h[i] for i in self.out_layers], axis=0
                )  # [n_stack, S, H]
                return jnp.transpose(picked, (1, 0, 2)).reshape(
                    token_ids.shape[0], -1
                )

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
        lat_h, lat_w = state["lat_hw"]
        gscale = float(sp.guidance_scale or 1.0)
        do_cfg = state["do_cfg"]
        nb = state["txt"].shape[0]

        end = min(state["step"] + count, sp.num_inference_steps)
        latents = state["latents"]
        for step in range(state["step"], end):
            sigma = sched.timestep(step)
            t = jnp.full((nb,), sigma, jnp.float32)
            g = (
                jnp.full((nb,), gscale, jnp.float32)
                if self.arch.guidance_embeds
                else None
            )
            v = fn(
                self.params["transformer"],
                jnp.concatenate([latents] * nb, 0),
                state["txt"],
                t,
                g,
                state["img_rope"],
                state["txt_rope"],
            )
            if do_cfg:
                pos, neg = (
                    v[:1].astype(jnp.float32), v[1:].astype(jnp.float32),
                )
                pred = neg + gscale * (pos - neg)
            else:
                pred = v[:1]
            latents, state["sched_state"] = sched.step(
                state["sched_state"], pred, latents
            )
        state["latents"] = latents
        state["step"] = end
        if end >= sp.num_inference_steps:
            img = self._decode(latents, lat_h, lat_w)
            return img, state
        return None, state

    def _decode(self, latents, lat_h, lat_w) -> np.ndarray:
        fn = self._fns.get("decode")
        if fn is None:
            cfg = self.vae_cfg
            c4 = self.arch.in_channels

            def run(params, tokens):
                # tokens [1, (H/2)(W/2), C*4] -> NCHW latent [1, C, H, W]
                x = tokens.reshape(1, lat_h // 2, lat_w // 2, c4)
                c = c4 // 4
                x = x.reshape(1, lat_h // 2, lat_w // 2, c, 2, 2)
                x = x.transpose(0, 3, 1, 4, 2, 5).reshape(
                    1, c, lat_h, lat_w
                )
                lat = vae.denormalize_latents(cfg, x.transpose(0, 2, 3, 1))
                img = vae.decode(cfg, params, lat)
                return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)

            fn = jax.jit(run)
            self._fns["decode"] = fn
        img = fn(self.params["vae"], latents)[0]
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
        do_cfg = (
            self.supports_cfg
            and sp.guidance_scale is not None
            and sp.guidance_scale > 1.0
        )
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
            key, (1, seq_len, self.arch.in_channels), jnp.float32
        )
        # ids: image (0, h, w, 0); text (0, 0, 0, seq)
        ht, wt = lat_h // 2, lat_w // 2
        img_ids = np.zeros((seq_len, 4), np.int64)
        gh, gw = np.meshgrid(np.arange(ht), np.arange(wt), indexing="ij")
        img_ids[:, 1] = gh.reshape(-1)
        img_ids[:, 2] = gw.reshape(-1)
        txt_ids = np.zeros((s_txt, 4), np.int64)
        txt_ids[:, 3] = np.arange(s_txt)

        mu = compute_empirical_mu(seq_len, sp.num_inference_steps)
        if self.scheduler_kind == "unipc":
            sched = FlowUniPCScheduler(sp.num_inference_steps, mu=mu)
        else:
            sched = FlowEulerScheduler(sp.num_inference_steps, mu=mu)
        return {
            "latents": noise,
            "txt": jnp.asarray(txt),
            "img_rope": transformer.rope_tables(self.arch, img_ids),
            "txt_rope": transformer.rope_tables(self.arch, txt_ids),
            "lat_hw": (lat_h, lat_w),
            "sched": sched,
            "sched_state": sched.init_state(),
            "do_cfg": do_cfg,
            "step": 0,
        }


class Flux2KleinPipeline(Flux2Pipeline):
    """Klein: Qwen3-family text trunk (layers 9/18/27 stacked) and true
    CFG over negative prompts (pipeline_flux2_klein.py:183)."""

    supports_cfg = True
