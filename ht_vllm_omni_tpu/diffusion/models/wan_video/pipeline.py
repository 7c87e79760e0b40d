"""Wan2.2 text/image-to-video pipeline.

Mirrors the reference Wan2.2 pipeline flow (reference
vllm_omni/diffusion/models/wan2_2/pipeline_wan2_2.py and
pipeline_wan2_2_ti2v.py): text encoding, flow-matching UniPC denoising
with the dual-expert noise schedule — a high-noise transformer for
sigma >= boundary_ratio and a low-noise transformer below it
(pipeline_wan2_2.py:574-577), each with its own guidance scale — true
CFG, and causal-3D VAE decode to frames.

I2V uses the TI2V first-frame conditioning mode (pipeline_wan2_2.py:
600-614): the first latent frame is the VAE-encoded image, re-imposed
every step via the frame mask, with per-token timesteps (conditioned
tokens run at t=0).

The text encoder is the repo's qwen2 trunk standing in for UMT5 (same
contract as the Qwen-Image pipeline's encoder substitution); stepwise
state keeps the engine's streaming/preemption contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.config import ModelArchConfig
from ht_vllm_omni_tpu.diffusion.data import DiffusionSamplingParams
from ht_vllm_omni_tpu.diffusion.models.wan_video import transformer, vae3d
from ht_vllm_omni_tpu.diffusion.models.wan_video.config import (
    WanVideoArchConfig,
    WanVideoVAEConfig,
)
from ht_vllm_omni_tpu.diffusion.schedulers.unipc import (
    FlowUniPCScheduler,
)
from ht_vllm_omni_tpu.models import qwen2


class WanVideoPipeline:
    def __init__(
        self,
        arch: WanVideoArchConfig | None = None,
        vae_cfg: WanVideoVAEConfig | None = None,
        text_cfg: ModelArchConfig | None = None,
        params: dict | None = None,
        seed: int = 0,
        boundary_ratio: float | None = 0.875,
        tokenizer=None,
        parallel=None,  # diffusion.parallel.DiffusionParallelContext
    ) -> None:
        self.arch = arch or WanVideoArchConfig.tiny()
        self.vae_cfg = vae_cfg or WanVideoVAEConfig.tiny()
        self.text_cfg = text_cfg or ModelArchConfig(
            hidden_size=self.arch.text_dim,
            num_hidden_layers=2,
            num_attention_heads=2,
            num_key_value_heads=2,
            intermediate_size=128,
            vocab_size=512,
        )
        if self.text_cfg.hidden_size != self.arch.text_dim:
            raise ValueError("text encoder width must equal text_dim")
        self.boundary_ratio = boundary_ratio
        self.tokenizer = tokenizer
        key = jax.random.PRNGKey(seed)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        params = params or {}
        self.params = {
            # high-noise expert ("transformer") + low-noise expert
            # ("transformer_2"); single-expert checkpoints pass the same
            # tree for both (boundary_ratio=None uses only "transformer")
            "transformer": params.get("transformer")
            if params.get("transformer") is not None
            else transformer.init_params(self.arch, k1),
            "transformer_2": params.get("transformer_2")
            if params.get("transformer_2") is not None
            else transformer.init_params(self.arch, k2),
            "vae": params.get("vae")
            if params.get("vae") is not None
            else vae3d.init_params(self.vae_cfg, k3),
            "text": params.get("text")
            if params.get("text") is not None
            else qwen2.init_params(self.text_cfg, k4),
        }
        self._fns: dict = {}
        # served parallel execution: both noise-expert DiTs live sharded
        # over the mesh (HSDP/TP, transformer.shard_params) and every
        # denoise step runs inside jit(shard_map(...))
        self.parallel = parallel
        if parallel is not None:
            if self.arch.num_attention_heads % parallel.tp_size:
                raise ValueError(
                    f"attention heads {self.arch.num_attention_heads} "
                    f"not divisible by tp={parallel.tp_size}"
                )
            for key_ in ("transformer", "transformer_2"):
                self.params[key_] = transformer.shard_params(
                    self.arch, self.params[key_], parallel
                )

    # --------------------------------------------------------------- text
    def _tokenize(self, text: str) -> list[int]:
        if self.tokenizer is not None:
            return list(self.tokenizer(text))
        v = self.text_cfg.vocab_size
        return [b % v for b in text.encode("utf-8")] or [0]

    def encode_text(self, text: str) -> np.ndarray:
        ids = self._tokenize(text)
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

    def _transformer_fn(self):
        fn = self._fns.get("transformer")
        if fn is None:
            fn = jax.jit(functools.partial(transformer.forward, self.arch))
            self._fns["transformer"] = fn
        return fn

    def _parallel_transformer_fn(self):
        """One guided DiT forward in-mesh: CFG branches over cfg, patch
        tokens over sp (Ulysses inside transformer.forward), weights
        over tp/fsdp; returns the guided velocity, cfg-replicated."""
        fn = self._fns.get("ptransformer")
        if fn is None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from ht_vllm_omni_tpu.diffusion.distributed.cfg_parallel import (
                cfg_combine,
            )

            ctx = self.parallel
            info = ctx.info
            arch = self.arch
            pspecs = None  # built per-params below
            cfg_ax = info.cfg_axis

            def run(tparams, lat, t, txt, txt_lens, gscale):
                # lat: [1, C, F, H, W] replicated; t/txt/txt_lens carry
                # the branch batch, sharded over cfg
                b_loc = txt.shape[0]
                v = transformer.forward(
                    arch, tparams, jnp.concatenate([lat] * b_loc, 0),
                    t, txt, txt_lens, parallel=info,
                )
                if cfg_ax is not None:
                    v = cfg_combine(v, gscale, axis=cfg_ax)
                elif b_loc == 2:
                    v = v[1:2] + gscale * (v[:1] - v[1:2])
                return v[:1]

            pspecs = transformer.param_pspecs(
                info, self.params["transformer"]
            )
            t_spec = P(cfg_ax)  # per-sample [B] or per-token [B, S]
            fn = jax.jit(
                shard_map(
                    run,
                    mesh=ctx.mesh,
                    in_specs=(
                        pspecs, P(), t_spec, P(cfg_ax), P(cfg_ax), P(),
                    ),
                    out_specs=P(),
                    check_vma=False,
                )
            )
            self._fns["ptransformer"] = fn
        return fn

    # ----------------------------------------------------------- full run
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
        sched: FlowUniPCScheduler = state["sched"]
        fn = self._transformer_fn()
        do_cfg = state["do_cfg"]
        gscale = float(sp.guidance_scale or 1.0)
        info = getattr(prompt, "additional_information", None) or {}
        gscale2 = float(info.get("guidance_scale_2", gscale))
        mask = state["frame_mask"]  # [1, 1, F_lat, 1, 1] or None
        cond = state["latent_cond"]

        end = min(state["step"] + count, sp.num_inference_steps)
        latents = state["latents"]
        nb = state["txt"].shape[0]
        pfn = (
            self._parallel_transformer_fn()
            if self.parallel is not None
            else None
        )
        for step in range(state["step"], end):
            sigma = sched.timestep(step)
            high_noise = (
                self.boundary_ratio is None or sigma >= self.boundary_ratio
            )
            tparams = self.params[
                "transformer" if high_noise else "transformer_2"
            ]
            scale = gscale if high_noise else gscale2
            if mask is not None:
                # model sees the conditioned blend; the scheduler steps
                # the raw latents (reference pipeline_wan2_2.py:600,650)
                model_in = (1 - mask) * cond + mask * latents
                tok_mask = state["token_mask"]  # [S] patch-grid mask
                t = jnp.broadcast_to(
                    tok_mask[None, :] * (sigma * 1000.0), (nb,
                                                           tok_mask.shape[0])
                )
            else:
                model_in = latents
                t = jnp.full((nb,), sigma * 1000.0, jnp.float32)
            if pfn is not None:
                pred = pfn(
                    tparams, model_in, t, state["txt"],
                    state["txt_lens"],
                    jnp.float32(scale if do_cfg else 1.0),
                )
            else:
                v = fn(
                    tparams,
                    jnp.concatenate([model_in] * nb, 0),
                    t,
                    state["txt"],
                    state["txt_lens"],
                )
                if do_cfg:
                    pos, neg = v[:1], v[1:2]
                    pred = neg + scale * (pos - neg)
                else:
                    pred = v[:1]
            latents, state["sched_state"] = sched.step(
                state["sched_state"], pred, latents
            )
        state["latents"] = latents
        state["step"] = end
        if end >= sp.num_inference_steps:
            if mask is not None:
                latents = (1 - mask) * cond + mask * latents
            video = self._decode(latents)
            return video, state
        return None, state

    def _decode(self, latents: jax.Array) -> np.ndarray:
        fn = self._fns.get("decode")
        if fn is None:
            cfg = self.vae_cfg

            def run(params, z):
                z = vae3d.denormalize_latents(
                    cfg, z.transpose(0, 2, 3, 4, 1)
                )  # [B, F, H, W, C]
                img = vae3d.decode(cfg, params, z)
                return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)

            fn = jax.jit(run)
            self._fns["decode"] = fn
        vid = fn(self.params["vae"], latents)[0]  # [F, H, W, 3]
        return np.asarray(vid * 255.0, np.float32).astype(np.uint8)

    # ------------------------------------------------------------ prepare
    def _prepare(self, prompt, sp: DiffusionSamplingParams) -> dict:
        info = getattr(prompt, "additional_information", None) or {}
        num_frames = int(info.get("num_frames", 8))
        ratio = self.vae_cfg.spatial_ratio
        t_ratio = self.vae_cfg.temporal_ratio
        pt, ph, pw = self.arch.patch_size
        lat_h = max((sp.height // ratio) // ph * ph, ph)
        lat_w = max((sp.width // ratio) // pw * pw, pw)
        lat_f = max(-(-num_frames // t_ratio) // pt * pt, pt)

        text = getattr(prompt, "text", None) or ""
        pos = self.encode_text(text)
        do_cfg = sp.guidance_scale is not None and sp.guidance_scale > 1.0
        branches = [pos]
        if do_cfg:
            neg_text = getattr(prompt, "negative_text", None) or " "
            branches.append(self.encode_text(neg_text))
        if self.parallel is not None:
            if self.parallel.cfg_size == 2 and len(branches) == 1:
                branches.append(pos)  # g=1 combine is the identity
            seq = (lat_f // pt) * (lat_h // ph) * (lat_w // pw)
            if seq % self.parallel.sp_size:
                raise ValueError(
                    f"patch token count {seq} not divisible by "
                    f"ulysses_size={self.parallel.sp_size}"
                )
        s_txt = max(b.shape[0] for b in branches)
        s_txt = s_txt + (-s_txt % 8)
        txt = np.zeros(
            (len(branches), s_txt, self.arch.text_dim), np.float32
        )
        lens = np.zeros((len(branches),), np.int32)
        for i, b_ in enumerate(branches):
            txt[i, : b_.shape[0]] = b_
            lens[i] = b_.shape[0]

        key = jax.random.PRNGKey(sp.seed if sp.seed is not None else 0)
        latents = jax.random.normal(
            key, (1, self.vae_cfg.z_dim, lat_f, lat_h, lat_w), jnp.float32
        )
        sched = FlowUniPCScheduler(sp.num_inference_steps)

        # I2V: first-frame conditioning (TI2V expand-timesteps mode)
        frame_mask = None
        latent_cond = jnp.zeros_like(latents)
        token_mask = None
        init_image = self._init_image(prompt)
        if init_image is not None:
            z0 = self._encode_first_frame(init_image, lat_h, lat_w)
            latent_cond = jnp.tile(z0, (1, 1, lat_f, 1, 1))
            fm = jnp.ones((1, 1, lat_f, 1, 1), jnp.float32)
            frame_mask = fm.at[:, :, 0].set(0.0)
            # patch-grid token mask: frame-0 patch tokens run at t=0
            pf = lat_f // pt
            tok = jnp.ones((pf, lat_h // ph, lat_w // pw), jnp.float32)
            tok = tok.at[0].set(0.0)
            token_mask = tok.reshape(-1)

        return {
            "latents": latents,
            "txt": jnp.asarray(txt),
            "txt_lens": jnp.asarray(lens),
            "sched": sched,
            "sched_state": sched.init_state(),
            "do_cfg": do_cfg,
            "step": 0,
            "frame_mask": frame_mask,
            "latent_cond": latent_cond,
            "token_mask": token_mask,
        }

    @staticmethod
    def _init_image(prompt) -> np.ndarray | None:
        mm = getattr(prompt, "multi_modal_data", None) or {}
        img = mm.get("image")
        if img is None:
            info = getattr(prompt, "additional_information", None) or {}
            img = info.get("init_image")
        if img is None:
            return None
        if isinstance(img, (list, tuple)):
            img = img[0]
        return np.asarray(img)

    def _encode_first_frame(
        self, image: np.ndarray, lat_h: int, lat_w: int
    ) -> jax.Array:
        """[H, W, 3] image -> normalized latents [1, Cz, 1, lat_h, lat_w]."""
        img = np.asarray(image, np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        ratio = self.vae_cfg.spatial_ratio
        h, w = lat_h * ratio, lat_w * ratio
        if img.shape[:2] != (h, w):
            ri = (np.arange(h) * img.shape[0] // h).clip(0, img.shape[0] - 1)
            ci = (np.arange(w) * img.shape[1] // w).clip(0, img.shape[1] - 1)
            img = img[ri][:, ci]
        img = img * 2.0 - 1.0
        fn = self._fns.get("encode_frame")
        if fn is None:
            cfg = self.vae_cfg

            def run(params, x):
                z = vae3d.encode(cfg, params, x)  # [1, 1, h, w, Cz]
                return vae3d.normalize_latents(cfg, z)

            fn = jax.jit(run)
            self._fns["encode_frame"] = fn
        z = fn(self.params["vae"], jnp.asarray(img)[None, None])
        z = jnp.transpose(z, (0, 4, 1, 2, 3))  # [1, Cz, 1, h, w]
        return z[:, :, :, :lat_h, :lat_w]
