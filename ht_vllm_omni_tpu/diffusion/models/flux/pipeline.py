"""Flux text-to-image pipeline.

Mirrors the reference FluxPipeline flow (reference
vllm_omni/diffusion/models/flux/pipeline_flux.py): T5-role text
embeddings + CLIP-role pooled vector condition the transformer, latents
are 2x2-packed tokens, denoising runs under a resolution-shifted
flow-matching scheduler.  Guidance-distilled checkpoints
(guidance_embeds=True) take the guidance scale as a MODEL INPUT and run
one branch; non-distilled configs fall back to true CFG.

Text-encoder substitution: the repo's qwen2 trunk stands in for T5-xxl,
and the pooled vector is the masked mean of its hidden states projected
to pooled_projection_dim (same substitution contract as the Qwen-Image
pipeline).  The VAE reuses the Qwen-Image causal-3D module's image
specialization (a 2D KL autoencoder at heart, like Flux's).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.config import ModelArchConfig
from ht_vllm_omni_tpu.diffusion.data import DiffusionSamplingParams
from ht_vllm_omni_tpu.diffusion.models.flux import transformer
from ht_vllm_omni_tpu.diffusion.models.flux.config import FluxArchConfig
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


class FluxPipeline:
    def __init__(
        self,
        arch: FluxArchConfig | None = None,
        vae_cfg: QwenImageVAEConfig | None = None,
        text_cfg: ModelArchConfig | None = None,
        params: dict | None = None,
        seed: int = 0,
        scheduler: str = "euler",  # "euler" | "unipc"
        tokenizer=None,
        parallel=None,  # diffusion.parallel.DiffusionParallelContext
    ) -> None:
        self.arch = arch or FluxArchConfig.tiny()
        self.vae_cfg = vae_cfg or QwenImageVAEConfig.tiny()
        self.text_cfg = text_cfg or ModelArchConfig(
            hidden_size=self.arch.joint_attention_dim,
            num_hidden_layers=2,
            num_attention_heads=2,
            num_key_value_heads=2,
            intermediate_size=128,
            vocab_size=512,
        )
        self.scheduler_kind = scheduler
        self.tokenizer = tokenizer
        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        params = params or {}
        self.params = {
            "transformer": params.get("transformer")
            if params.get("transformer") is not None
            else transformer.init_params(self.arch, k1),
            "vae": params.get("vae")
            if params.get("vae") is not None
            else vae.init_params(self.vae_cfg, k2),
            "text": params.get("text")
            if params.get("text") is not None
            else qwen2.init_params(self.text_cfg, k3),
        }
        self._fns: dict = {}
        # served parallel execution (diffusion/parallel.py): DiT weights
        # live sharded on the mesh; every denoise step runs inside one
        # jit(shard_map(...)) over cfg x sp x tp
        self.parallel = parallel
        if parallel is not None:
            if self.arch.num_attention_heads % parallel.tp_size:
                raise ValueError(
                    f"attention heads {self.arch.num_attention_heads} "
                    f"not divisible by tp={parallel.tp_size}"
                )
            self.params["transformer"] = transformer.shard_params(
                self.arch, self.params["transformer"], parallel
            )

    # --------------------------------------------------------------- text
    def _tokenize(self, text: str) -> list[int]:
        if self.tokenizer is not None:
            return list(self.tokenizer(text))
        v = self.text_cfg.vocab_size
        return [b % v for b in text.encode("utf-8")] or [0]

    def encode_text(self, text: str) -> tuple[np.ndarray, np.ndarray]:
        """-> (embeds [S, joint_dim], pooled [pooled_dim])."""
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
        h = np.asarray(
            fn(self.params["text"], ids_arr, jnp.int32(n)), np.float32
        )[:n]
        pooled_full = h.mean(axis=0)
        pd = self.arch.pooled_projection_dim
        pooled = np.zeros((pd,), np.float32)
        m = min(pd, pooled_full.shape[0])
        pooled[:m] = pooled_full[:m]
        return h, pooled

    def _parallel_step_fn(self, img_shape):
        """One guided denoise velocity under the diffusion mesh (same
        design as the qwen-image pipeline): CFG branches shard over cfg,
        image tokens over sp (Ulysses joint attention inside
        transformer.forward), weights over tp/fsdp; the combine happens
        in-mesh so the returned prediction is already guided."""
        key = ("pstep", img_shape)
        fn = self._fns.get(key)
        if fn is None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from ht_vllm_omni_tpu.diffusion.distributed.cfg_parallel import (
                cfg_combine,
            )

            ctx = self.parallel
            info = ctx.info
            arch = self.arch
            pspecs = transformer.param_pspecs(
                info, self.params["transformer"]
            )
            sp_ax, cfg_ax = info.sp_axis, info.cfg_axis

            def run(params, lat, txt, txt_lens, pooled, t, g, gscale):
                b_loc = txt.shape[0]
                v = transformer.forward(
                    arch, params,
                    jnp.concatenate([lat] * b_loc, axis=0),
                    txt, txt_lens, pooled, t,
                    g if arch.guidance_embeds else None,
                    img_shape, parallel=info,
                )
                if cfg_ax is not None:
                    v = cfg_combine(v, gscale, axis=cfg_ax)
                elif b_loc == 2:
                    v = v[1:2] + gscale * (v[:1] - v[1:2])
                return v[:1]

            fn = jax.jit(
                shard_map(
                    run,
                    mesh=ctx.mesh,
                    in_specs=(
                        pspecs, P(None, sp_ax), P(cfg_ax), P(cfg_ax),
                        P(cfg_ax), P(cfg_ax), P(cfg_ax), P(),
                    ),
                    out_specs=P(None, sp_ax),
                    check_vma=False,
                ),
                static_argnames=(),
            )
            self._fns[key] = fn
        return fn

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

            def run(tokens, lat_h, lat_w):
                lat = unpack_latents(tokens, lat_h, lat_w)
                return vae.denormalize_latents(
                    cfg, lat.transpose(0, 2, 3, 1)
                )

            fn = jax.jit(run, static_argnums=(1, 2))
            self._fns["decode_prep"] = fn
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
        sched = state["sched"]
        fn = self._transformer_fn()
        lat_h, lat_w = state["lat_hw"]
        img_shape = state.get("img_shapes", (1, lat_h // 2, lat_w // 2))
        gscale = float(sp.guidance_scale or 1.0)
        distilled = self.arch.guidance_embeds
        do_cfg = state["do_cfg"]
        nb = state["txt"].shape[0]
        # Kontext appends packed conditioning-image latents each step;
        # only the target tokens are denoised (pipeline_flux_kontext.py)
        cond = state.get("cond_latents")

        end = min(state["step"] + count, sp.num_inference_steps)
        latents = state["latents"]
        if self.parallel is not None and cond is None:
            pfn = self._parallel_step_fn(img_shape)
            g_eff = jnp.float32(gscale if do_cfg else 1.0)
            for step in range(state["step"], end):
                sigma = sched.timestep(step)
                t = jnp.full((nb,), sigma, jnp.float32)
                g = jnp.full((nb,), gscale, jnp.float32)
                pred = pfn(
                    self.params["transformer"], latents, state["txt"],
                    state["txt_lens"], state["pooled"], t, g, g_eff,
                )
                latents, state["sched_state"] = sched.step(
                    state["sched_state"], pred, latents
                )
            state["latents"] = latents
            state["step"] = end
            if end >= sp.num_inference_steps:
                lat_np = jnp.asarray(np.asarray(latents))
                z = self._decode_prep()(lat_np, lat_h, lat_w)
                img = vae.decode_pixels(
                    self.vae_cfg, self.params["vae"], z, self._fns
                )[0]
                return (
                    np.asarray(img * 255.0, np.float32).astype(np.uint8),
                    state,
                )
            return None, state
        for step in range(state["step"], end):
            sigma = sched.timestep(step)
            t = jnp.full((nb,), sigma, jnp.float32)
            g = (
                jnp.full((nb,), gscale, jnp.float32) if distilled else None
            )
            inp = (
                latents
                if cond is None
                else jnp.concatenate([latents, cond], axis=1)
            )
            v = fn(
                self.params["transformer"],
                jnp.concatenate([inp] * nb, 0),
                state["txt"], state["txt_lens"], state["pooled"], t, g,
                img_shape,
            )
            v = v[:, : latents.shape[1]]
            if do_cfg:
                pos, neg = v[:1], v[1:2]
                pred = neg + gscale * (pos - neg)
            else:
                pred = v[:1]
            latents, state["sched_state"] = sched.step(
                state["sched_state"], pred, latents
            )
        state["latents"] = latents
        state["step"] = end
        if end >= sp.num_inference_steps:
            z = self._decode_prep()(latents, lat_h, lat_w)
            # shared auto-tiling decode (vae.decode_pixels) bounds the
            # VAE activation peak on large frames
            img = vae.decode_pixels(
                self.vae_cfg, self.params["vae"], z, self._fns
            )[0]
            return (
                np.asarray(img * 255.0, np.float32).astype(np.uint8),
                state,
            )
        return None, state

    # ------------------------------------------------------------ prepare
    def _prepare(self, prompt, sp: DiffusionSamplingParams) -> dict:
        ratio = self.vae_cfg.spatial_ratio
        lat_h = max(2 * (sp.height // (ratio * 2)), 2)
        lat_w = max(2 * (sp.width // (ratio * 2)), 2)
        seq_len = (lat_h // 2) * (lat_w // 2)

        text = getattr(prompt, "text", None) or ""
        pos, pooled = self.encode_text(text)
        # distilled models embed guidance instead of running CFG
        do_cfg = (
            not self.arch.guidance_embeds
            and sp.guidance_scale is not None
            and sp.guidance_scale > 1.0
        )
        branches = [pos]
        pools = [pooled]
        if do_cfg:
            neg_text = getattr(prompt, "negative_text", None) or " "
            npos, npooled = self.encode_text(neg_text)
            branches.append(npos)
            pools.append(npooled)
        if self.parallel is not None:
            if self.parallel.cfg_size == 2 and len(branches) == 1:
                # cfg axis active but guidance is embedded/off: both
                # shards run the positive branch (g=1 combine = id)
                branches.append(pos)
                pools.append(pooled)
            if seq_len % self.parallel.sp_size:
                raise ValueError(
                    f"image token count {seq_len} not divisible by "
                    f"ulysses_size={self.parallel.sp_size}"
                )
        s_txt = max(b.shape[0] for b in branches)
        s_txt = s_txt + (-s_txt % 8)
        txt = np.zeros(
            (len(branches), s_txt, self.arch.joint_attention_dim),
            np.float32,
        )
        lens = np.zeros((len(branches),), np.int32)
        for i, b_ in enumerate(branches):
            txt[i, : b_.shape[0]] = b_
            lens[i] = b_.shape[0]

        key = jax.random.PRNGKey(sp.seed if sp.seed is not None else 0)
        noise = jax.random.normal(
            key, (1, self.vae_cfg.z_dim, lat_h, lat_w), jnp.float32
        )
        mu = calculate_shift(seq_len)
        if self.scheduler_kind == "unipc":
            sched = FlowUniPCScheduler(sp.num_inference_steps, mu=mu)
        else:
            sched = FlowEulerScheduler(sp.num_inference_steps, mu=mu)
        return {
            "latents": pack_latents(noise),
            "txt": jnp.asarray(txt),
            "txt_lens": jnp.asarray(lens),
            "pooled": jnp.asarray(np.stack(pools)),
            "lat_hw": (lat_h, lat_w),
            "sched": sched,
            "sched_state": sched.init_state(),
            "do_cfg": do_cfg,
            "step": 0,
        }
