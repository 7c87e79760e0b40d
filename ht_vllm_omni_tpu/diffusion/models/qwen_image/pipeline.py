"""Qwen-Image text-to-image pipeline (real model family).

Mirrors the reference QwenImagePipeline flow (reference
vllm_omni/diffusion/models/qwen_image/pipeline_qwen_image.py:244):
Qwen2.5-VL text trunk encodes the templated prompt (last hidden state,
template prefix dropped), latents are 2x2-packed into a token sequence,
denoising runs true CFG (comb = neg + s*(pos - neg), norm-preserving
rescale) under a flow-matching UniPC or Euler scheduler with
resolution-shifted sigmas, and the Wan-style causal-3D VAE decodes the
result.

Step-wise execution (the engine's streaming / preemption contract) is
kept by carrying (latents, scheduler state) in a state dict between
calls, like the generic FlowPipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.config import ModelArchConfig
from ht_vllm_omni_tpu.diffusion.data import DiffusionSamplingParams
from ht_vllm_omni_tpu.diffusion.models.qwen_image import transformer, vae
from ht_vllm_omni_tpu.diffusion.models.qwen_image.config import (
    QwenImageArchConfig,
    QwenImageVAEConfig,
)
from ht_vllm_omni_tpu.diffusion.schedulers.unipc import (
    FlowEulerScheduler,
    FlowUniPCScheduler,
    calculate_shift,
)
from ht_vllm_omni_tpu.models import qwen2

# diffusers QwenImagePipeline prompt template (public model card config)
PROMPT_TEMPLATE = (
    "<|im_start|>system\nDescribe the image by detailing the color, "
    "shape, size, texture, quantity, text, spatial relationships of "
    "the objects and background:<|im_end|>\n<|im_start|>user\n{}"
    "<|im_end|>\n<|im_start|>assistant\n"
)
TEMPLATE_DROP_IDX = 34


def pack_latents(lat: jax.Array) -> jax.Array:
    """[B, C, H, W] latents -> [B, (H//2)*(W//2), C*4] tokens (reference
    pipeline_qwen_image.py:452-458)."""
    b, c, h, w = lat.shape
    x = lat.reshape(b, c, h // 2, 2, w // 2, 2)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b, (h // 2) * (w // 2), c * 4)


def unpack_latents(tokens: jax.Array, h: int, w: int) -> jax.Array:
    """Inverse of pack_latents -> [B, C, H, W]."""
    b, _n, ch = tokens.shape
    c = ch // 4
    x = tokens.reshape(b, h // 2, w // 2, c, 2, 2)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(b, c, h, w)


class QwenImagePipeline:
    def __init__(
        self,
        arch: QwenImageArchConfig | None = None,
        vae_cfg: QwenImageVAEConfig | None = None,
        text_cfg: ModelArchConfig | None = None,
        params: dict | None = None,
        seed: int = 0,
        scheduler: str = "unipc",  # "unipc" | "euler"
        tokenizer=None,  # callable str -> list[int]; None = byte toy
        use_template: bool | None = None,
        max_text_len: int = 512,
        parallel=None,  # diffusion.parallel.DiffusionParallelContext
    ) -> None:
        self.arch = arch or QwenImageArchConfig.tiny()
        self.vae_cfg = vae_cfg or QwenImageVAEConfig.tiny()
        self.text_cfg = text_cfg or ModelArchConfig(
            hidden_size=self.arch.joint_attention_dim,
            num_hidden_layers=2,
            num_attention_heads=2,
            num_key_value_heads=2,
            intermediate_size=128,
            vocab_size=512,
        )
        if self.text_cfg.hidden_size != self.arch.joint_attention_dim:
            raise ValueError(
                "text encoder hidden_size must equal joint_attention_dim"
            )
        self.scheduler_kind = scheduler
        self.tokenizer = tokenizer
        # the chat template only tokenizes meaningfully with the real
        # tokenizer; the toy byte tokenizer skips it
        self.use_template = (
            use_template if use_template is not None else tokenizer is not None
        )
        self.max_text_len = max_text_len
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

    def encode_text(self, text: str) -> np.ndarray:
        """Prompt -> [S, joint_attention_dim] last-hidden-state rows
        (template prefix dropped, reference
        pipeline_qwen_image.py:374-413)."""
        drop = 0
        if self.use_template:
            text = PROMPT_TEMPLATE.format(text)
            drop = TEMPLATE_DROP_IDX
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
        # pad to the next multiple of 64 so compiles bucket
        n = len(ids)
        pad = -n % 64
        ids_arr = jnp.asarray(ids + [0] * pad, jnp.int32)
        h = fn(self.params["text"], ids_arr, jnp.int32(n))
        h = np.asarray(h[:n], np.float32)[drop:]
        return h[: self.max_text_len]

    def encode_text_batch(self, texts: list) -> list:
        """Encode N prompts in ONE padded batched trunk dispatch
        (models/qwen2.prefill_batch) — the text-encoder batching behind
        the engine's generate_batch (reference
        async_omni_diffusion.generate_batch, async_omni_diffusion.py:175).
        Returns per-prompt [S_i, joint_attention_dim] rows identical to
        encode_text()."""
        drop = 0
        if self.use_template:
            texts = [PROMPT_TEMPLATE.format(t) for t in texts]
            drop = TEMPLATE_DROP_IDX
        ids_list = [self._tokenize(t) for t in texts]
        bucket = max(len(i) for i in ids_list)
        bucket = bucket + (-bucket % 64)
        b = len(ids_list)
        ids = np.zeros((b, bucket), np.int32)
        lens = np.zeros((b,), np.int32)
        for i, t in enumerate(ids_list):
            ids[i, : len(t)] = t
            lens[i] = len(t)
        fn = self._fns.get("text_encode_batch")
        if fn is None:
            cfg = self.text_cfg

            def run(params, token_ids, lengths):
                emb = qwen2.embed_tokens(params, token_ids)
                pos = jnp.broadcast_to(
                    jnp.arange(token_ids.shape[1], dtype=jnp.int32)[None],
                    token_ids.shape,
                )
                h, _ = qwen2.prefill_batch(cfg, params, emb, pos, lengths)
                return h

            fn = jax.jit(run)
            self._fns["text_encode_batch"] = fn
        h = np.asarray(
            fn(self.params["text"], jnp.asarray(ids), jnp.asarray(lens)),
            np.float32,
        )
        return [
            h[i, : lens[i]][drop:][: self.max_text_len] for i in range(b)
        ]

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

    def _parallel_step_fn(self, img_shape):
        """One guided denoise velocity under the diffusion mesh: branch
        forwards shard over cfg, image tokens over sp (Ulysses inside
        transformer.forward), weights over tp/fsdp; the CFG combine +
        norm-preserving rescale happens in-mesh (cfg_parallel.py) so the
        returned prediction is already guided and cfg-replicated."""
        key = ("pstep", img_shape)
        fn = self._fns.get(key)
        if fn is None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from ht_vllm_omni_tpu.diffusion.distributed.cfg_parallel import (
                cfg_combine_rescale,
            )

            ctx = self.parallel
            info = ctx.info
            arch = self.arch
            pspecs = transformer.param_pspecs(info)
            sp_ax, cfg_ax = info.sp_axis, info.cfg_axis

            def run(params, lat, txt, txt_lens, t, gscale):
                b_loc = txt.shape[0]
                v = transformer.forward(
                    arch, params,
                    jnp.concatenate([lat] * b_loc, axis=0),
                    txt, txt_lens, t, img_shape, parallel=info,
                )
                if cfg_ax is not None:
                    v = cfg_combine_rescale(v, gscale, axis=cfg_ax)
                elif b_loc == 2:
                    pos, neg = v[:1], v[1:2]
                    comb = neg + gscale * (pos - neg)
                    cn = jnp.linalg.norm(pos, axis=-1, keepdims=True)
                    nn = jnp.linalg.norm(comb, axis=-1, keepdims=True)
                    v = comb * (cn / jnp.maximum(nn, 1e-12))
                return v[:1]

            fn = jax.jit(
                shard_map(
                    run,
                    mesh=ctx.mesh,
                    in_specs=(
                        pspecs, P(None, sp_ax), P(cfg_ax), P(cfg_ax),
                        P(cfg_ax), P(),
                    ),
                    out_specs=P(None, sp_ax),
                    check_vma=False,
                )
            )
            self._fns[key] = fn
        return fn

    def _decode_fn(self):
        fn = self._fns.get("decode")
        if fn is None:
            cfg = self.vae_cfg

            def run(params, tokens, lat_h, lat_w):
                lat = unpack_latents(tokens, lat_h, lat_w)
                lat = vae.denormalize_latents(
                    cfg, lat.transpose(0, 2, 3, 1)
                )  # NHWC
                img = vae.decode(cfg, params, lat)
                return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)

            fn = jax.jit(run, static_argnums=(2, 3))
            self._fns["decode"] = fn
        return fn

    def _make_scheduler(self, sp: DiffusionSamplingParams, seq_len: int):
        n = sp.num_inference_steps
        mu = calculate_shift(seq_len)
        if self.scheduler_kind == "euler":
            return FlowEulerScheduler(n, mu=mu)
        return FlowUniPCScheduler(n, mu=mu)

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
        lat_h, lat_w = state["lat_hw"]
        img_shape = state.get(
            "img_shapes", (state.get("frames", 1), lat_h // 2, lat_w // 2)
        )
        do_cfg = state["do_cfg"]
        gscale = float(sp.guidance_scale)

        # edit pipelines append packed conditioning-image latents to the
        # model input every step; only the target tokens are denoised
        # (reference pipeline_qwen_image_edit.py latent_model_input)
        cond = state.get("cond_latents")

        end = min(state["step"] + count, sp.num_inference_steps)
        latents = state["latents"]
        if self.parallel is not None and cond is None:
            pfn = self._parallel_step_fn(img_shape)
            g_eff = jnp.float32(gscale if do_cfg else 1.0)
            b = state["txt"].shape[0]
            for step in range(state["step"], end):
                sigma = sched.timestep(step)
                t = jnp.full((b,), sigma, jnp.float32)
                pred = pfn(
                    self.params["transformer"], latents, state["txt"],
                    state["txt_lens"], t, g_eff,
                )
                latents, state["sched_state"] = sched.step(
                    state["sched_state"], pred, latents
                )
            state["latents"] = latents
            state["step"] = end
            if end >= sp.num_inference_steps:
                # pull the sp-sharded latents off the mesh before the
                # (single-device) VAE decode
                latents = jnp.asarray(np.asarray(latents))
                return self._finalize(state, latents), state
            return None, state
        for step in range(state["step"], end):
            sigma = sched.timestep(step)
            t = jnp.full((state["txt"].shape[0],), sigma, jnp.float32)
            inp = (
                latents
                if cond is None
                else jnp.concatenate([latents, cond], axis=1)
            )
            v = fn(
                self.params["transformer"],
                jnp.concatenate([inp] * state["txt"].shape[0], 0),
                state["txt"], state["txt_lens"], t, img_shape,
            )
            v = v[:, : latents.shape[1]]
            if do_cfg:
                pos, neg = v[:1], v[1:2]
                comb = neg + gscale * (pos - neg)
                # norm-preserving rescale (reference
                # distributed/cfg_parallel.py:132-146)
                cn = jnp.linalg.norm(pos, axis=-1, keepdims=True)
                nn = jnp.linalg.norm(comb, axis=-1, keepdims=True)
                pred = comb * (cn / jnp.maximum(nn, 1e-12))
            else:
                pred = v[:1]
            latents, state["sched_state"] = sched.step(
                state["sched_state"], pred, latents
            )
        state["latents"] = latents
        state["step"] = end
        if end >= sp.num_inference_steps:
            return self._finalize(state, latents), state
        return None, state

    def _finalize(self, state: dict, latents) -> np.ndarray:
        """Decode the final latents to a uint8 image (overridden by the
        layered pipeline, which decodes one image per layer).  Large
        frames route through the shared auto-tiling decode
        (vae.decode_pixels — diffusers enable_tiling parity)."""
        lat_h, lat_w = state["lat_hw"]
        prep = self._fns.get("decode_prep")
        if prep is None:
            cfg = self.vae_cfg

            def _prep(tokens, lat_h, lat_w):
                lat = unpack_latents(tokens, lat_h, lat_w)
                return vae.denormalize_latents(
                    cfg, lat.transpose(0, 2, 3, 1)
                )

            prep = jax.jit(_prep, static_argnums=(1, 2))
            self._fns["decode_prep"] = prep
        z = prep(latents, lat_h, lat_w)
        img = vae.decode_pixels(
            self.vae_cfg, self.params["vae"], z, self._fns
        )[0]
        return np.asarray(img * 255.0, np.float32).astype(np.uint8)

    # engine compatibility: token-ids entry point delegates to text path
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
        lat_h = 2 * (sp.height // (ratio * 2))
        lat_w = 2 * (sp.width // (ratio * 2))
        lat_h, lat_w = max(lat_h, 2), max(lat_w, 2)
        seq_len = (lat_h // 2) * (lat_w // 2)

        text = getattr(prompt, "text", None) or ""
        embeds = getattr(prompt, "embeds", None)
        if embeds is not None:
            pos = np.asarray(embeds, np.float32)
        else:
            pos = self.encode_text(text)
        do_cfg = sp.guidance_scale is not None and sp.guidance_scale > 1.0
        branches = [pos]
        if do_cfg:
            neg_text = getattr(prompt, "negative_text", None) or " "
            branches.append(self.encode_text(neg_text))
        if self.parallel is not None:
            if self.parallel.cfg_size == 2 and len(branches) == 1:
                # the mesh carries a cfg axis but guidance is off: run
                # the positive branch on both shards (combine with g=1
                # is the identity)
                branches.append(pos)
            if seq_len % self.parallel.sp_size:
                raise ValueError(
                    f"image token count {seq_len} not divisible by "
                    f"ulysses_size={self.parallel.sp_size}; pick a "
                    "height/width whose latent grid divides sp"
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
        sched = self._make_scheduler(sp, seq_len)
        sched_state = sched.init_state()
        start_step = 0
        latents = noise

        # image-to-image (the /v1/images/edits path, reference
        # api_server.py:1347): encode the init image, start denoising at
        # sigma(t0) with the flow-matched blend x = (1-s)*z0 + s*noise
        init_image = self._init_image(prompt)
        if init_image is not None:
            strength = float(
                (getattr(prompt, "additional_information", None) or {}).get(
                    "strength", 0.8
                )
            )
            strength = min(max(strength, 1.0 / sp.num_inference_steps), 1.0)
            start_step = min(
                int(round(sp.num_inference_steps * (1.0 - strength))),
                sp.num_inference_steps - 1,
            )
            z0 = self._encode_image_latents(
                init_image, sp.height, sp.width, lat_h, lat_w
            )
            sigma0 = sched.timestep(start_step)
            latents = (1.0 - sigma0) * z0 + sigma0 * noise
            sched_state["step"] = start_step

        return {
            "latents": pack_latents(latents),
            "txt": jnp.asarray(txt),
            "txt_lens": jnp.asarray(lens),
            "lat_hw": (lat_h, lat_w),
            "sched": sched,
            "sched_state": sched_state,
            "do_cfg": do_cfg,
            "step": start_step,
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

    def _encode_image_latents(
        self, image: np.ndarray, h: int, w: int, lat_h: int, lat_w: int
    ) -> jax.Array:
        """[H, W, 3] image (uint8 or [0,1] float) -> normalized latents
        [1, z_dim, lat_h, lat_w]."""
        img = np.asarray(image, np.float32)
        if img.max() > 1.5:  # uint8-range input
            img = img / 255.0
        if img.shape[:2] != (h, w):  # nearest resize to the target size
            ri = (np.arange(h) * img.shape[0] // h).clip(0, img.shape[0] - 1)
            ci = (np.arange(w) * img.shape[1] // w).clip(0, img.shape[1] - 1)
            img = img[ri][:, ci]
        img = img * 2.0 - 1.0  # [-1, 1], inverse of decode's rescale
        fn = self._fns.get("encode_image")
        if fn is None:
            cfg = self.vae_cfg

            def run(params, x):
                z = vae.encode(cfg, params, x)
                return vae.normalize_latents(cfg, z)

            fn = jax.jit(run)
            self._fns["encode_image"] = fn
        z = fn(self.params["vae"], jnp.asarray(img)[None])  # [1, Hl, Wl, C]
        z = jnp.transpose(z, (0, 3, 1, 2))  # NCHW
        # clamp/crop to the target latent grid (ratio rounding)
        z = z[:, :, :lat_h, :lat_w]
        if z.shape[2] < lat_h or z.shape[3] < lat_w:
            z = jnp.pad(
                z,
                ((0, 0), (0, 0), (0, lat_h - z.shape[2]),
                 (0, lat_w - z.shape[3])),
            )
        return z
