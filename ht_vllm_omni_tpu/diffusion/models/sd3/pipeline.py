"""SD3 / SD3.5 text-to-image pipeline.

Mirrors the reference SD3 pipeline flow (reference
vllm_omni/diffusion/models/sd3/pipeline_sd3.py): prompts are encoded by
CLIP-L + CLIP-G (hidden states concatenated on features, zero-padded to
the T5 width) and T5 (appended along the sequence); the pooled vector is
the concatenation of the two CLIP projections; denoising runs true CFG
under a flow-matching Euler/UniPC scheduler (SD3-medium: static shift 3;
SD3.5: resolution-shifted mu); a KL VAE decodes (here: the Qwen-Image
causal-3D VAE's image specialization, same substitution contract as the
Flux pipeline).

All three text encoders are real modules with HF weight loaders
(``clip_text.py``, ``t5_encoder.py``) — random-init tiny configs by
default, real checkpoints via the family loader.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.diffusion.data import DiffusionSamplingParams
from ht_vllm_omni_tpu.diffusion.models import clip_text, t5_encoder
from ht_vllm_omni_tpu.diffusion.models.qwen_image import vae
from ht_vllm_omni_tpu.diffusion.models.qwen_image.config import (
    QwenImageVAEConfig,
)
from ht_vllm_omni_tpu.diffusion.models.sd3 import transformer
from ht_vllm_omni_tpu.diffusion.models.sd3.config import SD3ArchConfig
from ht_vllm_omni_tpu.diffusion.schedulers.unipc import (
    FlowEulerScheduler,
    FlowUniPCScheduler,
    calculate_shift,
)


class SD3Pipeline:
    def __init__(
        self,
        arch: SD3ArchConfig | None = None,
        vae_cfg: QwenImageVAEConfig | None = None,
        clip_l_cfg: clip_text.CLIPTextConfig | None = None,
        clip_g_cfg: clip_text.CLIPTextConfig | None = None,
        t5_cfg: t5_encoder.T5EncoderConfig | None = None,
        params: dict | None = None,
        seed: int = 0,
        scheduler: str = "euler",
        shift: float = 3.0,  # SD3-medium static shift
        dynamic_shift: bool = False,  # SD3.5 resolution shift
        tokenizers: dict | None = None,  # name -> callable str->ids
        clip_len: int = 77,
        t5_len: int = 128,
        parallel=None,  # diffusion.parallel.DiffusionParallelContext
    ) -> None:
        self.arch = arch or SD3ArchConfig.tiny()
        self.vae_cfg = vae_cfg or QwenImageVAEConfig.tiny()
        if self.vae_cfg.z_dim != self.arch.in_channels:
            raise ValueError("vae z_dim must equal transformer in_channels")
        pd = self.arch.pooled_projection_dim
        # tiny defaults keep hidden_l + hidden_g <= joint_attention_dim
        # (real SD3: 768 + 1280 <= 4096), so the zero-pad below is valid
        tiny_h = max(self.arch.joint_attention_dim // 4, 8)
        self.clip_l_cfg = clip_l_cfg or clip_text.CLIPTextConfig.tiny(
            projection_dim=pd // 2, hidden_size=tiny_h,
            intermediate_size=2 * tiny_h,
        )
        self.clip_g_cfg = clip_g_cfg or clip_text.CLIPTextConfig.tiny(
            projection_dim=pd - pd // 2, hidden_size=tiny_h,
            intermediate_size=2 * tiny_h,
        )
        if (
            self.clip_l_cfg.hidden_size + self.clip_g_cfg.hidden_size
            > self.arch.joint_attention_dim
        ):
            raise ValueError(
                "clip hidden sizes must fit in joint_attention_dim"
            )
        self.t5_cfg = t5_cfg or t5_encoder.T5EncoderConfig.tiny(
            d_model=self.arch.joint_attention_dim
        )
        if self.t5_cfg.d_model != self.arch.joint_attention_dim:
            raise ValueError("t5 d_model must equal joint_attention_dim")
        if (
            self.clip_l_cfg.projection_dim + self.clip_g_cfg.projection_dim
            != pd
        ):
            raise ValueError(
                "clip projection dims must sum to pooled_projection_dim"
            )
        self.scheduler_kind = scheduler
        self.shift = shift
        self.dynamic_shift = dynamic_shift
        self.tokenizers = tokenizers or {}
        self.clip_len = min(
            clip_len,
            self.clip_l_cfg.max_position_embeddings,
            self.clip_g_cfg.max_position_embeddings,
        )
        self.t5_len = t5_len
        key = jax.random.PRNGKey(seed)
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        params = params or {}

        def pick(name, init):
            v = params.get(name)
            return v if v is not None else init

        self.params = {
            "transformer": pick(
                "transformer", transformer.init_params(self.arch, k1)
            ),
            "vae": pick("vae", vae.init_params(self.vae_cfg, k2)),
            "clip_l": pick(
                "clip_l", clip_text.init_params(self.clip_l_cfg, k3)
            ),
            "clip_g": pick(
                "clip_g", clip_text.init_params(self.clip_g_cfg, k4)
            ),
            "t5": pick("t5", t5_encoder.init_params(self.t5_cfg, k5)),
        }
        self._fns: dict = {}
        # served parallel execution (cfg x sp; weights replicated —
        # diffusion/parallel.py)
        self.parallel = parallel
        if parallel is not None and parallel.tp_size > 1:
            raise ValueError(
                "sd3 supports cfg x sp parallelism (no tp plan)"
            )

    # --------------------------------------------------------------- text
    def _tokenize(self, name: str, text: str, vocab: int, length: int):
        tok = self.tokenizers.get(name)
        ids = list(tok(text)) if tok is not None else [
            b % vocab for b in text.encode("utf-8")
        ]
        ids = ids[:length] or [0]
        return ids + [0] * (length - len(ids))

    def encode_text(self, text: str) -> tuple[np.ndarray, np.ndarray]:
        """Prompt -> ([S_clip + S_t5, joint_dim] embeds, [pooled_dim])."""
        fn = self._fns.get("text_encode")
        if fn is None:

            def run(params, lid, gid, tid):
                hl, pl = clip_text.forward(
                    self.clip_l_cfg, params["clip_l"], lid
                )
                hg, pg = clip_text.forward(
                    self.clip_g_cfg, params["clip_g"], gid
                )
                ht = t5_encoder.forward(self.t5_cfg, params["t5"], tid)
                clip_h = jnp.concatenate([hl, hg], axis=-1)
                pad = self.arch.joint_attention_dim - clip_h.shape[-1]
                clip_h = jnp.pad(clip_h, ((0, 0), (0, 0), (0, pad)))
                embeds = jnp.concatenate([clip_h, ht], axis=1)
                pooled = jnp.concatenate([pl, pg], axis=-1)
                return embeds, pooled

            fn = jax.jit(run)
            self._fns["text_encode"] = fn
        lid = jnp.asarray(
            [
                self._tokenize(
                    "clip_l", text, self.clip_l_cfg.vocab_size, self.clip_len
                )
            ],
            jnp.int32,
        )
        gid = jnp.asarray(
            [
                self._tokenize(
                    "clip_g", text, self.clip_g_cfg.vocab_size, self.clip_len
                )
            ],
            jnp.int32,
        )
        tid = jnp.asarray(
            [
                self._tokenize(
                    "t5", text, self.t5_cfg.vocab_size, self.t5_len
                )
            ],
            jnp.int32,
        )
        embeds, pooled = fn(self.params, lid, gid, tid)
        return np.asarray(embeds[0], np.float32), np.asarray(
            pooled[0], np.float32
        )

    # ------------------------------------------------------------ denoise
    def _parallel_step_fn(self):
        """One guided denoise velocity under the cfg x sp mesh: branch
        forwards shard over cfg, image tokens over sp inside
        transformer.forward; the combine happens in-mesh."""
        fn = self._fns.get("pstep")
        if fn is None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from ht_vllm_omni_tpu.diffusion.distributed.cfg_parallel import (
                cfg_combine,
            )

            ctx = self.parallel
            info = ctx.info
            arch = self.arch
            cfg_ax = info.cfg_axis

            def run(params, lat, txt, pooled, t, gscale):
                b_loc = txt.shape[0]
                v = transformer.forward(
                    arch, params,
                    jnp.concatenate([lat] * b_loc, axis=0),
                    txt, pooled, t, parallel=info,
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
                        P(), P(), P(cfg_ax), P(cfg_ax), P(cfg_ax), P(),
                    ),
                    out_specs=P(),
                    check_vma=False,
                )
            )
            self._fns["pstep"] = fn
        return fn

    def _transformer_fn(self):
        fn = self._fns.get("transformer")
        if fn is None:
            fn = jax.jit(functools.partial(transformer.forward, self.arch))
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
        do_cfg = state["do_cfg"]
        gscale = float(sp.guidance_scale)
        nb = state["txt"].shape[0]

        end = min(state["step"] + count, sp.num_inference_steps)
        latents = state["latents"]
        if self.parallel is not None:
            pfn = self._parallel_step_fn()
            g_eff = jnp.float32(gscale if do_cfg else 1.0)
            txt_b, pooled_b = state["txt"], state["pooled"]
            if self.parallel.cfg_size == 2 and nb == 1:
                txt_b = jnp.concatenate([txt_b, txt_b], 0)
                pooled_b = jnp.concatenate([pooled_b, pooled_b], 0)
            nb_eff = txt_b.shape[0]
            for step in range(state["step"], end):
                sigma = sched.timestep(step)
                t = jnp.full((nb_eff,), sigma, jnp.float32)
                pred = pfn(
                    self.params["transformer"], latents, txt_b,
                    pooled_b, t, g_eff,
                )
                latents, state["sched_state"] = sched.step(
                    state["sched_state"], pred, latents
                )
        else:
            for step in range(state["step"], end):
                sigma = sched.timestep(step)
                t = jnp.full((nb,), sigma, jnp.float32)
                v = fn(
                    self.params["transformer"],
                    jnp.concatenate([latents] * nb, 0),
                    state["txt"], state["pooled"], t,
                )
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
            z = self._decode_prep()(latents)
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
        return self.generate_prompt(p, sp, stepwise_state)

    # ------------------------------------------------------------ prepare
    def _prepare(self, prompt, sp: DiffusionSamplingParams) -> dict:
        ratio = self.vae_cfg.spatial_ratio
        ps = self.arch.patch_size
        lat_h = ps * max(sp.height // (ratio * ps), 1)
        lat_w = ps * max(sp.width // (ratio * ps), 1)
        seq_len = (lat_h // ps) * (lat_w // ps)

        text = getattr(prompt, "text", None) or ""
        pos_e, pos_p = self.encode_text(text)
        do_cfg = sp.guidance_scale is not None and sp.guidance_scale > 1.0
        if self.parallel is not None and seq_len % self.parallel.sp_size:
            raise ValueError(
                f"image token count {seq_len} not divisible by "
                f"ulysses_size={self.parallel.sp_size}"
            )
        embeds = [pos_e]
        pools = [pos_p]
        if do_cfg:
            neg_text = getattr(prompt, "negative_text", None) or " "
            neg_e, neg_p = self.encode_text(neg_text)
            embeds.append(neg_e)
            pools.append(neg_p)

        txt = jnp.asarray(np.stack(embeds))
        pooled = jnp.asarray(np.stack(pools))

        key = jax.random.PRNGKey(sp.seed if sp.seed is not None else 0)
        latents = jax.random.normal(
            key, (1, self.arch.in_channels, lat_h, lat_w), jnp.float32
        )
        n = sp.num_inference_steps
        mu = calculate_shift(seq_len) if self.dynamic_shift else None
        kw = {"mu": mu} if mu is not None else {"shift": self.shift}
        if self.scheduler_kind == "unipc":
            sched = FlowUniPCScheduler(n, **kw)
        else:
            sched = FlowEulerScheduler(n, **kw)
        return {
            "latents": latents,
            "txt": txt,
            "pooled": pooled,
            "sched": sched,
            "sched_state": sched.init_state(),
            "do_cfg": do_cfg,
            "step": 0,
        }
