"""Flow-matching text-to-image pipeline over the generic DiT.

Counterpart of the reference's per-model diffusion pipelines (reference
vllm_omni/diffusion/models/qwen_image/pipeline_qwen_image.py etc.): text
conditioning -> iterative denoise (CFG) -> latent decode.  The denoise
loop is one jitted lax.fori_loop; step-wise execution (streaming /
preemptible denoising, reference diffusion_model_runner.execute_stepwise
:342) runs N steps per call by carrying (latents, step) between calls.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.diffusion.cache.dbcache import (
    DBCacheConfig,
    init_state as dbcache_init,
)
from ht_vllm_omni_tpu.diffusion.cache.teacache import (
    TeaCacheConfig,
    cached_velocity,
    init_state as teacache_init,
)
from ht_vllm_omni_tpu.diffusion.data import (
    DiffusionSamplingParams,
    DiTArchConfig,
)
from ht_vllm_omni_tpu.diffusion.models import dit
from ht_vllm_omni_tpu.diffusion.schedulers.flow_match import (
    FlowMatchEulerScheduler,
)


class FlowPipeline:
    def __init__(
        self,
        cfg: DiTArchConfig,
        params: dict | None = None,
        seed: int = 0,
        teacache: TeaCacheConfig | None = None,
        dbcache: DBCacheConfig | None = None,
        offload: str | None = None,  # None | "layerwise"
        parallel=None,  # diffusion.parallel.DiffusionParallelContext
    ) -> None:
        self.cfg = cfg
        self.teacache = teacache or TeaCacheConfig()
        self.dbcache = dbcache or DBCacheConfig()
        self.offload = offload
        self._offload_runner = None
        self.params = (
            params
            if params is not None
            else dit.init_params(cfg, jax.random.PRNGKey(seed))
        )
        self._denoise_fns: dict = {}
        self.parallel = parallel
        if parallel is not None:
            if parallel.tp_size > 1:
                raise ValueError(
                    "generic DiT supports cfg x sp x pp parallelism; "
                    "tensor parallel needs a family with TP weight "
                    "plans (qwen-image)"
                )
            if parallel.pp_size > 1:
                if parallel.sp_size > 1:
                    raise ValueError(
                        "pipefusion (pp) and ulysses (sp) do not "
                        "compose on the generic DiT yet"
                    )
                if parallel.cfg_size != 2:
                    raise ValueError(
                        "generic pipefusion needs cfg_parallel_size=2 "
                        "(the CFG branches are the pipeline's "
                        "microbatches)"
                    )
                if cfg.num_layers % parallel.pp_size:
                    raise ValueError(
                        f"num_layers {cfg.num_layers} not divisible by "
                        f"pipeline_parallel_size={parallel.pp_size}"
                    )
            if self.teacache.enabled or self.dbcache.enabled:
                raise ValueError(
                    "step/block caching does not compose with parallel "
                    "denoise yet; disable cache_backend"
                )
            if offload is not None:
                raise ValueError("offload + parallel are exclusive")
            self.params = parallel.replicated(self.params)

    # ------------------------------------------------------ conditioning
    def encode_text(self, token_ids: list[int] | None) -> jnp.ndarray:
        """Toy built-in text encoder: embedding lookup (real model families
        plug their own encoder or pass prompt embeds)."""
        ids = jnp.asarray(token_ids or [0], jnp.int32) % self.cfg.vocab_size
        emb = jnp.take(self.params["cond_embed"], ids, axis=0)
        # project into cond_dim space (id map when dims equal)
        if emb.shape[-1] != self.cfg.cond_dim:
            emb = emb[..., : self.cfg.cond_dim]
        return emb

    # ---------------------------------------------------------- denoise
    def _denoise_fn(self, num_steps: int, seq_hw: tuple[int, int]):
        key = (num_steps, seq_hw)
        fn = self._denoise_fns.get(key)
        if fn is None:
            sched = FlowMatchEulerScheduler(num_steps)
            cfg = self.cfg

            tc_cfg = self.teacache
            db_cfg = self.dbcache

            def run(params, latents, cond, uncond, gscale, start, count,
                    tc_state):
                lat_hw = latents.shape[:2]

                def body(i, carry):
                    x, tc, skips = carry
                    tokens = dit.patchify(cfg, x)
                    t = sched.timestep(i)

                    def compute():
                        v_c = dit.forward(cfg, params, tokens, cond, t)
                        v_u = dit.forward(cfg, params, tokens, uncond, t)
                        return v_u + gscale * (v_c - v_u)

                    if db_cfg.enabled:
                        # DBCache: per-CFG-branch block-level caching
                        # (reference cache_dit_backend.py DBCacheConfig)
                        v_c, st_c, hit_c = dit.forward_cached(
                            cfg, params, tokens, cond, t, tc["c"],
                            db_cfg, i,
                        )
                        v_u, st_u, _ = dit.forward_cached(
                            cfg, params, tokens, uncond, t, tc["u"],
                            db_cfg, i,
                        )
                        tc = {"c": st_c, "u": st_u}
                        v = (v_u + gscale * (v_c - v_u)).astype(
                            jnp.float32
                        )
                        skips = skips + hit_c.astype(jnp.int32)
                    elif tc_cfg.enabled:
                        v, tc = cached_velocity(
                            tc, t, compute, tc_cfg.threshold
                        )
                        skips = skips + jnp.where(
                            tc["accum"] != 0.0, 1, 0
                        )
                    else:
                        v = compute().astype(jnp.float32)
                    x_tok = tokens + (
                        sched.sigmas[i + 1] - sched.sigmas[i]
                    ) * v
                    x = dit.unpatchify(cfg, x_tok.astype(x.dtype), *lat_hw)
                    return x, tc, skips

                x, tc, skips = jax.lax.fori_loop(
                    start, jnp.minimum(start + count, num_steps), body,
                    (latents, tc_state, jnp.int32(0)),
                )
                return x, tc, skips

            fn = jax.jit(run)
            self._denoise_fns[key] = fn
        return fn

    def _parallel_denoise_fn(self, num_steps: int, tok_shape):
        """Whole denoise loop inside ONE jit(shard_map(...)) over the
        diffusion mesh: image tokens seq-sharded over sp (Ulysses joint
        attention inside dit.forward), CFG branches over cfg
        (cfg_parallel.cfg_combine in-mesh) — the engine-served analog of
        the reference's per-request parallel denoise
        (diffusion_worker.py:100-144)."""
        key = ("par", num_steps, tok_shape)
        fn = self._denoise_fns.get(key)
        if fn is None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from ht_vllm_omni_tpu.diffusion.distributed.cfg_parallel import (
                cfg_combine,
            )

            sched = FlowMatchEulerScheduler(num_steps)
            cfg = self.cfg
            info = self.parallel.info
            sp_ax = info.sp_axis
            cfg_ax = info.cfg_axis
            sp_n = info.sp_size

            def run(params, tokens, cond_b, gscale, start, count):
                def fwd(x, c, t):
                    return dit.forward(
                        cfg, params, x, c, t,
                        sp_size=sp_n, sp_axis=sp_ax,
                    )

                def body(i, x):
                    t = sched.timestep(i)
                    if cfg_ax is not None:
                        v = cfg_combine(
                            fwd(x, cond_b[0], t), gscale, axis=cfg_ax
                        )
                    else:
                        v_c = fwd(x, cond_b[0], t)
                        v_u = fwd(x, cond_b[1], t)
                        v = v_u + gscale * (v_c - v_u)
                    return (
                        x
                        + (sched.sigmas[i + 1] - sched.sigmas[i])
                        * v.astype(x.dtype)
                    )

                return jax.lax.fori_loop(
                    start, jnp.minimum(start + count, num_steps), body,
                    tokens,
                )

            fn = jax.jit(
                shard_map(
                    run,
                    mesh=self.parallel.mesh,
                    in_specs=(P(), P(sp_ax), P(cfg_ax), P(), P(), P()),
                    out_specs=P(sp_ax),
                    check_vma=False,
                )
            )
            self._denoise_fns[key] = fn
        return fn

    _LAYER_KEYS = (
        "ada", "ada_b", "wqkv", "wo", "mlp_in", "mlp_out", "norm_scale",
    )

    def _pipefusion_fn(self, num_steps: int, tok_shape, s_txt: int):
        """PipeFusion denoise (diffusion/distributed/pipefusion.py):
        layers sharded over pp, patches pipelined with one-step-stale
        cross-patch KV, CFG branches over the cfg axis."""
        key = ("pf", num_steps, tok_shape, s_txt)
        fn = self._denoise_fns.get(key)
        if fn is None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from ht_vllm_omni_tpu.diffusion.distributed.pipefusion import (
                pipefusion_denoise,
            )

            info = self.parallel.info
            sched = FlowMatchEulerScheduler(num_steps)
            body = pipefusion_denoise(
                self.cfg, sched.sigmas, info.pp_size, info.pp_axis,
                info.cfg_axis, num_steps, tok_shape[0], s_txt,
            )
            lp_specs = {k: P(info.pp_axis) for k in self._LAYER_KEYS}

            fn = jax.jit(
                shard_map(
                    body,
                    mesh=self.parallel.mesh,
                    in_specs=(
                        lp_specs, P(), P(), P(info.cfg_axis), P(), P(),
                        P(),
                    ),
                    out_specs=P(),
                    check_vma=False,
                )
            )
            self._denoise_fns[key] = fn
        return fn

    def prepare(
        self, sp: DiffusionSamplingParams, key: jax.Array
    ) -> jax.Array:
        lh = sp.height // 8
        lw = sp.width // 8
        lh -= lh % self.cfg.patch_size
        lw -= lw % self.cfg.patch_size
        return jax.random.normal(
            key, (max(lh, self.cfg.patch_size),
                  max(lw, self.cfg.patch_size), self.cfg.in_channels),
            jnp.float32,
        )

    def denoise_steps(
        self,
        latents: jax.Array,
        cond: jax.Array,
        uncond: jax.Array,
        sp: DiffusionSamplingParams,
        start: int,
        count: int,
        tc_state: dict | None = None,
    ):
        if self.parallel is not None:
            tokens = dit.patchify(self.cfg, latents)
            cond_b = jnp.stack([cond, uncond])
            if self.parallel.pp_size > 1:
                if tokens.shape[0] % self.parallel.pp_size:
                    raise ValueError(
                        f"token count {tokens.shape[0]} not divisible "
                        "by pipeline_parallel_size="
                        f"{self.parallel.pp_size}"
                    )
                lp = {k: self.params[k] for k in self._LAYER_KEYS}
                shared = {
                    k: v for k, v in self.params.items()
                    if k not in self._LAYER_KEYS
                }
                fn = self._pipefusion_fn(
                    sp.num_inference_steps, tokens.shape,
                    int(cond.shape[0]),
                )
                x = fn(
                    lp, shared, tokens, cond_b,
                    jnp.float32(sp.guidance_scale), jnp.int32(start),
                    jnp.int32(count),
                )
            else:
                if tokens.shape[0] % self.parallel.sp_size:
                    raise ValueError(
                        f"token count {tokens.shape[0]} not divisible "
                        f"by ulysses_size={self.parallel.sp_size}"
                    )
                fn = self._parallel_denoise_fn(
                    sp.num_inference_steps, tokens.shape
                )
                x = fn(
                    self.params, tokens, cond_b,
                    jnp.float32(sp.guidance_scale), jnp.int32(start),
                    jnp.int32(count),
                )
            lat = dit.unpatchify(
                self.cfg, x.astype(latents.dtype), *latents.shape[:2]
            )
            return lat, tc_state, jnp.int32(0)
        fn = self._denoise_fn(sp.num_inference_steps, latents.shape[:2])
        if tc_state is None:
            if self.dbcache.enabled:
                s_tot = cond.shape[0] + dit.patchify(
                    self.cfg, latents
                ).shape[0]
                shape = (s_tot, self.cfg.hidden_size)
                tc_state = {
                    "c": dbcache_init(shape), "u": dbcache_init(shape),
                }
            else:
                tc_state = teacache_init(
                    dit.patchify(self.cfg, latents).shape
                )
        return fn(
            self.params, latents, cond, uncond,
            jnp.float32(sp.guidance_scale), jnp.int32(start),
            jnp.int32(count), tc_state,
        )

    def _offload_denoise(self, state, sp, count):
        """Host-loop denoise with layerwise weight offload+prefetch
        (diffusion/offloader.py): block weights stream from host memory
        one layer ahead of compute, so device HBM holds at most two
        blocks of DiT weights at a time."""
        from ht_vllm_omni_tpu.diffusion.offloader import (
            LayerwiseOffloadRunner,
        )

        if self._offload_runner is None:
            self._offload_runner = LayerwiseOffloadRunner(
                self.cfg, self.params
            )
        runner = self._offload_runner
        sched = FlowMatchEulerScheduler(sp.num_inference_steps)
        cfg = self.cfg
        x = state["latents"]
        lat_hw = x.shape[:2]
        g = float(sp.guidance_scale)
        end = min(state["step"] + count, sp.num_inference_steps)
        for i in range(state["step"], end):
            tokens = dit.patchify(cfg, x)
            t = sched.timestep(i)
            v_c = runner.forward(tokens, state["cond"], t)
            v_u = runner.forward(tokens, state["uncond"], t)
            v = (v_u + g * (v_c - v_u)).astype(jnp.float32)
            x_tok = tokens + (sched.sigmas[i + 1] - sched.sigmas[i]) * v
            x = dit.unpatchify(cfg, x_tok.astype(x.dtype), *lat_hw)
        return x

    # ------------------------------------------------------------ decode
    def decode_latents(self, latents: jax.Array) -> np.ndarray:
        """Latents -> uint8 RGB.  Toy decoder: channel mix + nearest
        upsample (real VAEs plug in via the model registry; the tiled /
        patch-parallel decode lives in diffusion/vae_parallel.py)."""
        lat = np.asarray(latents, dtype=np.float32)
        mix = lat[..., :3] if lat.shape[-1] >= 3 else np.repeat(
            lat, 3, axis=-1
        )[..., :3]
        img = np.tanh(mix) * 0.5 + 0.5
        img = np.repeat(np.repeat(img, 8, axis=0), 8, axis=1)
        return (img * 255).astype(np.uint8)

    # ----------------------------------------------------------- full run
    def generate(
        self,
        token_ids: list[int] | None,
        sp: DiffusionSamplingParams,
        negative_token_ids: list[int] | None = None,
        prompt_embeds=None,
        stepwise_state: dict | None = None,
    ) -> tuple[np.ndarray | None, dict]:
        """Run (part of) a request.  Returns (image_or_None, state): the
        image is produced when the final step completes; with
        sp.stream_every > 0 call repeatedly, carrying ``state``."""
        state = stepwise_state or {}
        if "latents" not in state:
            key = jax.random.PRNGKey(
                sp.seed if sp.seed is not None else 0
            )
            state["latents"] = self.prepare(sp, key)
            state["cond"] = (
                jnp.asarray(prompt_embeds)
                if prompt_embeds is not None
                else self.encode_text(token_ids)
            )
            state["uncond"] = self.encode_text(negative_token_ids or [0])
            # pad cond/uncond to a common length so one compiled denoise
            # program serves both branches
            s = max(state["cond"].shape[0], state["uncond"].shape[0])
            state["cond"] = _pad_rows(state["cond"], s)
            state["uncond"] = _pad_rows(state["uncond"], s)
            state["step"] = 0
        count = (
            sp.stream_every if sp.stream_every > 0 else sp.num_inference_steps
        )
        if self.offload == "layerwise":
            state["latents"] = self._offload_denoise(state, sp, count)
            skips = 0
        else:
            state["latents"], state["teacache"], skips = (
                self.denoise_steps(
                    state["latents"], state["cond"], state["uncond"], sp,
                    state["step"], count, state.get("teacache"),
                )
            )
        state["skipped_steps"] = state.get("skipped_steps", 0) + int(skips)
        state["step"] = min(
            state["step"] + count, sp.num_inference_steps
        )
        if state["step"] >= sp.num_inference_steps:
            return self.decode_latents(state["latents"]), state
        return None, state


def _pad_rows(x: jnp.ndarray, n: int) -> jnp.ndarray:
    if x.shape[0] >= n:
        return x[:n]
    return jnp.pad(x, ((0, n - x.shape[0]), (0, 0)))
