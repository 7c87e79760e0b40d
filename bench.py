"""Headline benchmark: AR decode throughput per chip.

Measures steady-state batched decode (tokens/s/chip) of a
Qwen2.5-0.5B-shaped bf16 model (BASELINE.json config 1) with the full
engine loop (paged KV, continuous batching, on-device sampling).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against 3000 tok/s — a vLLM-on-A100 ballpark for the
same 0.5B bf16 model at batch 8 (the reference publishes no directly
comparable number; its Qwen3-Omni TPOT table is for a 3-stage 30B MoE
pipeline on H800, BASELINE.md).
"""

import json
import time

BASELINE_TOKS_PER_S = 3000.0


def tts_serving_metrics() -> dict:
    """Warm TTFP (ms) + RTF through the bundled qwen3_tts async-chunk
    pipeline (talker -> code2wav), the reference's headline serving
    metric (async_chunk_design.md:40-49 anchors TTFP 522.99 ms on GPU).
    Random-init weights: latency here measures the SYSTEM (scheduling,
    chunked handoff, codec decode), not model quality."""
    from ht_vllm_omni_tpu.config.stage_config import (
        builtin_pipeline_path,
        load_pipeline_config,
    )
    from ht_vllm_omni_tpu.engine.stage_factory import build_stages
    from ht_vllm_omni_tpu.entrypoints.omni import Omni
    from ht_vllm_omni_tpu.sampling_params import SamplingParams

    cfg = load_pipeline_config(builtin_pipeline_path("qwen3_tts"))
    cfg.stage(0).engine_args["model_arch_config"] = dict(
        model_type="qwen3", vocab_size=4096, hidden_size=256,
        intermediate_size=512, num_hidden_layers=4, num_attention_heads=8,
        num_key_value_heads=4, head_dim=32, dtype="bfloat16", qk_norm=True,
        attention_bias=False, tie_word_embeddings=True, eos_token_id=1,
    )
    cfg.stage(0).engine_args["num_pages"] = 128
    omni = Omni(pipeline=cfg, stages=build_stages(cfg))
    sp = SamplingParams(
        temperature=0.0, max_tokens=150, ignore_eos=True,
        return_hidden_states=True,
    )
    omni.generate([[1, 2, 3]], sp)  # warm every compile bucket
    orch = omni.orchestrator

    t0 = time.time()
    orch.add_request([10, 42, 99], sp)
    ttfp = None
    audio_samples = 0
    sample_rate = 24000
    import numpy as np

    while orch.has_unfinished():
        for out in orch.step():
            audio = out.consolidated_multimodal("audio")
            if audio is not None and len(audio):
                if ttfp is None:
                    ttfp = time.time() - t0
                audio_samples = len(audio)
                sr = out.multimodal_output.get("sample_rate")
                if sr is not None:
                    sample_rate = int(np.asarray(sr))
    e2e = time.time() - t0
    audio_s = audio_samples / float(sample_rate)
    out = {
        "tts_ttfp_ms": round((ttfp or e2e) * 1000.0, 1),
        "tts_rtf": round(e2e / audio_s, 3) if audio_s else None,
    }

    # concurrency 4 and 8: per-stream RTF under load (the reference's
    # headline table reports conc-1 and conc-10 RTF; batched code2wav
    # + continuous talker batching + the one-sync hidden handoff are
    # what this exercises)
    def run_conc(conc):
        t0 = time.time()
        for i in range(conc):
            orch.add_request([10 + i, 42, 99], sp)
        per_stream = {}
        while orch.has_unfinished():
            for out_ in orch.step():
                audio = out_.consolidated_multimodal("audio")
                if audio is not None and len(audio):
                    per_stream[out_.request_id] = len(audio)
        return time.time() - t0, per_stream

    for conc in (4, 8):
        run_conc(conc)  # warm the batched talker/codec compile buckets
        e2e, per_stream = run_conc(conc)
        total_s = sum(per_stream.values()) / float(sample_rate)
        if total_s:
            out[f"tts_rtf_c{conc}"] = round(e2e / (total_s / conc), 3)
    return out


def dit_block_mfu() -> dict:
    """Real-shape DiT block microbench (VERDICT r4 #6): one qwen-image
    -class dual-stream block (d=3072, 24 heads x 128, S_img=1024 — a
    512^2 image's packed latents — S_txt=256) timed over chained
    forwards; reports achieved TFLOP/s and MFU against the v5e chip's
    197 TFLOP/s bf16 peak.  Reference-comparable anchor: the dashboard's
    2.21 s @512^2/20 steps on 2x A100
    (qwen_image_serving_performance.md:141-147) is the same block math.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ht_vllm_omni_tpu.diffusion.models.qwen_image import transformer
    from ht_vllm_omni_tpu.diffusion.models.qwen_image.config import (
        QwenImageArchConfig,
    )

    arch = QwenImageArchConfig(num_layers=1)  # real width, one block
    params = transformer.init_params(arch, jax.random.PRNGKey(0))
    # the SERVED shape: both CFG branches ride one forward (B=2) at the
    # model's native-resolution grid (1024^2 -> 64x64 packed latents).
    # At 512^2/B1 the adaLN mod weights (117 MB/stream/block, near-zero
    # FLOPs) dominate bandwidth and MFU reads 0.30 — a model property,
    # not a kernel one.
    b, s_img, s_txt = 2, 4096, 256
    d = arch.inner_dim
    img = jnp.zeros((b, s_img, arch.in_channels), jnp.bfloat16)
    txt = jnp.zeros((b, s_txt, arch.joint_attention_dim), jnp.bfloat16)
    lens = jnp.full((b,), s_txt, jnp.int32)
    t = jnp.full((b,), 0.5, jnp.float32)
    shape = (1, 64, 64)

    def run(params, img):
        def body(x, _):
            v = transformer.forward(
                arch, params, x, txt, lens, t, shape
            )
            return (x + v[..., :1] * 1e-6).astype(x.dtype), None

        x, _ = jax.lax.scan(body, img, jnp.arange(4))
        return x

    fn = jax.jit(run)
    fn(params, img).block_until_ready()
    t0 = time.time()
    reps = 2
    for _ in range(reps):
        fn(params, img).block_until_ready()
    per_block = (time.time() - t0) / (reps * 4)

    s_tot = s_img + s_txt
    flops = 0.0
    for s in (s_img, s_txt):
        flops += 2 * s * d * 3 * d  # qkv
        flops += 2 * s * d * d  # attn out
        flops += 2 * s * d * 4 * d * 2  # mlp in+out
    flops += 4 * s_tot * s_tot * d  # attention QK^T + PV
    flops += 2 * s_img * arch.in_channels * d  # img_in
    flops += 2 * s_txt * arch.joint_attention_dim * d  # txt_in
    flops *= b
    tflops = flops / per_block / 1e12
    return {
        "dit_block_ms": round(per_block * 1e3, 3),
        "dit_block_tflops": round(tflops, 1),
        "dit_block_mfu": round(tflops / 197.0, 3),
    }


def main() -> None:
    import numpy as np

    from ht_vllm_omni_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelArchConfig,
        SchedulerConfig,
    )
    from ht_vllm_omni_tpu.engine.llm_engine import LLMEngine
    from ht_vllm_omni_tpu.sampling_params import SamplingParams

    batch = 8
    decode_tokens = 256
    cfg = ModelArchConfig()  # defaults = Qwen2.5-0.5B shape, bf16
    engine = LLMEngine(
        EngineConfig(
            model=cfg,
            cache=CacheConfig(page_size=128, num_pages=1024),
            scheduler=SchedulerConfig(max_num_seqs=batch, max_model_len=2048),
        ),
        # throughput-tuned: one long device-resident chunk amortises the
        # per-chunk host sync + dispatch (~30 ms on a tunneled link);
        # serving deployments trade this down for streaming granularity
        decode_horizon=256,
    )
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(0, 1000, size=64)) for _ in range(batch)]
    sp = SamplingParams(
        temperature=0.0, max_tokens=decode_tokens, ignore_eos=True
    )
    # warmup (compiles — run the full decode length so every live-page
    # width bucket the timed run will hit is already compiled)
    engine.generate(
        prompts, SamplingParams(temperature=0.0, max_tokens=decode_tokens,
                                ignore_eos=True)
    )
    t0 = time.time()
    outs = engine.generate(prompts, sp)
    dt = time.time() - t0
    total = sum(len(o.outputs[0].token_ids) for o in outs)
    assert total == batch * decode_tokens, total
    toks_per_s = total / dt
    del engine, outs  # free the bf16 engine's HBM before the TTS stack
    try:
        serve = tts_serving_metrics()
    except Exception as e:  # serving metrics are best-effort extras
        serve = {"tts_error": str(e)[:120]}
    try:
        # prefill throughput (TTFT side): 8 x 512-token prompts, whole
        # prompts in one batched dispatch; a short decode horizon so the
        # timing is not dominated by the trailing decode chunk
        eng_p = LLMEngine(
            EngineConfig(
                model=cfg,
                cache=CacheConfig(page_size=128, num_pages=1024),
                scheduler=SchedulerConfig(
                    max_num_seqs=batch, max_model_len=2048
                ),
            ),
            decode_horizon=4,
        )
        p512 = [list(rng.integers(0, 1000, size=512)) for _ in range(8)]
        sp2 = SamplingParams(
            temperature=0.0, max_tokens=2, ignore_eos=True
        )
        eng_p.generate(p512, sp2)  # warm the 512 bucket
        t0 = time.time()
        eng_p.generate(p512, sp2)
        serve["prefill_toks_per_s"] = round(8 * 512 / (time.time() - t0))
        # device prompt-processing capacity: the same batched-prefill
        # program timed over repeated dispatches with ONE host sync —
        # the engine number above carries a full tunnel round trip
        # (~24 ms here) per generate(), which on-host serving does not
        import jax
        import jax.numpy as jnp

        r = eng_p.runner
        x = jnp.zeros((8, 512, cfg.hidden_size), jnp.bfloat16)
        pos = jnp.broadcast_to(
            jnp.arange(512, dtype=jnp.int32)[None], (8, 512)
        )
        lens = jnp.full((8,), 512, jnp.int32)
        from ht_vllm_omni_tpu.models import qwen2 as _q

        pf = jax.jit(
            lambda p, x: _q.prefill_batch(cfg, p, x, pos, lens)
        )
        h, _rows = pf(r.params, x)
        np.asarray(h[:, :1, :1])
        t0 = time.time()
        for _ in range(5):
            h, _rows = pf(r.params, x)
        np.asarray(h[:, :1, :1])
        serve["prefill_device_toks_per_s"] = round(
            5 * 8 * 512 / (time.time() - t0)
        )
        # prefill under load: 32 x 512 amortizes the per-generate tunnel
        # round trip (~30 ms fixed on this link; host prep itself is
        # ~3 ms — profiled, see STATUS.md prefill note)
        del eng_p
        eng_p32 = LLMEngine(
            EngineConfig(
                model=cfg,
                cache=CacheConfig(page_size=128, num_pages=1024),
                scheduler=SchedulerConfig(
                    max_num_seqs=32, max_model_len=2048
                ),
            ),
            decode_horizon=4,
        )
        p32_512 = [
            list(rng.integers(0, 1000, size=512)) for _ in range(32)
        ]
        eng_p32.generate(p32_512, sp2)
        t0 = time.time()
        eng_p32.generate(p32_512, sp2)
        serve["prefill_bs32_toks_per_s"] = round(
            32 * 512 / (time.time() - t0)
        )
        del eng_p32
        eng_p = LLMEngine(
            EngineConfig(
                model=cfg,
                cache=CacheConfig(page_size=128, num_pages=1024),
                scheduler=SchedulerConfig(
                    max_num_seqs=batch, max_model_len=2048
                ),
            ),
            decode_horizon=4,
        )
        eng_p.generate([p512[0][:64]], sp2)
        # TTFT (reference table: 43-138 ms text TTFT on H800): one
        # short prompt, time until the first sampled token reaches the
        # host through the serving-style short-chunk engine
        sp_t = SamplingParams(
            temperature=0.0, max_tokens=8, ignore_eos=True
        )
        eng_p.generate([p512[0][:64]], sp_t)  # warm the 64 bucket
        t0 = time.time()
        rid = eng_p.add_request(p512[1][:64], sp_t)
        ttft = None
        while eng_p.has_unfinished_requests():
            for out in eng_p.step():
                if ttft is None and out.outputs[0].token_ids:
                    ttft = time.time() - t0
        serve["ttft_ms"] = round((ttft or 0.0) * 1000.0, 1)
        del eng_p
    except Exception as e:
        serve["prefill_error"] = str(e)[:120]
    try:
        import dataclasses

        eng8 = LLMEngine(
            EngineConfig(
                model=dataclasses.replace(cfg, quantization="int8"),
                cache=CacheConfig(page_size=128, num_pages=1024),
                scheduler=SchedulerConfig(
                    max_num_seqs=batch, max_model_len=2048
                ),
            ),
            decode_horizon=256,
        )
        eng8.generate(prompts, sp)  # warm
        t0 = time.time()
        outs8 = eng8.generate(prompts, sp)
        dt8 = time.time() - t0
        serve["int8_toks_per_s"] = round(
            sum(len(o.outputs[0].token_ids) for o in outs8) / dt8, 1
        )
        del eng8
        eng4 = LLMEngine(
            EngineConfig(
                model=dataclasses.replace(cfg, quantization="int4"),
                cache=CacheConfig(page_size=128, num_pages=1024),
                scheduler=SchedulerConfig(
                    max_num_seqs=batch, max_model_len=2048
                ),
            ),
            decode_horizon=256,
        )
        eng4.generate(prompts, sp)  # warm
        t0 = time.time()
        outs4 = eng4.generate(prompts, sp)
        dt4 = time.time() - t0
        serve["int4_toks_per_s"] = round(
            sum(len(o.outputs[0].token_ids) for o in outs4) / dt4, 1
        )
        del eng4
        # bs32 ladder entry: the per-step fixed costs (attention launch,
        # sampler, chunk dispatch) amortize over 4x the tokens
        eng32 = LLMEngine(
            EngineConfig(
                model=dataclasses.replace(cfg, quantization="int4"),
                cache=CacheConfig(page_size=128, num_pages=1024),
                scheduler=SchedulerConfig(
                    max_num_seqs=32, max_model_len=2048
                ),
            ),
            decode_horizon=256,
        )
        p32 = [
            list(rng.integers(0, 1000, size=64)) for _ in range(32)
        ]
        eng32.generate(p32, sp)  # warm
        t0 = time.time()
        outs32 = eng32.generate(p32, sp)
        dt32 = time.time() - t0
        serve["int4_bs32_toks_per_s"] = round(
            sum(len(o.outputs[0].token_ids) for o in outs32) / dt32, 1
        )
        del eng32
    except Exception as e:
        serve["int8_error"] = str(e)[:120]
    try:
        # diffusion SYSTEM latency: qwen-image family at 512^2 / 20
        # steps on the tiny random-init arch (no checkpoints on this
        # host) — measures the pipeline machinery (CFG denoise loop,
        # UniPC scheduler, tiled VAE decode), NOT the released 20B
        # model, so it is not comparable to the reference dashboard's
        # 2.21 s on 2x A100.  del the AR engines first — the 512^2
        # denoise + tiled VAE decode needs the HBM headroom.
        # free the AR engines' HBM before the 512^2 denoise + decode
        try:
            del eng4
        except NameError:
            pass
        try:
            del eng_p
        except NameError:
            pass
        try:
            del eng8
        except NameError:
            pass
        try:
            del eng32
        except NameError:
            pass
        outs8 = outs4 = outs32 = None  # drop quant-run output refs
        from ht_vllm_omni_tpu.diffusion.data import (
            DiffusionSamplingParams,
            OmniDiffusionConfig,
        )
        from ht_vllm_omni_tpu.diffusion.registry import create_pipeline

        dcfg = OmniDiffusionConfig()
        dcfg.family = "qwen-image"
        pipe = create_pipeline(dcfg)

        class _P:
            text = "a lighthouse at dusk"
            negative_text = None

        dsp = DiffusionSamplingParams(
            height=512, width=512, num_inference_steps=20,
            guidance_scale=3.0, seed=0,
        )
        pipe.generate_prompt(_P(), dsp)  # warm/compile
        t0 = time.time()
        pipe.generate_prompt(_P(), dsp)
        serve["t2i_512_tiny_s"] = round(time.time() - t0, 3)
        del pipe  # free before the DiT-block MFU microbench
    except Exception as e:
        serve["t2i_error"] = str(e)[:120]
    try:
        serve.update(dit_block_mfu())
    except Exception as e:
        serve["dit_mfu_error"] = str(e)[:120]
    print(
        json.dumps(
            {
                "metric": "qwen2.5-0.5b-bf16 decode throughput (bs8, chunked engine)",
                "value": round(toks_per_s, 1),
                "unit": "tok/s/chip",
                "vs_baseline": round(toks_per_s / BASELINE_TOKS_PER_S, 3),
                **serve,
            }
        )
    )


if __name__ == "__main__":
    main()
