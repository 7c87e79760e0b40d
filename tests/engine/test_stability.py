"""dfx-style stability: sustained concurrent load on the async engine
(reference tests/dfx/stability + test_multiproc_engine_concurrency)."""

import asyncio

import jax
import numpy as np

from ht_vllm_omni_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelArchConfig,
    SchedulerConfig,
)
from ht_vllm_omni_tpu.config.stage_config import PipelineConfig, StageConfig
from ht_vllm_omni_tpu.engine.async_omni_engine import AsyncOmniEngine
from ht_vllm_omni_tpu.engine.llm_engine import LLMEngine
from ht_vllm_omni_tpu.engine.orchestrator import StageHandle
from ht_vllm_omni_tpu.models import qwen2
from ht_vllm_omni_tpu.sampling_params import SamplingParams


def test_sustained_concurrent_load_with_aborts():
    async def run():
        cfg = ModelArchConfig(
            model_type="qwen2", vocab_size=64, hidden_size=32,
            intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, dtype="float32",
            tie_word_embeddings=True, eos_token_id=1,
        )
        params = qwen2.init_params(cfg, jax.random.PRNGKey(61))
        ar = LLMEngine(
            EngineConfig(
                model=cfg,
                cache=CacheConfig(page_size=16, num_pages=48),
                scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=96),
            ),
            params=params,
            decode_horizon=4,
        )
        stage = StageConfig(
            stage_id=0, model_stage="llm", worker_type="ar",
            final_output=True, final_output_type="text",
        )
        pipeline = PipelineConfig("llm", [stage])
        pipeline.validate()
        engine = AsyncOmniEngine(pipeline, [StageHandle(stage, ar)])
        rng = np.random.default_rng(0)

        async def one(i):
            prompt = list(rng.integers(2, 60, size=int(rng.integers(2, 20))))
            sp = SamplingParams(
                temperature=0.5 if i % 2 else 0.0,
                max_tokens=int(rng.integers(4, 24)),
                ignore_eos=bool(i % 3),
                seed=i,
            )
            rid = f"load-{i}"
            if i % 7 == 3:
                # fire-and-abort midway
                agen = engine.generate(prompt, sp, rid)
                await agen.__anext__()
                await engine.abort(rid)
                return "aborted"
            last = None
            async for out in engine.generate(prompt, sp, rid):
                last = out
            assert last is not None and last.finished
            assert last.error is None
            return len(last.outputs[0].token_ids)

        results = await asyncio.gather(*[one(i) for i in range(40)])
        done = [r for r in results if r != "aborted"]
        assert len(done) >= 30
        assert all(isinstance(r, int) and r > 0 for r in done)
        # engine drained: no leaked requests or pages
        await asyncio.sleep(0.2)
        assert not ar.has_unfinished_requests()
        assert ar.scheduler.pool.num_free == 48
        assert len(ar.runner._free_slots) == 4
        engine.shutdown()

    asyncio.run(run())


def test_disconnect_aborts_request():
    """Closing the async generator mid-stream (client disconnect) must
    abort the pipeline request so pages/slots are reclaimed."""

    async def run():
        cfg = ModelArchConfig(
            model_type="qwen2", vocab_size=64, hidden_size=32,
            intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, dtype="float32",
            tie_word_embeddings=True, eos_token_id=1,
        )
        params = qwen2.init_params(cfg, jax.random.PRNGKey(62))
        ar = LLMEngine(
            EngineConfig(
                model=cfg,
                cache=CacheConfig(page_size=16, num_pages=48),
                scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=96),
            ),
            params=params,
            decode_horizon=4,
        )
        stage = StageConfig(
            stage_id=0, model_stage="llm", worker_type="ar",
            final_output=True, final_output_type="text",
        )
        pipeline = PipelineConfig("llm", [stage])
        pipeline.validate()
        engine = AsyncOmniEngine(pipeline, [StageHandle(stage, ar)])
        sp = SamplingParams(temperature=0.0, max_tokens=64, ignore_eos=True)
        agen = engine.generate([2, 3, 4], sp, "dc-0")
        await agen.__anext__()  # stream started
        await agen.aclose()  # client went away WITHOUT calling abort()
        # the request must disappear from the orchestrator + AR engine
        for _ in range(100):
            if (
                "dc-0" not in engine.orchestrator.requests
                and not ar.has_unfinished_requests()
            ):
                break
            await asyncio.sleep(0.02)
        assert "dc-0" not in engine.orchestrator.requests
        assert not ar.has_unfinished_requests()
        assert ar.scheduler.pool.num_free == 48
        engine.shutdown()

    asyncio.run(run())
