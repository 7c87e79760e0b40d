"""Chat n>1 choices + image-output chat messages (reference
serving_chat.py _create_image_choice / n choices)."""

import base64
import io
import json

import jax
import numpy as np
from aiohttp.test_utils import TestClient, TestServer

from ht_vllm_omni_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelArchConfig,
    SchedulerConfig,
)
from ht_vllm_omni_tpu.config.stage_config import (
    PipelineConfig,
    StageConfig,
)
from ht_vllm_omni_tpu.engine.async_omni_engine import AsyncOmniEngine
from ht_vllm_omni_tpu.engine.generation_engine import GenerationEngine
from ht_vllm_omni_tpu.engine.llm_engine import LLMEngine
from ht_vllm_omni_tpu.engine.orchestrator import StageHandle
from ht_vllm_omni_tpu.entrypoints.openai.api_server import OmniAPIServer
from ht_vllm_omni_tpu.models import qwen2


class FakeTokenizer:
    def encode(self, text):
        return [ord(c) % 60 for c in text][:16] or [1]

    def decode(self, ids):
        return "".join(chr(97 + (i % 26)) for i in ids)


def _ar_engine():
    cfg = ModelArchConfig(
        model_type="qwen2", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, dtype="float32", tie_word_embeddings=True,
        eos_token_id=-1,
    )
    params = qwen2.init_params(cfg, jax.random.PRNGKey(3))
    return LLMEngine(
        EngineConfig(
            model=cfg,
            cache=CacheConfig(page_size=16, num_pages=64),
            scheduler=SchedulerConfig(max_num_seqs=8, max_model_len=128),
        ),
        params=params,
        decode_horizon=4,
    )


def _imager(token_ids, prompt_embeds, info, state):
    h = np.zeros((8, 8, 3), np.uint8)
    h[:, :, 0] = 200
    return {"image": h}


def _run(coro):
    import asyncio

    return asyncio.run(coro)


def test_chat_n_choices():
    async def go():
        s0 = StageConfig(
            stage_id=0, model_stage="llm", worker_type="ar",
            final_output=True, final_output_type="text",
            default_sampling_params={"temperature": 0.0, "max_tokens": 6},
        )
        pipeline = PipelineConfig("toy_llm", [s0])
        pipeline.validate()
        engine = AsyncOmniEngine(
            pipeline, [StageHandle(s0, _ar_engine())]
        )
        server = OmniAPIServer(engine, FakeTokenizer())
        client = TestClient(TestServer(server.build_app()))
        await client.start_server()
        try:
            r = await client.post(
                "/v1/chat/completions",
                json={
                    "messages": [{"role": "user", "content": "hi"}],
                    "max_tokens": 5,
                    "n": 3,
                },
            )
            assert r.status == 200
            body = await r.json()
            assert [c["index"] for c in body["choices"]] == [0, 1, 2]
            for c in body["choices"]:
                assert isinstance(c["message"]["content"], str)
                assert c["message"]["content"]
        finally:
            await client.close()
            engine.shutdown()

    _run(go())


def test_chat_image_output():
    async def go():
        s0 = StageConfig(
            stage_id=0, model_stage="llm", worker_type="ar",
            is_comprehension=True,
            default_sampling_params={"temperature": 0.0, "max_tokens": 4},
        )
        s1 = StageConfig(
            stage_id=1, model_stage="imager", worker_type="generation",
            input_sources=[0], final_output=True,
            final_output_type="image",
        )
        pipeline = PipelineConfig("toy_t2i", [s0, s1])
        pipeline.validate()
        engine = AsyncOmniEngine(
            pipeline,
            [
                StageHandle(s0, _ar_engine()),
                StageHandle(s1, GenerationEngine(_imager)),
            ],
        )
        server = OmniAPIServer(engine, FakeTokenizer())
        client = TestClient(TestServer(server.build_app()))
        await client.start_server()
        try:
            r = await client.post(
                "/v1/chat/completions",
                json={
                    "messages": [{"role": "user", "content": "a cat"}],
                    "max_tokens": 4,
                },
            )
            assert r.status == 200
            body = await r.json()
            content = body["choices"][0]["message"]["content"]
            assert isinstance(content, list)
            img_parts = [
                p for p in content if p.get("type") == "image_url"
            ]
            assert len(img_parts) == 1
            url = img_parts[0]["image_url"]["url"]
            assert url.startswith("data:image/png;base64,")
            from PIL import Image

            raw = base64.b64decode(url.split(",", 1)[1])
            img = Image.open(io.BytesIO(raw))
            arr = np.asarray(img)
            assert arr.shape == (8, 8, 3)
            assert (arr[:, :, 0] == 200).all()
        finally:
            await client.close()
            engine.shutdown()

    _run(go())


def test_chat_streaming_n_choices():
    async def go():
        s0 = StageConfig(
            stage_id=0, model_stage="llm", worker_type="ar",
            final_output=True, final_output_type="text",
            default_sampling_params={"temperature": 0.0, "max_tokens": 5},
        )
        pipeline = PipelineConfig("toy_llm", [s0])
        pipeline.validate()
        engine = AsyncOmniEngine(
            pipeline, [StageHandle(s0, _ar_engine())]
        )
        server = OmniAPIServer(engine, FakeTokenizer())
        client = TestClient(TestServer(server.build_app()))
        await client.start_server()
        try:
            r = await client.post(
                "/v1/chat/completions",
                json={
                    "messages": [{"role": "user", "content": "hi"}],
                    "max_tokens": 4,
                    "n": 3,
                    "stream": True,
                },
            )
            assert r.status == 200
            raw = (await r.read()).decode()
            chunks = [
                json.loads(line[6:])
                for line in raw.splitlines()
                if line.startswith("data: ") and line != "data: [DONE]"
            ]
            text = {0: "", 1: "", 2: ""}
            finishes = set()
            for c in chunks:
                ch = c["choices"][0]
                idx = ch["index"]
                d = ch.get("delta", {})
                if d.get("content"):
                    text[idx] += d["content"]
                if ch.get("finish_reason"):
                    finishes.add(idx)
            assert finishes == {0, 1, 2}
            assert all(text[i] for i in range(3)), text
            assert raw.rstrip().endswith("data: [DONE]")
        finally:
            await client.close()
            engine.shutdown()

    _run(go())
