"""Chat-completions tool calling + stop sequences through the API
server (reference serving_chat.py tool flow via vLLM Hermes parsers)."""

import json

import jax
import pytest
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
from ht_vllm_omni_tpu.engine.llm_engine import LLMEngine
from ht_vllm_omni_tpu.engine.orchestrator import StageHandle
from ht_vllm_omni_tpu.entrypoints.openai.api_server import OmniAPIServer
from ht_vllm_omni_tpu.models import qwen2

TOOL_TEXT = (
    'Checking.\n<tool_call>\n{"name": "get_weather", '
    '"arguments": {"city": "Paris"}}\n</tool_call>'
)


class CannedTokenizer:
    """decode() returns scripted text pieces regardless of ids — the
    server-side parsing logic is what's under test, not the model."""

    def __init__(self, pieces):
        self.pieces = list(pieces)
        self.i = 0

    def encode(self, text):
        return [ord(c) % 60 for c in text][:16] or [1]

    def decode(self, ids):
        if self.i < len(self.pieces):
            self.i += 1
            return self.pieces[self.i - 1]
        return ""


def _mk_engine():
    cfg = ModelArchConfig(
        model_type="qwen2", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, dtype="float32", tie_word_embeddings=True,
        eos_token_id=-1,
    )
    params = qwen2.init_params(cfg, jax.random.PRNGKey(3))
    ar = LLMEngine(
        EngineConfig(
            model=cfg,
            cache=CacheConfig(page_size=16, num_pages=64),
            scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=128),
        ),
        params=params,
        decode_horizon=4,
    )
    s0 = StageConfig(
        stage_id=0, model_stage="llm", worker_type="ar",
        final_output=True, final_output_type="text",
        default_sampling_params={"temperature": 0.0, "max_tokens": 8},
    )
    pipeline = PipelineConfig("toy_llm", [s0])
    pipeline.validate()
    return AsyncOmniEngine(pipeline, [StageHandle(s0, ar)])


async def _client(tokenizer):
    engine = _mk_engine()
    server = OmniAPIServer(engine, tokenizer)
    client = TestClient(TestServer(server.build_app()))
    await client.start_server()
    return client, engine

TOOLS = [
    {
        "type": "function",
        "function": {
            "name": "get_weather",
            "parameters": {
                "type": "object",
                "properties": {"city": {"type": "string"}},
            },
        },
    }
]


def _run(coro):
    import asyncio

    return asyncio.run(coro)


def test_chat_tool_calls_nonstream():
    async def go():
        client, engine = await _client(CannedTokenizer([TOOL_TEXT]))
        try:
            r = await client.post(
                "/v1/chat/completions",
                json={
                    "messages": [{"role": "user", "content": "weather?"}],
                    "tools": TOOLS,
                    "max_tokens": 4,
                },
            )
            assert r.status == 200
            body = await r.json()
            choice = body["choices"][0]
            assert choice["finish_reason"] == "tool_calls"
            calls = choice["message"]["tool_calls"]
            assert len(calls) == 1
            assert calls[0]["function"]["name"] == "get_weather"
            assert json.loads(calls[0]["function"]["arguments"]) == {
                "city": "Paris"
            }
            assert choice["message"]["content"] == "Checking."
        finally:
            await client.close()
            engine.shutdown()

    _run(go())


def test_chat_tool_calls_stream():
    async def go():
        pieces = [TOOL_TEXT]  # split delivery covered by parser unit tests
        client, engine = await _client(CannedTokenizer(pieces))
        try:
            r = await client.post(
                "/v1/chat/completions",
                json={
                    "messages": [{"role": "user", "content": "weather?"}],
                    "tools": TOOLS,
                    "max_tokens": 6,
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
            name = None
            args = ""
            content = ""
            finish = None
            for c in chunks:
                ch = c["choices"][0]
                d = ch.get("delta", {})
                if d.get("content"):
                    content += d["content"]
                for tc in d.get("tool_calls", []) or []:
                    fn = tc.get("function", {})
                    if fn.get("name"):
                        name = fn["name"]
                    args += fn.get("arguments", "")
                if ch.get("finish_reason"):
                    finish = ch["finish_reason"]
            assert name == "get_weather"
            assert json.loads(args) == {"city": "Paris"}
            assert "Checking." in content
            assert finish == "tool_calls"
        finally:
            await client.close()
            engine.shutdown()

    _run(go())


@pytest.mark.parametrize("stream", [False, True])
def test_chat_stop_string(stream):
    async def go():
        pieces = (
            ["hello STO", "P world more text"]
            if stream
            else ["hello STOP world more text"]  # one decode() call
        )
        client, engine = await _client(CannedTokenizer(pieces))
        try:
            r = await client.post(
                "/v1/chat/completions",
                json={
                    "messages": [{"role": "user", "content": "hi"}],
                    "stop": ["STOP"],
                    "max_tokens": 6,
                    "stream": stream,
                },
            )
            assert r.status == 200
            if stream:
                raw = (await r.read()).decode()
                chunks = [
                    json.loads(line[6:])
                    for line in raw.splitlines()
                    if line.startswith("data: ")
                    and line != "data: [DONE]"
                ]
                content = "".join(
                    c["choices"][0].get("delta", {}).get("content") or ""
                    for c in chunks
                )
                finishes = [
                    c["choices"][0].get("finish_reason")
                    for c in chunks
                    if c["choices"][0].get("finish_reason")
                ]
                assert content == "hello "
                assert finishes and finishes[-1] == "stop"
            else:
                body = await r.json()
                choice = body["choices"][0]
                assert choice["message"]["content"] == "hello "
                assert choice["finish_reason"] == "stop"
        finally:
            await client.close()
            engine.shutdown()

    _run(go())


def test_streaming_completions():
    async def go():
        client, engine = await _client(
            CannedTokenizer(["hello wor", "ld STOP tail"])
        )
        try:
            r = await client.post(
                "/v1/completions",
                json={
                    "prompt": [2, 5, 9],
                    "max_tokens": 8,
                    "stream": True,
                    "stop": ["STOP"],
                },
            )
            assert r.status == 200
            raw = (await r.read()).decode()
            chunks = [
                json.loads(line[6:])
                for line in raw.splitlines()
                if line.startswith("data: ") and line != "data: [DONE]"
            ]
            text = "".join(c["choices"][0]["text"] for c in chunks)
            finishes = [
                c["choices"][0].get("finish_reason")
                for c in chunks
                if c["choices"][0].get("finish_reason")
            ]
            assert text == "hello world "
            assert finishes and finishes[-1] == "stop"
            assert raw.rstrip().endswith("data: [DONE]")
        finally:
            await client.close()
            engine.shutdown()

    _run(go())
