"""WebSocket TTS session + batch speech + voice upload."""

import asyncio
import base64
import json

import numpy as np
from aiohttp import WSMsgType
from aiohttp.test_utils import TestClient, TestServer

from tests.entrypoints.test_api_server import FakeTokenizer, _mk_engine
from ht_vllm_omni_tpu.entrypoints.openai.api_server import OmniAPIServer
from ht_vllm_omni_tpu.entrypoints.openai.serving_speech_stream import (
    split_sentences,
)


def test_split_sentences():
    s, rest = split_sentences("Hello there. How are", final=False)
    assert s == ["Hello there."] and rest == " How are"
    s, rest = split_sentences(" How are you", final=True)
    assert s == ["How are you"] and rest == ""
    s, rest = split_sentences("你好。还在吗？嗯", final=False)
    assert s == ["你好。", "还在吗？"] and rest == "嗯"


def test_websocket_tts_session():
    async def run():
        engine = _mk_engine(True)
        server = OmniAPIServer(engine, FakeTokenizer())
        client = TestClient(TestServer(server.build_app()))
        await client.start_server()
        try:
            ws = await client.ws_connect("/v1/audio/speech/stream")
            await ws.send_json({"type": "session.start", "voice": "default"})
            await ws.send_json({"type": "text.delta", "text": "Hi there. And"})
            await ws.send_json({"type": "text.delta", "text": " more"})
            await ws.send_json({"type": "session.end"})
            events, audio_bytes = [], b""
            while True:
                msg = await ws.receive(timeout=30)
                if msg.type == WSMsgType.TEXT:
                    ev = json.loads(msg.data)
                    events.append(ev["type"])
                    if ev["type"] == "session.done":
                        break
                elif msg.type == WSMsgType.BINARY:
                    audio_bytes += msg.data
                else:
                    break
            await ws.close()
            # two sentences -> two audio.start/done pairs
            assert events.count("audio.start") == 2
            assert events.count("audio.done") == 2
            assert events[-1] == "session.done"
            assert len(audio_bytes) > 0 and len(audio_bytes) % 2 == 0
        finally:
            await client.close()
            engine.shutdown()

    asyncio.run(run())


def test_batch_speech_and_voice_upload():
    async def run():
        engine = _mk_engine(True)
        server = OmniAPIServer(engine, FakeTokenizer())
        client = TestClient(TestServer(server.build_app()))
        await client.start_server()
        try:
            r = await client.post(
                "/v1/audio/voices",
                json={"name": "alice",
                      "speaker_embedding": [0.1] * 8},
            )
            assert (await r.json())["ok"]
            r = await client.get("/v1/audio/voices")
            assert "alice" in (await r.json())["voices"]

            r = await client.post(
                "/v1/audio/speech/batch",
                json={"inputs": ["one", "two"], "voice": "alice"},
            )
            assert r.status == 200
            data = await r.json()
            assert len(data["data"]) == 2
            pcm = np.frombuffer(
                base64.b64decode(data["data"][0]["audio_b64"]), "<i2"
            )
            assert pcm.size > 0
        finally:
            await client.close()
            engine.shutdown()

    asyncio.run(run())
