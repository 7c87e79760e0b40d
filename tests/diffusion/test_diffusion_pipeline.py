"""Diffusion stage through the orchestrator + /v1/images/generations."""

import asyncio
import base64

import numpy as np

from ht_vllm_omni_tpu.config.stage_config import (
    PipelineConfig,
    StageConfig,
    StageType,
)
from ht_vllm_omni_tpu.diffusion.data import (
    DiffusionSamplingParams,
    DiTArchConfig,
    OmniDiffusionConfig,
)
from ht_vllm_omni_tpu.diffusion.diffusion_engine import DiffusionEngine
from ht_vllm_omni_tpu.engine.async_omni_engine import AsyncOmniEngine
from ht_vllm_omni_tpu.engine.orchestrator import StageHandle
from ht_vllm_omni_tpu.entrypoints.omni import Omni
from ht_vllm_omni_tpu.entrypoints.openai.api_server import OmniAPIServer
from ht_vllm_omni_tpu.inputs import OmniPrompt


def _mk_stage():
    arch = DiTArchConfig(
        hidden_size=64, num_layers=2, num_heads=4, patch_size=2,
        in_channels=4, cond_dim=64, vocab_size=64, dtype="float32",
    )
    cfg = StageConfig(
        stage_id=0, model_stage="toy_image", stage_type=StageType.DIFFUSION,
        final_output=True, final_output_type="image",
    )
    engine = DiffusionEngine(
        OmniDiffusionConfig(arch=arch),
        default_params=DiffusionSamplingParams(
            height=32, width=32, num_inference_steps=3
        ),
    )
    pipeline = PipelineConfig("toy_image", [cfg])
    pipeline.validate()
    return pipeline, [StageHandle(cfg, engine)]


def test_omni_image_generation():
    pipeline, handles = _mk_stage()
    omni = Omni(pipeline=pipeline, stages=handles)
    out = omni.generate(
        [OmniPrompt(text="sunset", additional_information={"seed": 3})]
    )[0]
    img = out.multimodal_output.get("image")
    img = img[0] if isinstance(img, list) else img
    assert img is not None and img.shape == (32, 32, 3)


def test_images_api_route():
    async def run():
        from aiohttp.test_utils import TestClient, TestServer

        pipeline, handles = _mk_stage()
        engine = AsyncOmniEngine(pipeline, handles)
        server = OmniAPIServer(engine)
        client = TestClient(TestServer(server.build_app()))
        await client.start_server()
        try:
            r = await client.post(
                "/v1/images/generations",
                json={"prompt": "a red square", "size": "32x32",
                      "num_inference_steps": 3, "seed": 5},
            )
            assert r.status == 200
            data = await r.json()
            assert len(data["data"]) == 1
            raw = base64.b64decode(data["data"][0]["b64_json"])
            img = np.frombuffer(raw, np.uint8)
            assert img.size == 32 * 32 * 3
        finally:
            await client.close()
            engine.shutdown()

    asyncio.run(run())


def test_video_job_store():
    async def run():
        import asyncio

        from aiohttp.test_utils import TestClient, TestServer

        pipeline, handles = _mk_stage()
        engine = AsyncOmniEngine(pipeline, handles)
        server = OmniAPIServer(engine)
        client = TestClient(TestServer(server.build_app()))
        await client.start_server()
        try:
            r = await client.post(
                "/v1/videos",
                json={"prompt": "waves", "num_frames": 2, "size": "32x32",
                      "num_inference_steps": 2},
            )
            assert r.status == 202
            vid = (await r.json())["id"]
            for _ in range(200):
                r = await client.get(f"/v1/videos/{vid}")
                st = await r.json()
                if st["status"] in ("completed", "failed"):
                    break
                await asyncio.sleep(0.05)
            assert st["status"] == "completed", st
            r = await client.get(f"/v1/videos/{vid}/content")
            assert r.status == 200
            raw = await r.read()
            n = int(r.headers["X-Frames"])
            h = int(r.headers["X-Height"])
            w = int(r.headers["X-Width"])
            assert (n, h, w) == (2, 32, 32)
            assert len(raw) == n * h * w * 3
            # 404 for unknown id
            r = await client.get("/v1/videos/nope")
            assert r.status == 404
        finally:
            await client.close()
            engine.shutdown()

    asyncio.run(run())
