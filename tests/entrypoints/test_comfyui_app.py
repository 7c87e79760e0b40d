"""ComfyUI app (apps/ComfyUI-HT-Omni) e2e against a real socket server:
the OmniClient + TTS/chat nodes drive the same toy pipeline as the
api-server tests, over HTTP like ComfyUI would."""

import asyncio
import pathlib
import socket
import sys
import threading

import pytest

sys.path.insert(
    0,
    str(
        pathlib.Path(__file__).resolve().parent.parent.parent
        / "apps" / "ComfyUI-HT-Omni"
    ),
)

from comfyui_ht_omni import OmniClient  # noqa: E402
from comfyui_ht_omni.nodes import HTOmniTTS, HTOmniUnderstanding  # noqa: E402

from tests.entrypoints.test_api_server import (  # noqa: E402
    FakeTokenizer,
    _mk_engine,
)

from ht_vllm_omni_tpu.entrypoints.openai.api_server import (  # noqa: E402
    OmniAPIServer,
)


@pytest.fixture(scope="module")
def live_server():
    from aiohttp import web

    def _free():
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        p_ = s.getsockname()[1]
        s.close()
        return p_

    port, port2 = _free(), _free()
    loop = asyncio.new_event_loop()
    started = threading.Event()
    runner_box = {}

    def run():
        asyncio.set_event_loop(loop)

        async def start():
            for p_, tts in ((port, True), (port2, False)):
                engine = _mk_engine(tts)
                server = OmniAPIServer(engine, FakeTokenizer())
                runner = web.AppRunner(server.build_app())
                await runner.setup()
                site = web.TCPSite(runner, "127.0.0.1", p_)
                await site.start()
                runner_box[p_] = runner
            started.set()

        loop.run_until_complete(start())
        loop.run_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert started.wait(120)
    yield (f"http://127.0.0.1:{port}", f"http://127.0.0.1:{port2}")
    loop.call_soon_threadsafe(loop.stop)


def test_client_chat_roundtrip(live_server):
    live_server = live_server[0]
    out = OmniClient(live_server).chat(
        [{"role": "user", "content": "hi there"}],
        sampling={"max_tokens": 6, "temperature": 0.0},
    )
    msg = out["choices"][0]["message"]
    # a TTS pipeline's chat reply carries audio (content may be empty)
    assert msg.get("content") or msg.get("audio")


def test_tts_node_produces_audio(live_server):
    (audio,) = HTOmniTTS().run(live_server[0], "hello", "default")
    wav = audio["waveform"]
    assert wav.ndim == 3 and wav.shape[-1] > 0
    assert audio["sample_rate"] > 0


def test_understanding_node(live_server):
    # the text pipeline's chat reply carries content
    (text,) = HTOmniUnderstanding().run(
        live_server[1], "describe", sampling_params={"max_tokens": 6}
    )
    assert isinstance(text, str) and text
