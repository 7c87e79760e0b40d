"""WebSocket incremental-text TTS session.

Counterpart of the reference OmniStreamingSpeechHandler (reference
vllm_omni/entrypoints/openai/serving_speech_stream.py:48 and its
protocol, :1-18): the client sends text increments; the server splits
them into sentences, runs one TTS pipeline request per sentence, and
streams binary audio frames back, bracketed by ``audio.start`` /
``audio.done`` JSON events and a final ``session.done``.

Protocol (JSON text frames unless noted):
  client -> {"type": "session.start", "voice": ..., "sample_rate": ...}
  client -> {"type": "text.delta", "text": "..."}           (repeatable)
  client -> {"type": "session.end"}
  server -> {"type": "audio.start", "sentence": "..."}
  server -> <binary pcm16 frames>
  server -> {"type": "audio.done"}
  server -> {"type": "session.done"}
"""

from __future__ import annotations

import json
import logging
import re
import uuid

import numpy as np
from aiohttp import WSMsgType, web

from ht_vllm_omni_tpu.entrypoints.openai.audio_utils import float_to_pcm16
from ht_vllm_omni_tpu.inputs import OmniPrompt

logger = logging.getLogger(__name__)

# sentence-final punctuation (reference text_splitter SPLIT_SENTENCE)
_SENTENCE_RE = re.compile(r"(.+?[.!?。！？;；\n])", re.S)


def split_sentences(buffer: str, *, final: bool) -> tuple[list[str], str]:
    """Extract complete sentences; returns (sentences, remainder)."""
    sentences = []
    rest = buffer
    while True:
        m = _SENTENCE_RE.match(rest)
        if not m:
            break
        sentences.append(m.group(1).strip())
        rest = rest[m.end():]
    if final and rest.strip():
        sentences.append(rest.strip())
        rest = ""
    return [s for s in sentences if s], rest


class StreamingSpeechHandler:
    def __init__(self, server) -> None:
        self.server = server  # OmniAPIServer

    async def handle(self, request: web.Request) -> web.WebSocketResponse:
        ws = web.WebSocketResponse()
        await ws.prepare(request)
        buffer = ""
        voice = "default"
        session = f"ws-{uuid.uuid4().hex[:16]}"
        n = 0
        async for msg in ws:
            if msg.type != WSMsgType.TEXT:
                continue
            try:
                event = json.loads(msg.data)
            except json.JSONDecodeError:
                await ws.send_json(
                    {"type": "error", "message": "invalid json"}
                )
                continue
            etype = event.get("type")
            if etype == "session.start":
                voice = event.get("voice", "default")
                if voice not in self.server.voices:
                    await ws.send_json(
                        {"type": "error",
                         "message": f"unknown voice {voice!r}"}
                    )
                continue
            if etype == "text.delta":
                buffer += event.get("text", "")
                sentences, buffer = split_sentences(buffer, final=False)
                for s in sentences:
                    n = await self._speak(ws, s, voice, f"{session}-{n}", n)
            elif etype == "session.end":
                sentences, buffer = split_sentences(buffer, final=True)
                for s in sentences:
                    n = await self._speak(ws, s, voice, f"{session}-{n}", n)
                await ws.send_json({"type": "session.done"})
                break
        await ws.close()
        return ws

    async def _speak(
        self, ws, sentence: str, voice: str, request_id: str, n: int
    ) -> int:
        await ws.send_json({"type": "audio.start", "sentence": sentence})
        tokenizer = self.server.tokenizer
        token_ids = (
            tokenizer.encode(sentence)
            if tokenizer is not None
            else [ord(c) % 256 for c in sentence]
        )
        prompt = OmniPrompt(
            token_ids=token_ids,
            additional_information={"voice": voice},
        )
        sent = 0
        async for out in self.server.engine.generate(
            prompt, None, request_id
        ):
            if out.error:
                await ws.send_json(
                    {"type": "error", "message": out.error}
                )
                break
            if not out.final_output:
                continue
            audio = out.consolidated_multimodal("audio")
            if audio is None:
                continue
            delta = np.asarray(audio)[sent:]
            sent = len(audio)
            if delta.size:
                await ws.send_bytes(float_to_pcm16(delta))
        await ws.send_json({"type": "audio.done"})
        return n + 1
