"""HTTP client for an ht-vllm-omni-tpu OpenAI-compatible server.

Counterpart of the reference's ComfyUI api_client (reference
apps/ComfyUI-vLLM-Omni/comfyui_vllm_omni/utils/api_client.py) written
against THIS repo's routes (entrypoints/openai/api_server.py): chat
completions, /v1/audio/speech (+voices), /v1/images/generations|edits,
and the /v1/videos job store (create -> poll -> content).  Pure
stdlib + requests-free (urllib), so the nodes import anywhere ComfyUI
runs."""

from __future__ import annotations

import base64
import json
import time
import urllib.error
import urllib.request


class OmniClient:
    def __init__(self, base_url: str, timeout: float = 600.0) -> None:
        self.base = base_url.rstrip("/")
        self.timeout = timeout

    # ------------------------------------------------------------- http
    def _post(self, path: str, payload: dict) -> dict | bytes:
        req = urllib.request.Request(
            self.base + path,
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            body = r.read()
            ctype = r.headers.get("Content-Type", "")
        if "application/json" in ctype:
            return json.loads(body)
        return body

    def _get(self, path: str) -> dict | bytes:
        with urllib.request.urlopen(
            self.base + path, timeout=self.timeout
        ) as r:
            body = r.read()
            ctype = r.headers.get("Content-Type", "")
        if "application/json" in ctype:
            return json.loads(body)
        return body

    # ------------------------------------------------------------ chat
    def chat(
        self, messages: list[dict], model: str = "default",
        sampling: dict | None = None,
    ) -> dict:
        payload = {"model": model, "messages": messages}
        payload.update(sampling or {})
        return self._post("/v1/chat/completions", payload)

    # ------------------------------------------------------------- tts
    def speech(
        self, text: str, voice: str = "default",
        speaker_embedding_b64: str | None = None,
        extra: dict | None = None,
    ) -> bytes:
        payload = {"input": text, "voice": voice}
        if speaker_embedding_b64:
            payload["speaker_embedding"] = speaker_embedding_b64
        payload.update(extra or {})
        out = self._post("/v1/audio/speech", payload)
        if isinstance(out, dict):  # base64 JSON response mode
            return base64.b64decode(out["audio"])
        return out

    def voices(self) -> list:
        out = self._get("/v1/audio/voices")
        return out.get("voices", out) if isinstance(out, dict) else out

    # ----------------------------------------------------------- image
    def image(
        self, prompt: str, size: str = "512x512", n: int = 1,
        extra: dict | None = None,
    ) -> list[bytes]:
        payload = {"prompt": prompt, "size": size, "n": n}
        payload.update(extra or {})
        out = self._post("/v1/images/generations", payload)
        return [
            base64.b64decode(d["b64_json"]) for d in out.get("data", [])
        ]

    # ----------------------------------------------------------- video
    def video(
        self, prompt: str, poll_s: float = 2.0,
        timeout_s: float = 3600.0, extra: dict | None = None,
    ) -> bytes:
        payload = {"prompt": prompt}
        payload.update(extra or {})
        job = self._post("/v1/videos", payload)
        vid = job["id"]
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            st = self._get(f"/v1/videos/{vid}")
            status = st.get("status")
            if status == "completed":
                return self._get(f"/v1/videos/{vid}/content")
            if status in ("failed", "error"):
                raise RuntimeError(
                    f"video job {vid} failed: {st.get('error')}"
                )
            time.sleep(poll_s)
        raise TimeoutError(f"video job {vid} still running")
