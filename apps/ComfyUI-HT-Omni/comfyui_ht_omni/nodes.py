"""ComfyUI custom nodes for ht-vllm-omni-tpu servers.

Node surface mirrors the reference's ComfyUI-vLLM-Omni package
(reference apps/ComfyUI-vLLM-Omni/comfyui_vllm_omni/nodes.py classes:
GenerateImage / GenerateVideo / Understanding / TTS / VoiceClone +
sampling-param builders), re-implemented against this repo's server
routes via comfyui_ht_omni.client.OmniClient.

Tensor conventions (ComfyUI): IMAGE = float32 torch tensor
[B, H, W, C] in [0, 1]; AUDIO = {"waveform": [B, C, T] float32,
"sample_rate": int}.  torch is only needed at execution time."""

from __future__ import annotations

import base64
import io
import json

from .client import OmniClient

_CATEGORY = "HT-Omni-TPU"


def _torch():
    import torch

    return torch


class _Base:
    CATEGORY = _CATEGORY
    FUNCTION = "run"

    @staticmethod
    def _client(server_url):
        return OmniClient(server_url)


class HTOmniARSampling(_Base):
    """AR sampling params (temperature/top_k/top_p/max_tokens) as a
    reusable socket, like the reference's VLLMOmniARSampling."""

    CATEGORY = _CATEGORY + "/Sampling"
    RETURN_TYPES = ("SAMPLING_PARAMS",)

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "temperature": ("FLOAT", {"default": 0.7, "min": 0.0,
                                          "max": 2.0, "step": 0.05}),
                "top_p": ("FLOAT", {"default": 0.95, "min": 0.0,
                                    "max": 1.0, "step": 0.01}),
                "top_k": ("INT", {"default": 50, "min": 0, "max": 1000}),
                "max_tokens": ("INT", {"default": 512, "min": 1,
                                       "max": 32768}),
                "seed": ("INT", {"default": 0, "min": 0,
                                 "max": 2**31 - 1}),
            }
        }

    def run(self, temperature, top_p, top_k, max_tokens, seed):
        return ({
            "temperature": temperature, "top_p": top_p, "top_k": top_k,
            "max_tokens": max_tokens, "seed": seed,
        },)


class HTOmniDiffusionSampling(_Base):
    """Diffusion sampling params (steps/cfg/negative prompt/size)."""

    CATEGORY = _CATEGORY + "/Sampling"
    RETURN_TYPES = ("SAMPLING_PARAMS",)

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "num_inference_steps": ("INT", {"default": 30, "min": 1,
                                                "max": 200}),
                "guidance_scale": ("FLOAT", {"default": 4.0, "min": 0.0,
                                             "max": 30.0, "step": 0.1}),
                "negative_prompt": ("STRING", {"default": ""}),
                "seed": ("INT", {"default": 0, "min": 0,
                                 "max": 2**31 - 1}),
            }
        }

    def run(self, num_inference_steps, guidance_scale, negative_prompt,
            seed):
        return ({
            "num_inference_steps": num_inference_steps,
            "guidance_scale": guidance_scale,
            "negative_prompt": negative_prompt or None,
            "seed": seed,
        },)


class HTOmniUnderstanding(_Base):
    """Multimodal chat: text (+optional image) in, text out."""

    RETURN_TYPES = ("STRING",)

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "server_url": ("STRING",
                               {"default": "http://127.0.0.1:8000"}),
                "prompt": ("STRING", {"multiline": True,
                                      "default": "Describe the image."}),
            },
            "optional": {
                "image": ("IMAGE",),
                "system_prompt": ("STRING", {"default": ""}),
                "sampling_params": ("SAMPLING_PARAMS",),
            },
        }

    def run(self, server_url, prompt, image=None, system_prompt="",
            sampling_params=None):
        content: list | str = prompt
        if image is not None:
            torch = _torch()
            import numpy as np

            arr = (
                (image[0].cpu().numpy() * 255).clip(0, 255)
                .astype(np.uint8)
            )
            try:
                from PIL import Image as PILImage

                buf = io.BytesIO()
                PILImage.fromarray(arr).save(buf, format="PNG")
                b64 = base64.b64encode(buf.getvalue()).decode()
                url = f"data:image/png;base64,{b64}"
            except ImportError:
                url = "data:application/octet-stream;base64," + (
                    base64.b64encode(arr.tobytes()).decode()
                )
            content = [
                {"type": "image_url", "image_url": {"url": url}},
                {"type": "text", "text": prompt},
            ]
        messages = []
        if system_prompt:
            messages.append({"role": "system", "content": system_prompt})
        messages.append({"role": "user", "content": content})
        out = self._client(server_url).chat(
            messages, sampling=sampling_params
        )
        return (out["choices"][0]["message"]["content"],)


class HTOmniTTS(_Base):
    """Text -> speech through /v1/audio/speech."""

    RETURN_TYPES = ("AUDIO",)

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "server_url": ("STRING",
                               {"default": "http://127.0.0.1:8000"}),
                "text": ("STRING", {"multiline": True,
                                    "default": "Hello from the TPU."}),
                "voice": ("STRING", {"default": "default"}),
            },
            "optional": {"sampling_params": ("SAMPLING_PARAMS",)},
        }

    def run(self, server_url, text, voice, sampling_params=None):
        raw = self._client(server_url).speech(
            text, voice=voice, extra=sampling_params
        )
        return (_wav_to_audio(raw),)


class HTOmniVoiceClone(_Base):
    """Voice cloning: reference audio -> speaker embedding -> speech."""

    RETURN_TYPES = ("AUDIO",)

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "server_url": ("STRING",
                               {"default": "http://127.0.0.1:8000"}),
                "text": ("STRING", {"multiline": True, "default": ""}),
                "reference_audio": ("AUDIO",),
            },
        }

    def run(self, server_url, text, reference_audio):
        wav = reference_audio["waveform"][0, 0].cpu().numpy()
        b64 = base64.b64encode(
            wav.astype("float32").tobytes()
        ).decode()
        raw = self._client(server_url).speech(
            text, speaker_embedding_b64=b64
        )
        return (_wav_to_audio(raw),)


class HTOmniGenerateImage(_Base):
    """Text -> image through /v1/images/generations."""

    RETURN_TYPES = ("IMAGE",)

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "server_url": ("STRING",
                               {"default": "http://127.0.0.1:8000"}),
                "prompt": ("STRING", {"multiline": True, "default": ""}),
                "width": ("INT", {"default": 512, "min": 64,
                                  "max": 4096, "step": 64}),
                "height": ("INT", {"default": 512, "min": 64,
                                   "max": 4096, "step": 64}),
            },
            "optional": {"sampling_params": ("SAMPLING_PARAMS",)},
        }

    def run(self, server_url, prompt, width, height,
            sampling_params=None):
        blobs = self._client(server_url).image(
            prompt, size=f"{width}x{height}", extra=sampling_params
        )
        torch = _torch()
        import numpy as np

        imgs = []
        for blob in blobs:
            from PIL import Image as PILImage

            img = PILImage.open(io.BytesIO(blob)).convert("RGB")
            imgs.append(
                torch.from_numpy(
                    np.asarray(img, dtype=np.float32) / 255.0
                )
            )
        return (torch.stack(imgs),)


class HTOmniGenerateVideo(_Base):
    """Text -> video via the /v1/videos job store (poll to done)."""

    RETURN_TYPES = ("STRING",)  # path to the saved video file
    OUTPUT_NODE = True

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "server_url": ("STRING",
                               {"default": "http://127.0.0.1:8000"}),
                "prompt": ("STRING", {"multiline": True, "default": ""}),
                "filename": ("STRING", {"default": "ht_omni_video.mp4"}),
            },
            "optional": {"sampling_params": ("SAMPLING_PARAMS",)},
        }

    def run(self, server_url, prompt, filename, sampling_params=None):
        blob = self._client(server_url).video(
            prompt, extra=sampling_params
        )
        with open(filename, "wb") as f:
            f.write(blob)
        return (filename,)


def _wav_to_audio(raw: bytes) -> dict:
    """WAV bytes (or raw f32 JSON fallback) -> ComfyUI AUDIO dict."""
    torch = _torch()
    import numpy as np

    sr = 24000
    if raw[:4] == b"RIFF":
        import wave

        with wave.open(io.BytesIO(raw)) as w:
            sr = w.getframerate()
            n = w.getnframes()
            width = w.getsampwidth()
            data = w.readframes(n)
        if width == 2:
            wav = (
                np.frombuffer(data, np.int16).astype(np.float32) / 32768.0
            )
        else:
            wav = np.frombuffer(data, np.float32)
    else:
        try:
            obj = json.loads(raw.decode())
            wav = np.asarray(obj["audio"], np.float32)
            sr = int(obj.get("sample_rate", sr))
        except Exception:
            wav = np.frombuffer(raw, np.float32)
    return {
        "waveform": torch.from_numpy(wav.copy())[None, None, :],
        "sample_rate": sr,
    }


NODE_CLASS_MAPPINGS = {
    "HTOmniUnderstanding": HTOmniUnderstanding,
    "HTOmniTTS": HTOmniTTS,
    "HTOmniVoiceClone": HTOmniVoiceClone,
    "HTOmniGenerateImage": HTOmniGenerateImage,
    "HTOmniGenerateVideo": HTOmniGenerateVideo,
    "HTOmniARSampling": HTOmniARSampling,
    "HTOmniDiffusionSampling": HTOmniDiffusionSampling,
}

NODE_DISPLAY_NAME_MAPPINGS = {
    "HTOmniUnderstanding": "HT-Omni Understanding (chat)",
    "HTOmniTTS": "HT-Omni TTS",
    "HTOmniVoiceClone": "HT-Omni Voice Clone",
    "HTOmniGenerateImage": "HT-Omni Generate Image",
    "HTOmniGenerateVideo": "HT-Omni Generate Video",
    "HTOmniARSampling": "HT-Omni AR Sampling Params",
    "HTOmniDiffusionSampling": "HT-Omni Diffusion Sampling Params",
}
