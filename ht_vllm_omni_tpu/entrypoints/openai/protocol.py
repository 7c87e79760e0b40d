"""Request/response models for the OpenAI-compatible routes.

Mirrors the reference's protocol surface (reference
vllm_omni/entrypoints/openai/protocol/): chat completions with
per-modality extensions, TTS speech requests (voice / response_format /
stream), image generation requests.
"""

from __future__ import annotations

from typing import Any, Literal

import pydantic


class ChatMessage(pydantic.BaseModel):
    role: str
    content: str | list[dict[str, Any]] | None = None
    # assistant tool-call turns + tool-result turns (OpenAI protocol;
    # reference maybe_serialize_tool_calls, serving_chat.py:193-196)
    tool_calls: list[dict[str, Any]] | None = None
    tool_call_id: str | None = None
    name: str | None = None


class ChatCompletionRequest(pydantic.BaseModel):
    model: str = ""
    messages: list[ChatMessage]
    max_tokens: int | None = None
    max_completion_tokens: int | None = None
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0
    n: int = 1  # parallel choices per prompt (prefix cache shares KV)
    seed: int | None = None
    stream: bool = False
    stop_token_ids: list[int] | None = None
    # OpenAI chat logprobs: bool switch + how many alternatives
    logprobs: bool = False
    top_logprobs: int | None = None
    modalities: list[str] | None = None  # ["text"], ["text", "audio"]
    # per-stage sampling overrides (reference sampling_params_list)
    sampling_params_list: list[dict[str, Any]] | None = None
    # tool calling (reference serving_chat.py:189-261 via vLLM's
    # Hermes-convention tool parsers)
    tools: list[dict[str, Any]] | None = None
    tool_choice: str | dict[str, Any] = "auto"
    parallel_tool_calls: bool = True
    # OpenAI stop sequences (strings; token-id stops via stop_token_ids)
    stop: str | list[str] | None = None
    # OpenAI logit_bias: token-id (as string) -> additive bias [-100, 100]
    logit_bias: dict[str, float] | None = None
    min_p: float = 0.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    # structured outputs: {"type": "json_object"} or
    # {"type": "json_schema", "json_schema": {"schema": {...}}}
    response_format: dict[str, Any] | None = None
    # vLLM-style extensions: raw regex / schema constraints
    guided_regex: str | None = None
    guided_json: dict[str, Any] | None = None


class CompletionRequest(pydantic.BaseModel):
    model: str = ""
    prompt: str | list[int]
    max_tokens: int = 128
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0
    n: int = 1  # parallel choices per prompt (prefix cache shares KV)
    seed: int | None = None
    stream: bool = False
    # OpenAI completions logprobs: int = number of alternatives
    logprobs: int | None = None
    stop: str | list[str] | None = None
    logit_bias: dict[str, float] | None = None
    min_p: float = 0.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    response_format: dict[str, Any] | None = None
    guided_regex: str | None = None
    guided_json: dict[str, Any] | None = None
    # OpenAI completions extras
    echo: bool = False


class SpeechRequest(pydantic.BaseModel):
    """POST /v1/audio/speech (reference OpenAICreateSpeechRequest)."""

    model: str = ""
    input: str
    voice: str = "default"
    response_format: Literal["wav", "pcm"] = "wav"
    speed: float = 1.0
    stream: bool = True
    sample_rate: int | None = None
    instructions: str | None = None
    extra_body: dict[str, Any] = pydantic.Field(default_factory=dict)


class ImageGenerationRequest(pydantic.BaseModel):
    model: str = ""
    prompt: str
    negative_prompt: str | None = None
    n: int = 1
    size: str = "1024x1024"
    num_inference_steps: int | None = None
    guidance_scale: float | None = None
    seed: int | None = None
    response_format: Literal["b64_json", "url"] = "b64_json"
