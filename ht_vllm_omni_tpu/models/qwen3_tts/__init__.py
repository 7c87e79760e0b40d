"""Qwen3-TTS family: talker pipeline + the real speech-tokenizer
decoders (12.5 Hz v2 / 25 Hz v1) and the voice-prompt cache,
reference vllm_omni/model_executor/models/qwen3_tts/."""
