"""Voxtral TTS family: Mistral talker + flow-matching acoustic
transformer + codec decoder (reference
vllm_omni/model_executor/models/voxtral_tts/)."""
