"""TTS model family: talker (AR, models/qwen2.py) + codec vocoder."""
