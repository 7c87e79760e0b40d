"""OpenAI-compatible serving layer (chat/completions/speech/images)."""
