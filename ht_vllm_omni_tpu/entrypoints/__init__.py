"""User-facing entrypoints: Omni / AsyncOmni APIs, OpenAI server."""
