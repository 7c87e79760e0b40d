"""Step-level DiT caching (TeaCache-style)."""
