"""Continuous-batching schedulers (AR + one-shot generation stages)."""
