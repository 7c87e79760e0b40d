"""Diffusion model zoo (DiT transformers + pipelines)."""
