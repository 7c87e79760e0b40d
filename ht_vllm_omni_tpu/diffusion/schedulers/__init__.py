"""Denoise schedulers (flow matching)."""
