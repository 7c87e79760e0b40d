"""Engines and orchestration (single stage + multi-stage pipeline)."""
