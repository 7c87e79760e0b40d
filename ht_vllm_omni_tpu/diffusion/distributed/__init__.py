"""Diffusion parallel strategies over mesh axes (cfg / ulysses sp)."""
