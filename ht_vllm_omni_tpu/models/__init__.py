"""AR model zoo (pure-jax functional models over stacked-layer pytrees)."""
