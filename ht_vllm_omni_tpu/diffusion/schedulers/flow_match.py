"""Flow-matching Euler scheduler.

Counterpart of the reference's shared flow schedulers (reference
vllm_omni/diffusion/models/schedulers/scheduling_flow_unipc_multistep.py;
this is the Euler variant modern DiTs default to).  Rectified-flow
parameterisation: x_t = (1-sigma)*x0 + sigma*noise, the model predicts the
velocity v = noise - x0, and an Euler step is x_{t'} = x_t + (s' - s)*v.
Shifted sigmas follow SD3/Flux (shift=3).
"""

from __future__ import annotations

import jax.numpy as jnp


class FlowMatchEulerScheduler:
    def __init__(self, num_steps: int, shift: float = 3.0) -> None:
        self.num_steps = num_steps
        sigmas = jnp.linspace(1.0, 1.0 / num_steps, num_steps)
        sigmas = shift * sigmas / (1.0 + (shift - 1.0) * sigmas)
        self.sigmas = jnp.concatenate([sigmas, jnp.zeros(1)])

    def timestep(self, i) -> jnp.ndarray:
        """Model conditioning value for step i, in [0, 1000)."""
        return self.sigmas[i] * 1000.0

    def step(self, x_t, velocity, i):
        """One Euler update from sigma_i to sigma_{i+1}."""
        ds = self.sigmas[i + 1] - self.sigmas[i]
        return x_t + ds * velocity
