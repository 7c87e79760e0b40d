"""UniPC multistep scheduler for flow matching.

Re-implementation of the UniPC predictor-corrector (Zhao et al. 2023,
"UniPC: A Unified Predictor-Corrector Framework for Fast Sampling of
Diffusion Models") specialised to the flow-matching parameterisation, as
used by the reference's FlowUniPCMultistepScheduler (reference
vllm_omni/diffusion/models/schedulers/scheduling_flow_unipc_multistep.py
:28).  predict_x0 + bh2 solver, optional order warmup and final-step
order lowering, plus the corrector (UniC) applied to the previous sample
when history exists.

Flow convention: x_sigma = (1 - sigma) * x0 + sigma * noise, the model
predicts velocity v = dx/dsigma = noise - x0, so x0 = x - sigma * v.
alpha_t = 1 - sigma_t, lambda = log(alpha) - log(sigma).

Coefficient math (tiny k x k solves, k <= order) runs on host in
numpy; the O(tensor) updates are jnp expressions XLA fuses.  The
scheduler is deliberately stateful-but-explicit: ``init_state`` returns
a dict the pipeline carries between steps, so step-wise (streaming)
execution and engine preemption keep working.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np


def shift_sigmas(sigmas: np.ndarray, shift: float) -> np.ndarray:
    return shift * sigmas / (1 + (shift - 1) * sigmas)


def dynamic_shift_sigmas(sigmas: np.ndarray, mu: float) -> np.ndarray:
    """time_shift(mu, 1.0, t) = e^mu / (e^mu + 1/t - 1) (reference
    scheduling_flow_unipc_multistep.py:258)."""
    return math.exp(mu) / (math.exp(mu) + (1.0 / sigmas - 1.0))


def calculate_shift(
    image_seq_len: int,
    base_seq_len: int = 256,
    max_seq_len: int = 4096,
    base_shift: float = 0.5,
    max_shift: float = 1.15,
) -> float:
    """Resolution-dependent mu (reference pipeline_qwen_image.py:72)."""
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    b = base_shift - m * base_seq_len
    return image_seq_len * m + b


class FlowEulerScheduler:
    """Euler flow-match with the same stateful interface as
    FlowUniPCScheduler (for pipelines that pick schedulers per
    request)."""

    def __init__(
        self,
        num_steps: int,
        *,
        sigmas: np.ndarray | None = None,
        shift: float | None = None,
        mu: float | None = None,
    ) -> None:
        if sigmas is None:
            sigmas = np.linspace(1.0, 1.0 / num_steps, num_steps)
        sigmas = np.asarray(sigmas, np.float64)
        if mu is not None:
            sigmas = dynamic_shift_sigmas(sigmas, mu)
        elif shift is not None and shift != 1.0:
            sigmas = shift_sigmas(sigmas, shift)
        self.sigmas = np.concatenate([sigmas, [0.0]])
        self.num_steps = num_steps

    def init_state(self) -> dict:
        return {"step": 0}

    def timestep(self, step: int) -> float:
        return float(self.sigmas[step])

    def step(self, state: dict, model_output, sample):
        i = state["step"]
        ds = float(self.sigmas[i + 1] - self.sigmas[i])
        state["step"] = i + 1
        return sample + ds * model_output, state


@dataclasses.dataclass
class UniPCConfig:
    solver_order: int = 2
    solver_type: str = "bh2"  # bh1 | bh2
    lower_order_final: bool = True
    use_corrector: bool = True


class FlowUniPCScheduler:
    """One instance per request; sigma schedule fixed at construction."""

    def __init__(
        self,
        num_steps: int,
        cfg: UniPCConfig | None = None,
        *,
        sigmas: np.ndarray | None = None,
        shift: float | None = None,
        mu: float | None = None,
    ) -> None:
        self.cfg = cfg or UniPCConfig()
        if sigmas is None:
            sigmas = np.linspace(1.0, 1.0 / num_steps, num_steps)
        sigmas = np.asarray(sigmas, np.float64)
        if mu is not None:
            sigmas = dynamic_shift_sigmas(sigmas, mu)
        elif shift is not None and shift != 1.0:
            sigmas = shift_sigmas(sigmas, shift)
        # final sigma 0 ("zero" final_sigmas_type)
        self.sigmas = np.concatenate([sigmas, [0.0]])
        self.num_steps = num_steps

    # ------------------------------------------------------------- state
    def init_state(self) -> dict:
        return {
            "model_outputs": [],  # x0 predictions, newest last
            "last_sample": None,
            "step": 0,
            "lower_order_nums": 0,
            "this_order": 1,
        }

    def timestep(self, step: int) -> float:
        """Model-facing sigma for step (the reference feeds t/1000 with
        t = sigma * num_train_timesteps, i.e. exactly sigma)."""
        return float(self.sigmas[step])

    # ------------------------------------------------------------- math
    def _lambda(self, sigma: float) -> float:
        return math.log(max(1.0 - sigma, 1e-10)) - math.log(max(sigma, 1e-10))

    def _uni_bh_coeffs(self, step: int, order: int, *, corrector: bool):
        """Shared UniP/UniC coefficient computation.  Returns
        (h, alpha_t, sigma_t, sigma_s0, rks, rhos, h_phi_1, B_h)."""
        sig = self.sigmas
        if corrector:
            sigma_t, sigma_s0 = float(sig[step]), float(sig[step - 1])
        else:
            sigma_t, sigma_s0 = float(sig[step + 1]), float(sig[step])
        lam_t, lam_s0 = self._lambda(sigma_t), self._lambda(sigma_s0)
        h = lam_t - lam_s0

        rks = []
        for i in range(1, order):
            si = (step - (i + 1)) if corrector else (step - i)
            lam_si = self._lambda(float(sig[si]))
            rks.append((lam_si - lam_s0) / h)
        rks.append(1.0)
        rks = np.asarray(rks, np.float64)

        hh = -h  # predict_x0
        h_phi_1 = math.expm1(hh)
        h_phi_k = h_phi_1 / hh - 1
        B_h = hh if self.cfg.solver_type == "bh1" else math.expm1(hh)

        R, b = [], []
        fact = 1
        for i in range(1, order + 1):
            R.append(np.power(rks, i - 1))
            b.append(h_phi_k * fact / B_h)
            fact *= i + 1
            h_phi_k = h_phi_k / hh - 1 / fact
        R = np.stack(R)
        b = np.asarray(b, np.float64)

        if corrector:
            rhos = (
                np.asarray([0.5]) if order == 1 else np.linalg.solve(R, b)
            )
        else:
            if order == 1:
                rhos = None  # no D1s
            elif order == 2:
                rhos = np.asarray([0.5])
            else:
                rhos = np.linalg.solve(R[:-1, :-1], b[:-1])
        alpha_t = 1.0 - sigma_t
        return h, alpha_t, sigma_t, sigma_s0, rks, rhos, h_phi_1, B_h

    def _predict(self, state: dict, sample):
        """UniP update from sample at step -> step+1."""
        step = state["step"]
        order = state["this_order"]
        m0 = state["model_outputs"][-1]
        (_h, alpha_t, sigma_t, sigma_s0, rks, rhos, h_phi_1, B_h
         ) = self._uni_bh_coeffs(step, order, corrector=False)

        x_t = (sigma_t / sigma_s0) * sample - (alpha_t * h_phi_1) * m0
        if order > 1 and rhos is not None:
            res = 0.0
            for i in range(1, order):
                mi = state["model_outputs"][-(i + 1)]
                d1 = (mi - m0) / rks[i - 1]
                res = res + float(rhos[i - 1]) * d1
            x_t = x_t - (alpha_t * B_h) * res
        return x_t

    def _correct(self, state: dict, this_model_output, this_sample):
        """UniC update of this_sample using the model output evaluated
        AT this_sample (step index already points at it)."""
        step = state["step"]
        order = state["this_order"]
        m0 = state["model_outputs"][-1]
        x = state["last_sample"]
        (_h, alpha_t, sigma_t, sigma_s0, rks, rhos, h_phi_1, B_h
         ) = self._uni_bh_coeffs(step, order, corrector=True)

        x_t = (sigma_t / sigma_s0) * x - (alpha_t * h_phi_1) * m0
        res = 0.0
        for i in range(1, order):
            mi = state["model_outputs"][-(i + 1)]
            d1 = (mi - m0) / rks[i - 1]
            res = res + float(rhos[i - 1]) * d1
        d1_t = this_model_output - m0
        return x_t - (alpha_t * B_h) * (res + float(rhos[-1]) * d1_t)

    # -------------------------------------------------------------- step
    def step(self, state: dict, model_output, sample):
        """Advance one step.  ``model_output`` is the velocity prediction
        at ``sample`` (sigma = sigmas[state['step']]).  Returns
        (prev_sample, state)."""
        cfg = self.cfg
        step = state["step"]
        sigma = float(self.sigmas[step])
        x0_pred = sample - sigma * model_output  # convert_model_output

        if cfg.use_corrector and step > 0 and state["last_sample"] is not None:
            sample = self._correct(state, x0_pred, sample)

        # history push
        outs = state["model_outputs"] + [x0_pred]
        state["model_outputs"] = outs[-cfg.solver_order:]

        if cfg.lower_order_final:
            this_order = min(cfg.solver_order, self.num_steps - step)
        else:
            this_order = cfg.solver_order
        state["this_order"] = max(
            1, min(this_order, state["lower_order_nums"] + 1)
        )

        state["last_sample"] = sample
        prev = self._predict(state, sample)
        prev = jnp.asarray(prev)

        state["lower_order_nums"] = min(
            state["lower_order_nums"] + 1, cfg.solver_order
        )
        state["step"] = step + 1
        return prev, state
