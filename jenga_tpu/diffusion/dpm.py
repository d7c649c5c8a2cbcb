"""DPM-Solver++ (2M) for flow matching — Wan's ``--sample_solver dpm++``.

Functional counterpart of the reference ``FlowDPMSolverMultistepScheduler``
(`/root/reference/wan/utils/fm_solvers.py:706-975`) with the same Jenga
additions (``step_to_zero``, ``add_noise``). Same design as the UniPC
module: sigma tables + coefficients in host f64, device work is a fused
linear combination; explicit state instead of hidden counters.

Flow parametrization: alpha = 1 - sigma, lambda = log(alpha) - log(sigma),
x0 = x - sigma * v. DPM-Solver++ 2M update from sigma_s0 -> sigma_t with
h = lambda_t - lambda_s0, r = h_prev / h:

    x_t = (sigma_t / sigma_s0) x - alpha_t (e^{-h} - 1)
          [(1 + 1/(2r)) D0 - 1/(2r) D1]
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

__all__ = ["DPMSchedule", "DPMState", "dpm_schedule", "dpm_init",
           "dpm_step", "dpm_step_to_zero", "dpm_add_noise"]


@dataclasses.dataclass(frozen=True)
class DPMSchedule:
    sigmas: np.ndarray
    num_train_timesteps: int
    solver_order: int
    lower_order_final: bool

    @property
    def num_steps(self) -> int:
        return len(self.sigmas) - 1

    @property
    def timesteps(self) -> np.ndarray:
        # the reference truncates to int64 and feeds those to the model
        return np.floor(self.sigmas[:-1] * self.num_train_timesteps)

    def timestep(self, i: int) -> float:
        return float(int(self.sigmas[i] * self.num_train_timesteps))


@dataclasses.dataclass
class DPMState:
    step_index: int
    model_outputs: list
    lower_order_nums: int


def dpm_schedule(num_steps: int, shift: float = 1.0,
                 num_train_timesteps: int = 1000, solver_order: int = 2,
                 lower_order_final: bool = True,
                 grid: str = "sampling") -> DPMSchedule:
    # The reference uses TWO sigma grids with this solver:
    #   grid="sampling" (the --sample_solver dpm++ pipeline path): custom
    #     sigmas from get_sampling_sigmas — linspace(1, 0, n+1)[:n] then
    #     shift, so sigma_max is exactly 1.0
    #     (`/root/reference/wan/utils/fm_solvers.py:22-26`,
    #     `/root/reference/jenga_wan.py:145-156`);
    #   grid="train" (set_timesteps' internal default): sigma_max = 1-1/N
    #     (`/root/reference/wan/utils/fm_solvers.py` set_timesteps).
    # Pipelines use "sampling" to match the reference dpm++ trajectories.
    if grid == "sampling":
        sigma_max = 1.0
    elif grid == "train":
        sigma_max = 1.0 - 1.0 / num_train_timesteps
    else:
        raise ValueError(f"grid must be 'sampling' or 'train', got {grid!r}")
    sigmas = np.linspace(sigma_max, 0.0, num_steps + 1,
                         dtype=np.float64)[:num_steps]
    sigmas = shift * sigmas / (1.0 + (shift - 1.0) * sigmas)
    sigmas = np.concatenate([sigmas, [0.0]])
    return DPMSchedule(sigmas=sigmas,
                       num_train_timesteps=num_train_timesteps,
                       solver_order=solver_order,
                       lower_order_final=lower_order_final)


def dpm_init(schedule: DPMSchedule) -> DPMState:
    return DPMState(step_index=0, model_outputs=[], lower_order_nums=0)


def _lam(sigma: float) -> float:
    with np.errstate(divide="ignore"):
        return float(np.log(1.0 - sigma) - np.log(sigma))


def dpm_step(schedule: DPMSchedule, state: DPMState, velocity, sample):
    """One DPM-Solver++ multistep update; returns (new_state, prev_sample)."""
    i = state.step_index
    sigma = float(schedule.sigmas[i])
    d0 = (sample.astype(jnp.float32)
          - sigma * velocity.astype(jnp.float32))  # x0 prediction

    outputs = (list(state.model_outputs)[-(schedule.solver_order - 1):]
               if schedule.solver_order > 1 else [])
    outputs.append(d0)

    if schedule.lower_order_final:
        order = min(schedule.solver_order, schedule.num_steps - i)
    else:
        order = schedule.solver_order
    order = min(order, state.lower_order_nums + 1)

    sig_t, sig_s0 = schedule.sigmas[i + 1], schedule.sigmas[i]
    alpha_t = 1.0 - sig_t
    h = _lam(sig_t) - _lam(sig_s0)
    phi = np.expm1(-h)
    scale_x = float(sig_t / sig_s0) if sig_s0 != 0 else 0.0

    if order >= 2 and len(outputs) >= 2:
        h_prev = _lam(sig_s0) - _lam(schedule.sigmas[i - 1])
        r = h_prev / h
        c0 = 1.0 + 1.0 / (2.0 * r)
        c1 = -1.0 / (2.0 * r)
        upd = c0 * outputs[-1] + c1 * outputs[-2]
    else:
        upd = outputs[-1]

    prev = scale_x * sample.astype(jnp.float32) \
        - float(alpha_t * phi) * upd

    new_state = DPMState(
        step_index=i + 1,
        model_outputs=outputs,
        lower_order_nums=min(state.lower_order_nums + 1,
                             schedule.solver_order))
    return new_state, prev


def dpm_step_to_zero(schedule: DPMSchedule, step_index: int, velocity,
                     sample):
    sigma = float(schedule.sigmas[step_index])
    return sample.astype(jnp.float32) - sigma * velocity.astype(jnp.float32)


def dpm_add_noise(schedule: DPMSchedule, step_index: int, clean, noise):
    sigma = float(schedule.sigmas[step_index])
    return ((1.0 - sigma) * clean.astype(jnp.float32)
            + sigma * noise.astype(jnp.float32))
