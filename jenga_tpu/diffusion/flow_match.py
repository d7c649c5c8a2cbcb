"""Euler flow-matching schedule with ProRes revert/re-noise extensions.

Functional redesign of the reference ``FlowMatchDiscreteScheduler``
(`/root/reference/hyvideo/diffusion/schedulers/scheduling_flow_match_discrete.py:48-299`):
instead of a stateful object with a hidden ``_step_index``, the schedule is
an immutable table of sigmas and every operation takes the step index
explicitly — the sampler loop (or its ``lax.scan`` carry) owns the
position. Sigma tables are host numpy; inside jit they become compile-time
constants of each stage specialization.

Math (sigma = noise level in [0, 1], x_t = (1-sigma)*x0 + sigma*noise,
model predicts velocity v ~ d x / d sigma along the reverse flow):

  * SD3 time shift:       sigma' = s*sigma / (1 + (s-1)*sigma)
  * Euler step:           x_{i+1} = x_i + v * (sigma_{i+1} - sigma_i)
  * x0 estimate (ProRes): x0_hat  = x_i + v * (sigma_last - sigma_i)
  * re-noise (ProRes):    x_i     = (1-sigma_i)*x0 + sigma_i*noise
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

__all__ = ["FlowMatchSchedule", "flow_match_schedule"]


def _sd3_time_shift(t: np.ndarray, shift: float) -> np.ndarray:
    return (shift * t) / (1.0 + (shift - 1.0) * t)


@dataclasses.dataclass(frozen=True)
class FlowMatchSchedule:
    """Immutable Euler flow-matching schedule.

    ``sigmas`` has ``num_steps + 1`` entries (descending 1 -> 0 when
    ``reverse``); ``timesteps[i] = sigmas[i] * num_train_timesteps`` is the
    value fed to the model at step i.
    """

    sigmas: np.ndarray
    num_train_timesteps: int
    shift: float
    reverse: bool

    @property
    def num_steps(self) -> int:
        return len(self.sigmas) - 1

    @property
    def timesteps(self) -> np.ndarray:
        return self.sigmas[:-1] * self.num_train_timesteps

    def timestep(self, i: int) -> float:
        return float(self.sigmas[i] * self.num_train_timesteps)

    def step(self, i: int, sample, velocity):
        """One Euler step from sigma_i to sigma_{i+1} (fp32 update)."""
        dt = float(self.sigmas[i + 1] - self.sigmas[i])
        return (sample.astype(jnp.float32)
                + velocity.astype(jnp.float32) * dt)

    def predict_x0(self, i: int, sample, velocity):
        """Clean-state estimate x0_hat by integrating straight to sigma_last.

        Reference ``predict_x0_from_xt``
        (`/root/reference/.../scheduling_flow_match_discrete.py:259-282`).
        """
        d = float(self.sigmas[-1] - self.sigmas[i])
        return (sample.astype(jnp.float32)
                + velocity.astype(jnp.float32) * d)

    def renoise_to_step(self, i: int, clean, noise):
        """Blend fresh noise back in to land exactly at sigma_i.

        Reference ``add_noise_to_step``
        (`/root/reference/.../scheduling_flow_match_discrete.py:284-299`).
        """
        s = float(self.sigmas[i])
        return (clean.astype(jnp.float32) * (1.0 - s)
                + noise.astype(jnp.float32) * s)


def flow_match_schedule(num_steps: int, shift: float = 1.0,
                        reverse: bool = True,
                        num_train_timesteps: int = 1000) -> FlowMatchSchedule:
    """Build the shifted Euler schedule for ``num_steps`` inference steps."""
    sigmas = np.linspace(1.0, 0.0, num_steps + 1, dtype=np.float64)
    sigmas = _sd3_time_shift(sigmas, shift)
    if not reverse:
        sigmas = 1.0 - sigmas
    return FlowMatchSchedule(
        sigmas=sigmas.astype(np.float32),
        num_train_timesteps=num_train_timesteps,
        shift=shift,
        reverse=reverse,
    )
