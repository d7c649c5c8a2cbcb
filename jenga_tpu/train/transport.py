"""Flow-matching transport library for training (paths, t-sampling, losses).

TPU-first rewrite of the reference's Transport/ICPlan stack
(`/root/reference/hyvideo_i2v/diffusion/flow/transport.py:63-234`,
`path.py:15-208`): the stateful class hierarchy becomes pure functions of
``(t, x0, x1)`` plus a frozen ``TransportConfig``, so the whole training
loss jits and differentiates cleanly. Supports the reference's three
interpolant paths (LINEAR / GVP / VP), velocity / noise / score model
parameterizations, none / velocity / likelihood loss weightings, and
uniform / lognorm SNR sampling with the SD3 time shift — including the
I2V latent_concat and token_replace conditioning used by the reference's
fine-tuning recipe (`transport.py:176-210`).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

__all__ = ["TransportConfig", "path_coefficients", "sample_t",
           "interpolate", "training_loss"]


@dataclasses.dataclass(frozen=True)
class TransportConfig:
    path_type: str = "linear"        # linear | gvp | vp
    prediction: str = "velocity"     # velocity | noise | score
    loss_weight: str = "none"        # none | velocity | likelihood
    snr_type: str = "uniform"        # uniform | lognorm
    shift: float = 1.0               # SD3 time shift (video_shift)
    reverse: bool = False            # reverse=True: x_t = (1-t) x1 + t x0
    reverse_time_schedule: bool = False
    training_timesteps: float = 1000.0
    train_eps: float = 0.0
    vp_sigma_min: float = 0.1
    vp_sigma_max: float = 20.0


def path_coefficients(cfg: TransportConfig, t):
    """(alpha_t, d_alpha_t, sigma_t, d_sigma_t): x_t = alpha_t x1 +
    sigma_t x0 (data coefficient alpha, noise coefficient sigma).

    Mirrors ``ICPlan``/``GVPCPlan``/``VPCPlan``
    (`/root/reference/hyvideo_i2v/diffusion/flow/path.py:22-208`).
    """
    if cfg.path_type == "linear":
        if cfg.reverse:
            return 1.0 - t, -jnp.ones_like(t), t, jnp.ones_like(t)
        return t, jnp.ones_like(t), 1.0 - t, -jnp.ones_like(t)
    if cfg.path_type == "gvp":
        half_pi = math.pi / 2.0
        alpha = jnp.sin(t * half_pi)
        d_alpha = half_pi * jnp.cos(t * half_pi)
        sigma = jnp.cos(t * half_pi)
        d_sigma = -half_pi * jnp.sin(t * half_pi)
        return alpha, d_alpha, sigma, d_sigma
    if cfg.path_type == "vp":
        smin, smax = cfg.vp_sigma_min, cfg.vp_sigma_max
        log_mean = -0.25 * (1 - t) ** 2 * (smax - smin) - 0.5 * (1 - t) * smin
        d_log_mean = 0.5 * (1 - t) * (smax - smin) + 0.5 * smin
        alpha = jnp.exp(log_mean)
        d_alpha = alpha * d_log_mean
        sigma = jnp.sqrt(1.0 - jnp.exp(2.0 * log_mean))
        d_sigma = jnp.exp(2.0 * log_mean) * (2.0 * d_log_mean) / (-2.0 * sigma)
        return alpha, d_alpha, sigma, d_sigma
    raise ValueError(f"unknown path_type {cfg.path_type!r}")


def sample_t(cfg: TransportConfig, key, batch: int):
    """Sample per-example interpolation times (reference ``Transport.sample``
    + SD3 shift, `/root/reference/hyvideo_i2v/diffusion/flow/
    transport.py:127-155`)."""
    t0, t1 = cfg.train_eps, 1.0 - cfg.train_eps
    if cfg.path_type == "linear" and cfg.prediction == "velocity":
        t0, t1 = 0.0, 1.0
    if cfg.snr_type == "uniform":
        t = jax.random.uniform(key, (batch,)) * (t1 - t0) + t0
    elif cfg.snr_type == "lognorm":
        u = jax.random.normal(key, (batch,))
        t = jax.nn.sigmoid(u) * (t1 - t0) + t0
    else:
        raise ValueError(f"unknown snr_type {cfg.snr_type!r}")
    s = cfg.shift
    if s != 1.0:
        if cfg.reverse:
            t = (s * t) / (1.0 + (s - 1.0) * t)
        else:
            t = t / (s - (s - 1.0) * t)
    return t


def interpolate(cfg: TransportConfig, t, x0, x1):
    """(x_t, u_t): the noisy sample and its target vector field."""
    te = t.reshape(t.shape + (1,) * (x1.ndim - 1))
    alpha, d_alpha, sigma, d_sigma = path_coefficients(cfg, te)
    xt = alpha * x1 + sigma * x0
    ut = d_alpha * x1 + d_sigma * x0
    return xt, ut


def _model_t(cfg: TransportConfig, t):
    if cfg.reverse_time_schedule:
        return (1.0 - t) * cfg.training_timesteps
    return t * cfg.training_timesteps


def training_loss(cfg: TransportConfig, model_fn, key, x1, *,
                  i2v_condition_type: str | None = None,
                  cond_latents=None, timestep=None):
    """Per-example flow-matching loss (reference ``training_losses``,
    `/root/reference/hyvideo_i2v/diffusion/flow/transport.py:163-234`).

    ``model_fn(xt, t_model)`` runs the DiT (close over params/text inside);
    ``cond_latents`` [B, C, 1, h, w] drives the I2V conditioning modes.
    Returns (loss [B], aux dict).
    """
    b = x1.shape[0]
    k_t, k_n = jax.random.split(key)
    t = sample_t(cfg, k_t, b) if timestep is None \
        else jnp.full((b,), timestep)
    x0 = jax.random.normal(k_n, x1.shape, jnp.float32)
    xt, ut = interpolate(cfg, t, x1.astype(jnp.float32), x0)

    if i2v_condition_type == "latent_concat":
        # clean first-frame latents + binary mask as extra channels
        rep = jnp.broadcast_to(
            cond_latents if cond_latents is not None else x1[:, :, :1],
            x1.shape)
        rep = jnp.concatenate([rep[:, :, :1], jnp.zeros_like(rep[:, :, 1:])],
                              axis=2)
        msk = jnp.zeros((b, 1) + x1.shape[2:]).at[:, :, 0].set(1.0)
        xt_in = jnp.concatenate([xt, rep, msk], axis=1)
    elif i2v_condition_type == "token_replace":
        xt_in = jnp.concatenate([cond_latents, xt[:, :, 1:]], axis=2)
    else:
        xt_in = xt

    out = model_fn(xt_in, _model_t(cfg, t))

    if i2v_condition_type == "token_replace":
        out = out[:, :, 1:]
        ut = ut[:, :, 1:]

    out = out.astype(jnp.float32)
    axes = tuple(range(1, out.ndim))
    if cfg.prediction == "velocity":
        loss = jnp.mean((out - ut) ** 2, axis=axes)
    else:
        te = t.reshape(t.shape + (1,) * (out.ndim - 1))
        _, _, sigma, d_sigma = path_coefficients(cfg, te)
        # drift diffusion term (reference ICPlan.compute_drift)
        if cfg.path_type == "linear" and not cfg.reverse:
            ratio = 1.0 / te
        elif cfg.path_type == "gvp":
            ratio = math.pi / (2.0 * jnp.tan(te * math.pi / 2.0))
        else:
            ratio = 1.0 / te
        diffusion = ratio * sigma ** 2 - sigma * d_sigma
        if cfg.loss_weight == "velocity":
            weight = (diffusion / sigma) ** 2
        elif cfg.loss_weight == "likelihood":
            weight = diffusion / sigma ** 2
        else:
            weight = jnp.ones_like(sigma)
        x0c = x0[:, :, 1:] if i2v_condition_type == "token_replace" else x0
        if cfg.prediction == "noise":
            loss = jnp.mean(weight * (out - x0c) ** 2, axis=axes)
        else:  # score
            loss = jnp.mean(weight * (out * sigma + x0c) ** 2, axis=axes)
    return loss, {"t": t, "xt": xt, "ut": ut}
