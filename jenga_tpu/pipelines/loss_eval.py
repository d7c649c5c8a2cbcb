"""Latent-space validation-loss harness.

Counterpart of the reference's loss pipeline
(`/root/reference/hyvideo/diffusion/pipelines/
pipeline_hunyuan_video_loss.py:962-1058`): per-step MSE between the
denoising trajectory and a ground-truth latent, the closest thing the
reference has to a numerical correctness test. Used to compare carving
configurations (or this reimplementation against recorded reference
trajectories) without decoding to pixels.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["trajectory_mse", "carving_fidelity_report"]


def trajectory_mse(latent_trace, reference_trace):
    """Per-step MSE between two denoising trajectories (lists of arrays)."""
    losses = []
    for a, b in zip(latent_trace, reference_trace):
        a = jnp.asarray(a, jnp.float32)
        b = jnp.asarray(b, jnp.float32)
        losses.append(float(jnp.mean((a - b) ** 2)))
    return losses


def carving_fidelity_report(pipeline, make_opts, context, context_null,
                            carving_opts, dense_opts, sample_steps=None):
    """Run the same seed through carved and dense configurations and report
    final-latent MSE / relative error — a self-contained fidelity check
    mirroring the reference's validation-loss usage."""
    carved = pipeline.generate(context, context_null, carving_opts,
                               decode=False)
    dense = pipeline.generate(context, context_null, dense_opts,
                              decode=False)
    carved = jnp.asarray(carved, jnp.float32)
    dense = jnp.asarray(dense, jnp.float32)
    mse = float(jnp.mean((carved - dense) ** 2))
    rel = float(jnp.linalg.norm(carved - dense)
                / (jnp.linalg.norm(dense) + 1e-8))
    return {"final_mse": mse, "relative_error": rel,
            "dense_norm": float(jnp.linalg.norm(dense))}
