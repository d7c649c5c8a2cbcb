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

import json

import jax.numpy as jnp
import numpy as np

__all__ = ["trajectory_mse", "carving_fidelity_report", "save_trajectory",
           "load_trajectory", "reference_fidelity_report"]


def save_trajectory(path: str, latents, meta: dict | None = None) -> None:
    """Write a denoising trajectory to .npz: ``step_00000..`` latent arrays
    plus a JSON ``meta`` blob (seed, schedule, shapes). The same format is
    written from the reference CUDA pipeline by
    ``tools/record_reference.py`` so the two implementations can be
    compared step-for-step at matched seeds."""
    arrays = {f"step_{i:05d}": np.asarray(x, np.float32)
              for i, x in enumerate(latents)}
    arrays["meta"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_trajectory(path: str):
    """Returns (list of latent arrays in step order, meta dict)."""
    data = np.load(path)
    steps = sorted(k for k in data.files if k.startswith("step_"))
    meta = {}
    if "meta" in data.files:
        meta = json.loads(bytes(data["meta"].tobytes()).decode())
    return [data[k] for k in steps], meta


def reference_fidelity_report(latent_trace, reference_path: str) -> dict:
    """Per-step MSE of a recorded run against a reference trajectory file
    (the reference's validation-loss protocol,
    `/root/reference/hyvideo/diffusion/pipelines/
    pipeline_hunyuan_video_loss.py:962-1058`, applied across
    implementations)."""
    ref, meta = load_trajectory(reference_path)
    n = min(len(latent_trace), len(ref))
    losses = trajectory_mse(latent_trace[:n], ref[:n])
    final = losses[-1] if losses else float("nan")
    ref_last = np.asarray(ref[n - 1], np.float32)
    ours_last = np.asarray(latent_trace[n - 1], np.float32)
    rel = float(np.linalg.norm(ours_last - ref_last)
                / (np.linalg.norm(ref_last) + 1e-8))
    return {"per_step_mse": losses, "final_mse": final,
            "final_relative_error": rel, "steps_compared": n,
            "meta": meta}


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
