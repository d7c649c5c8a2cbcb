"""Record a reference-pipeline denoising trajectory for fidelity checks.

Run this INSIDE the reference (CUDA/torch) environment, e.g.:

    python tools/record_reference.py --out wan13b_seed0.npz -- \
        python jenga_wan.py --task t2v-1.3B --base_seed 0 ...

It works by wrapping the scheduler's ``step`` via a sitecustomize-style
import hook: every post-step latent is captured and written to the .npz
trajectory format that ``jenga_tpu.pipelines.loss_eval.load_trajectory``
reads (keys ``step_00000..`` + a JSON ``meta`` blob). Alternatively,
import :func:`attach_recorder` directly from a driver script.

This file intentionally has no jenga_tpu imports: it must run standalone
in the reference environment.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


class TrajectoryRecorder:
    """Collects post-step latents; call ``save`` at the end."""

    def __init__(self, meta: dict | None = None):
        self.latents: list[np.ndarray] = []
        self.meta = dict(meta or {})

    def record(self, latent) -> None:
        try:
            import torch
            if isinstance(latent, torch.Tensor):
                latent = latent.detach().to(torch.float32).cpu().numpy()
        except ImportError:
            pass
        self.latents.append(np.asarray(latent, np.float32))

    def save(self, path: str) -> None:
        arrays = {f"step_{i:05d}": x for i, x in enumerate(self.latents)}
        arrays["meta"] = np.frombuffer(
            json.dumps(self.meta).encode(), dtype=np.uint8)
        np.savez(path, **arrays)


def attach_recorder(scheduler, recorder: TrajectoryRecorder):
    """Wrap ``scheduler.step`` so every returned ``prev_sample`` is
    recorded. Works with the reference FlowMatchDiscreteScheduler and
    FlowUniPCMultistepScheduler (both return objects/tuples whose first
    element is the updated latent)."""
    original = scheduler.step

    def step(*args, **kwargs):
        out = original(*args, **kwargs)
        prev = getattr(out, "prev_sample", None)
        if prev is None:
            prev = out[0]
        recorder.record(prev)
        return out

    scheduler.step = step
    return scheduler


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="output .npz path")
    ap.add_argument("--meta", default="{}",
                    help="JSON metadata (seed, schedule, preset)")
    ap.add_argument("command", nargs=argparse.REMAINDER,
                    help="reference command to run (after --)")
    args = ap.parse_args()

    rec = TrajectoryRecorder(json.loads(args.meta))

    # Patch both reference scheduler classes if importable, then exec the
    # given command in-process so the patch applies.
    import importlib
    patched = 0
    for mod_name, cls_name in (
        ("hyvideo.diffusion.schedulers.scheduling_flow_match_discrete",
         "FlowMatchDiscreteScheduler"),
        ("wan.utils.fm_solvers_unipc", "FlowUniPCMultistepScheduler"),
        ("wan.utils.fm_solvers", "FlowDPMSolverMultistepScheduler"),
    ):
        try:
            mod = importlib.import_module(mod_name)
        except ImportError:
            continue
        cls = getattr(mod, cls_name)
        original = cls.step

        def make_step(orig):
            def step(self, *a, **k):
                out = orig(self, *a, **k)
                prev = getattr(out, "prev_sample", None)
                rec.record(prev if prev is not None else out[0])
                return out
            return step

        cls.step = make_step(original)
        patched += 1
    if not patched:
        raise SystemExit("no reference scheduler importable; run this from "
                         "the reference repo root")

    cmd = [c for c in args.command if c != "--"]
    if not cmd:
        raise SystemExit("pass the reference command after --")
    import runpy
    import sys
    sys.argv = cmd[1:] if cmd[0].endswith("python") else cmd
    try:
        runpy.run_path(sys.argv[0], run_name="__main__")
    finally:
        rec.save(args.out)
        print(f"recorded {len(rec.latents)} steps -> {args.out}")


if __name__ == "__main__":
    main()
