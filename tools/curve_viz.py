"""Curve / selection-mask debug visualization (VERDICT r3 missing-3).

TPU-rebuild counterpart of the reference's curve renderings
(`/root/reference/gilbert.py:768-906` ``visualize_gilbert_curve*`` and
the ``block_wise_mapping`` per-block coloring) plus the tool the
reference never had: a selection-mask heatmap for fidelity triage when a
regression points at the curve or the planner.

Subcommands (writes PNGs; headless Agg backend):

  curve   3-D polyline of the space-filling curve over a (t, h, w) grid
          python tools/curve_viz.py curve --grid 4 12 33 --curve sliced \\
              --out /tmp/curve.png
  blocks  per-frame tiles coloring every voxel by its 128-token curve
          block id (how AttenCarve partitions the video)
          python tools/curve_viz.py blocks --grid 21 30 52 --out /tmp/b.png
  mask    heatmap of a saved one-hot block-selection mask
          ([H, Qb, Kb] or [B, H, Qb, Kb] bool .npy, e.g. dumped from
          wan_first_selection_mask / hy_first_selection_mask), mean over
          heads + one per-head panel row, with the curve adjacency
          rendered alongside for "is it the mask or the curve" triage
          python tools/curve_viz.py mask --npy sel.npy --grid 21 30 52 \\
              --curve sliced --out /tmp/mask.png

Every figure is pure matplotlib over the same ``CurvePlan`` the
pipelines consume, so what you see is what the kernel was given.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from jenga_tpu.curves.blocks import block_color_map, build_curve_plan  # noqa: E402


def _plan(args):
    return build_curve_plan(tuple(args.grid), args.curve, args.block_size)


def render_curve(args) -> str:
    """3-D polyline through voxel centers in curve order (reference
    ``visualize_gilbert_curve``)."""
    t, h, w = args.grid
    plan = _plan(args)
    # curve_order[k] = linear voxel index at curve position k
    lin = np.asarray(plan.curve_order)
    zs, ys, xs = lin // (h * w), (lin // w) % h, lin % w

    fig = plt.figure(figsize=(12, 8))
    ax = fig.add_subplot(111, projection="3d")
    ax.plot(xs, ys, zs, "-", linewidth=0.8, color="tab:blue", alpha=0.9)
    if t * h * w <= 4096:
        ax.scatter(xs, ys, zs, c=np.arange(len(lin)), cmap="viridis", s=6)
    ax.set_title(f"{args.curve} curve ({w}x{h}x{t})")
    ax.set_xlabel("X")
    ax.set_ylabel("Y")
    ax.set_zlabel("T")
    ax.view_init(elev=20, azim=45)
    fig.savefig(args.out, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return args.out


def render_blocks(args) -> str:
    """Per-frame tiles, each voxel colored by its curve-block id — the
    block partition AttenCarve selects over (reference
    ``block_wise_mapping`` renderings)."""
    t, h, w = args.grid
    plan = _plan(args)
    colors = block_color_map(plan.linear_to_curve, (t, h, w),
                             args.block_size)
    cols = min(t, 8)
    rows = -(-t // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(2.2 * cols, 2.2 * rows),
                             squeeze=False)
    nb = plan.num_blocks
    for fi in range(rows * cols):
        ax = axes[fi // cols][fi % cols]
        ax.axis("off")
        if fi < t:
            ax.imshow(colors[fi], cmap="nipy_spectral", vmin=0, vmax=nb - 1,
                      interpolation="nearest")
            ax.set_title(f"frame {fi}", fontsize=8)
    fig.suptitle(f"{args.curve} block ids ({w}x{h}x{t}, "
                 f"{args.block_size}-token blocks, {nb} blocks)")
    fig.savefig(args.out, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return args.out


def render_mask(args) -> str:
    """Selection-mask heatmap: head-mean + first heads, with the plan's
    adjacency for comparison (adjacency is OR-ed into every selection, so
    any hole in it shows up identically in the mask panels)."""
    sel = np.load(args.npy)
    if sel.ndim == 4:
        sel = sel[0]
    if sel.ndim != 3:
        raise SystemExit(f"expected [H, Qb, Kb] or [B, H, Qb, Kb], got "
                         f"{sel.shape}")
    sel = sel.astype(np.float32)
    heads = min(args.heads, sel.shape[0])
    panels = 1 + (1 if args.grid else 0) + heads
    fig, axes = plt.subplots(1, panels, figsize=(4.2 * panels, 4.2),
                             squeeze=False)
    axes = axes[0]
    axes[0].imshow(sel.mean(0), cmap="magma", vmin=0, vmax=1,
                   interpolation="nearest")
    axes[0].set_title(f"head mean (density {sel.mean():.3f})", fontsize=9)
    off = 1
    if args.grid:
        plan = _plan(args)
        nbr = np.asarray(plan.block_neighbors, np.float32)
        axes[1].imshow(nbr, cmap="magma", vmin=0, vmax=1,
                       interpolation="nearest")
        axes[1].set_title(f"curve adjacency (density {nbr.mean():.3f})",
                          fontsize=9)
        off = 2
    for hi in range(heads):
        axes[off + hi].imshow(sel[hi], cmap="magma", vmin=0, vmax=1,
                              interpolation="nearest")
        axes[off + hi].set_title(
            f"head {hi} (density {sel[hi].mean():.3f})", fontsize=9)
    for ax in axes:
        ax.set_xlabel("KV block")
        ax.set_ylabel("Q block")
    fig.savefig(args.out, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return args.out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, grid_required=True):
        sp.add_argument("--grid", type=int, nargs=3,
                        required=grid_required, default=None,
                        metavar=("T", "H", "W"),
                        help="latent token grid (after patchify)")
        sp.add_argument("--curve", default="gilbert",
                        choices=["gilbert", "sliced", "linear"])
        sp.add_argument("--block-size", type=int, default=128)
        sp.add_argument("--out", required=True, help="output PNG path")

    common(sub.add_parser("curve", help="3-D curve polyline"))
    common(sub.add_parser("blocks", help="per-frame block-id tiles"))
    mp = sub.add_parser("mask", help="selection-mask heatmap")
    mp.add_argument("--npy", required=True,
                    help="[H, Qb, Kb] (or [B, H, Qb, Kb]) bool .npy mask")
    mp.add_argument("--heads", type=int, default=2,
                    help="per-head panels to render")
    common(mp, grid_required=False)

    args = p.parse_args(argv)
    out = {"curve": render_curve, "blocks": render_blocks,
           "mask": render_mask}[args.cmd](args)
    print(f"wrote {out}")
    return out


if __name__ == "__main__":
    main()
