"""Smoke tests for the curve/selection debug renderer (tools/curve_viz.py,
the reference `gilbert.py:768-906` visualization counterpart)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import curve_viz  # noqa: E402


def test_curve_and_blocks_render(tmp_path):
    out1 = str(tmp_path / "curve.png")
    curve_viz.main(["curve", "--grid", "3", "8", "9", "--curve", "sliced",
                    "--out", out1])
    out2 = str(tmp_path / "blocks.png")
    curve_viz.main(["blocks", "--grid", "3", "8", "9", "--block-size", "32",
                    "--out", out2])
    for out in (out1, out2):
        assert os.path.getsize(out) > 5000


def test_mask_heatmap_accepts_both_rank3_and_rank4(tmp_path):
    sel3 = np.random.default_rng(0).random((2, 6, 6)) > 0.5
    npy = str(tmp_path / "sel.npy")
    np.save(npy, sel3)
    out = str(tmp_path / "mask.png")
    curve_viz.main(["mask", "--npy", npy, "--grid", "3", "8", "32",
                    "--curve", "sliced", "--out", out])
    assert os.path.getsize(out) > 5000

    np.save(npy, sel3[None])      # [B, H, Qb, Kb]
    out2 = str(tmp_path / "mask4.png")
    curve_viz.main(["mask", "--npy", npy, "--out", out2])
    assert os.path.getsize(out2) > 5000
