"""Curve-layer tests: bijectivity, locality, golden sequences, adjacency.

The reference has no tests (SURVEY.md §4); goldens here were hand-checked
and cross-validated against the reference implementation's output.
"""

import numpy as np
import pytest

from jenga_tpu.curves.gilbert import (
    gilbert2d,
    gilbert3d,
    gilbert_mapping,
    sliced_gilbert_mapping,
    transpose_gilbert_mapping,
)
from jenga_tpu.curves.blocks import (
    block_color_map,
    block_neighbor_tensor,
    build_curve_plan,
    build_multi_curve,
)

SHAPES = [(1, 1, 1), (2, 2, 2), (1, 4, 4), (3, 5, 7), (4, 4, 4),
          (2, 3, 4), (5, 2, 9), (8, 6, 10), (4, 30, 40), (1, 45, 80)]


@pytest.mark.parametrize("t,h,w", SHAPES)
def test_gilbert3d_visits_every_voxel_once(t, h, w):
    coords = gilbert3d(w, h, t)
    assert coords.shape == (t * h * w, 3)
    linear = coords[:, 2].astype(np.int64) * h * w + coords[:, 1] * w + coords[:, 0]
    assert len(np.unique(linear)) == t * h * w


@pytest.mark.parametrize("t,h,w", SHAPES)
def test_gilbert3d_steps_are_local_moves(t, h, w):
    """Consecutive curve points are 26-neighborhood adjacent always, and
    6-neighborhood adjacent when all sides are even (odd sides introduce a
    few diagonal steps, a documented property of the gilbert algorithm)."""
    coords = gilbert3d(w, h, t).astype(np.int64)
    if len(coords) < 2:
        return
    deltas = np.abs(np.diff(coords, axis=0))
    assert (deltas.max(axis=1) <= 1).all()
    if t % 2 == 0 and h % 2 == 0 and w % 2 == 0:
        assert (deltas.sum(axis=1) == 1).all()


def test_gilbert2d_golden_4x4():
    """Hand-checked 4x4 gilbert curve (equals the classic Hilbert curve)."""
    coords = [tuple(int(v) for v in c) for c in gilbert2d(4, 4)]
    assert coords == [(0, 0), (1, 0), (1, 1), (0, 1), (0, 2), (0, 3), (1, 3),
                      (1, 2), (2, 2), (2, 3), (3, 3), (3, 2), (3, 1), (2, 1),
                      (2, 0), (3, 0)]


def test_gilbert3d_golden_2x2x2():
    coords = [tuple(c) for c in gilbert3d(2, 2, 2)]
    assert coords[0] == (0, 0, 0)
    # Unit steps covering the cube, ending adjacent to a corner.
    assert len(set(coords)) == 8


@pytest.mark.parametrize("t,h,w", SHAPES)
def test_mapping_bijective(t, h, w):
    l2c, order = gilbert_mapping(t, h, w)
    n = t * h * w
    assert sorted(l2c) == list(range(n))
    assert np.array_equal(l2c[order], np.arange(n))
    assert np.array_equal(order[l2c], np.arange(n))


@pytest.mark.parametrize("t,h,w", [(3, 4, 6), (5, 8, 8), (2, 7, 9)])
def test_sliced_mapping_is_per_frame(t, h, w):
    """Sliced curve fills each frame completely before the next frame."""
    l2c, order = sliced_gilbert_mapping(t, h, w)
    hw = h * w
    for z in range(t):
        frame_tokens = order[z * hw:(z + 1) * hw]
        assert frame_tokens.min() == z * hw
        assert frame_tokens.max() == (z + 1) * hw - 1


@pytest.mark.parametrize("t,h,w", [(3, 4, 6), (4, 8, 8)])
def test_sliced_mapping_frame_transitions_are_local(t, h, w):
    """Corner continuation: the jump between frames is one time step plus at
    most a diagonal move in space (the next frame starts at the nearest
    corner to where the previous frame ended)."""
    _, order = sliced_gilbert_mapping(t, h, w)
    hw = h * w
    for z in range(t - 1):
        end = order[(z + 1) * hw - 1]
        start = order[(z + 1) * hw]
        ey, ex = (end % hw) // w, (end % hw) % w
        sy, sx = (start % hw) // w, (start % hw) % w
        # start corner is the closest corner to the end point
        assert abs(ex - sx) <= (w - 1) / 2 + 1
        assert abs(ey - sy) <= (h - 1) / 2 + 1


def test_transpose_mapping_permutes_axes():
    t, h, w = 3, 5, 7
    l2c_a, _ = transpose_gilbert_mapping([t, h, w], (0, 1, 2))
    l2c_b, _ = gilbert_mapping(t, h, w)
    assert np.array_equal(l2c_a, l2c_b)
    # A permuted order still yields a bijection.
    l2c_c, order_c = transpose_gilbert_mapping([t, h, w], (2, 1, 0))
    assert np.array_equal(l2c_c[order_c], np.arange(t * h * w))


def test_curve_locality_beats_linear():
    """Gilbert blocks are more spatially compact than row-major blocks:
    mean intra-block coordinate spread must be smaller."""
    t, h, w, bs = 4, 16, 16, 64
    l2c, order = gilbert_mapping(t, h, w)

    def spread(token_order):
        coords = np.stack(np.unravel_index(token_order, (t, h, w)), 1)
        blocks = coords.reshape(-1, bs, 3)
        return (blocks.max(1) - blocks.min(1)).sum(1).mean()

    assert spread(order) < spread(np.arange(t * h * w))


def test_block_color_map_partition():
    t, h, w, bs = 3, 8, 8, 32
    l2c, _ = gilbert_mapping(t, h, w)
    colors = block_color_map(l2c, (t, h, w), bs)
    counts = np.bincount(colors.ravel())
    assert counts.sum() == t * h * w
    assert (counts[:-1] == bs).all()  # all but last block are full


@pytest.mark.parametrize("t,h,w,bs", [(3, 8, 8, 32), (4, 10, 12, 128),
                                      (2, 7, 9, 16)])
def test_block_neighbors_properties(t, h, w, bs):
    l2c, _ = gilbert_mapping(t, h, w)
    adj = block_neighbor_tensor(l2c, (t, h, w), bs)
    nb = -(-t * h * w // bs)
    assert adj.shape == (nb, nb)
    assert adj.diagonal().all()
    assert np.array_equal(adj, adj.T)  # offsets visited in both signs
    # Curve-consecutive blocks share a face -> must be neighbors.
    assert all(adj[i, i + 1] for i in range(nb - 1))


def test_block_neighbors_excludes_far_blocks():
    """In a long thin volume, the first and last blocks cannot touch."""
    t, h, w, bs = 1, 4, 64, 16
    l2c, _ = gilbert_mapping(t, h, w)
    adj = block_neighbor_tensor(l2c, (t, h, w), bs)
    assert not adj[0, adj.shape[0] - 1]


def test_build_curve_plan_cached_and_consistent():
    p1 = build_curve_plan((3, 8, 8), "gilbert", 32)
    p2 = build_curve_plan((3, 8, 8), "gilbert", 32)
    assert p1 is p2  # lru cache
    assert p1.seq_len == 3 * 8 * 8
    assert p1.num_blocks == -(-p1.seq_len // 32)


def test_build_multi_curve_stage_grids():
    plans = build_multi_curve((4, 16, 16), [0.5, 1.0], "gilbert", 32)
    assert plans[0].grid == (4, 8, 8)
    assert plans[1].grid == (4, 16, 16)
