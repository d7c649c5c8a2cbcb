"""Wan DiT model tests on a tiny config (CPU, interpret-mode kernels)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jenga_tpu.curves.blocks import build_curve_plan
from jenga_tpu.models.wan import (
    WanConfig,
    init_wan_params,
    make_wan_carve,
    wan_embed,
    wan_forward,
    wan_head,
    wan_trunk,
)

TINY = WanConfig(dim=128, ffn_dim=256, freq_dim=32, num_heads=2,
                 num_layers=2, text_dim=64, text_len=16, dtype="float32")
GRID_IN = (2, 8, 12)  # latent F,H,W -> token grid (2, 4, 6) = 48 tokens


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    params = init_wan_params(key, TINY)
    f, h, w = GRID_IN
    x = jax.random.normal(jax.random.fold_in(key, 1),
                          (1, TINY.in_dim, f, h, w), jnp.float32)
    t = jnp.array([500.0])
    ctx = jax.random.normal(jax.random.fold_in(key, 2),
                            (1, TINY.text_len, TINY.text_dim), jnp.float32)
    return params, x, t, ctx


def test_dense_forward_shapes(setup):
    params, x, t, ctx = setup
    out = wan_forward(params, TINY, x, t, ctx)
    assert out.shape == (1, TINY.out_dim, *GRID_IN)
    assert jnp.isfinite(out).all()


def test_zero_head_init_gives_zero_output(setup):
    params, x, t, ctx = setup
    out = wan_forward(params, TINY, x, t, ctx)
    # head linear is zero-initialized like the reference -> exact zeros
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_carved_forward_runs_and_matches_shape(setup):
    params, x, t, ctx = setup
    token_grid = (2, 4, 6)
    plan = build_curve_plan(token_grid, "sliced", 128)
    carve = make_wan_carve(TINY, plan, sa_drop_rate=0.5, p_remain=0.9)
    out = wan_forward(params, TINY, x, t, ctx, carve=carve)
    assert out.shape == (1, TINY.out_dim, *GRID_IN)
    assert jnp.isfinite(out).all()


def test_carve_is_transparent_when_dense(setup):
    """With drop<=0.25 (dense fallback) the carve reorder must be a no-op on
    the output: reorder + rope-permute + inverse == dense path."""
    params, x, t, ctx = setup
    token_grid = (2, 4, 6)
    plan = build_curve_plan(token_grid, "sliced", 128)
    carve = make_wan_carve(TINY, plan, sa_drop_rate=0.0, p_remain=0.9)
    dense = wan_forward(params, TINY, x, t, ctx)
    carved = wan_forward(params, TINY, x, t, ctx, carve=carve)
    np.testing.assert_allclose(np.asarray(carved), np.asarray(dense),
                               atol=2e-4, rtol=2e-3)


def test_embed_trunk_head_composition(setup):
    params, x, t, ctx = setup
    h0, aux = wan_embed(params, TINY, x, t, ctx)
    h1 = wan_trunk(params, TINY, h0, aux)
    out = wan_head(params, TINY, h1, aux)
    full = wan_forward(params, TINY, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(full), atol=1e-6)


def test_timestep_changes_output():
    key = jax.random.PRNGKey(3)
    cfg = dataclasses.replace(TINY)
    params = init_wan_params(key, cfg)
    # non-zero head so outputs respond to inputs
    params["head"]["linear"]["w"] = jax.random.normal(
        key, params["head"]["linear"]["w"].shape, jnp.float32) * 0.02
    f, h, w = GRID_IN
    x = jax.random.normal(key, (1, cfg.in_dim, f, h, w), jnp.float32)
    ctx = jnp.zeros((1, cfg.text_len, cfg.text_dim), jnp.float32)
    o1 = wan_forward(params, cfg, x, jnp.array([100.0]), ctx)
    o2 = wan_forward(params, cfg, x, jnp.array([900.0]), ctx)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_i2v_variant_runs():
    cfg = dataclasses.replace(TINY, model_type="i2v", in_dim=32)
    key = jax.random.PRNGKey(4)
    params = init_wan_params(key, cfg)
    f, h, w = GRID_IN
    x = jax.random.normal(key, (1, 16, f, h, w), jnp.float32)
    y = jax.random.normal(jax.random.fold_in(key, 1), (1, 16, f, h, w),
                          jnp.float32)
    clip_fea = jax.random.normal(jax.random.fold_in(key, 2), (1, 257, 1280),
                                 jnp.float32)
    ctx = jnp.zeros((1, cfg.text_len, cfg.text_dim), jnp.float32)
    out = wan_forward(params, cfg, x, jnp.array([10.0]), ctx,
                      clip_fea=clip_fea, y=y)
    assert out.shape == (1, cfg.out_dim, f, h, w)


def test_shared_gather_q_rows_matches_per_row():
    """WanCarve.q_rows>1 routes through the shared-gather kernel; trunk
    outputs must match the per-row path.

    Compares wan_embed+wan_trunk (NOT wan_forward: the zero-initialized
    head makes full-forward outputs identically 0, which would be
    vacuous), on a (4,8,12)=384-token grid -> 3 blocks so q_rows=2 also
    exercises the odd-row-count padding (3 -> 4)."""
    from jenga_tpu.models.wan import wan_embed, wan_trunk
    key = jax.random.PRNGKey(5)
    params = init_wan_params(key, TINY)
    lat = (4, 16, 24)
    x = jax.random.normal(jax.random.fold_in(key, 1),
                          (1, TINY.in_dim, *lat), jnp.float32)
    t = jnp.full((1,), 600.0, jnp.float32)
    ctx = jax.random.normal(jax.random.fold_in(key, 2),
                            (1, TINY.text_len, TINY.text_dim), jnp.float32)
    plan = build_curve_plan((4, 8, 12), "sliced", 128)

    def run(q_rows):
        carve = make_wan_carve(TINY, plan, sa_drop_rate=0.5, p_remain=0.9,
                               q_rows=q_rows)
        h0, aux = wan_embed(params, TINY, x, t, ctx, carve)
        return wan_trunk(params, TINY, h0, aux, carve)

    a, b = np.asarray(run(1)), np.asarray(run(2))
    assert np.abs(a).max() > 0          # non-degenerate activations
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=2e-5)


def test_sel_mask_replay_matches_planner():
    """WanCarve.sel_mask bypasses the planner in every layer; replaying
    the planner's own mask (wan_first_selection_mask) through a
    single-layer trunk must reproduce the planner path exactly (the
    planner re-selects per layer, so equality requires one layer)."""
    from jenga_tpu.models.wan import wan_first_selection_mask
    cfg = dataclasses.replace(TINY, num_layers=1)
    key = jax.random.PRNGKey(6)
    params = init_wan_params(key, cfg)
    lat = (4, 16, 24)
    x = jax.random.normal(jax.random.fold_in(key, 1),
                          (1, cfg.in_dim, *lat), jnp.float32)
    t = jnp.full((1,), 600.0, jnp.float32)
    ctx = jax.random.normal(jax.random.fold_in(key, 2),
                            (1, cfg.text_len, cfg.text_dim), jnp.float32)
    plan = build_curve_plan((4, 8, 12), "sliced", 128)
    carve = make_wan_carve(cfg, plan, sa_drop_rate=0.5, p_remain=0.9)

    mask = wan_first_selection_mask(params, cfg, x, t, ctx, carve)
    fixed = dataclasses.replace(carve, sel_mask=mask)

    def run(cv):
        h0, aux = wan_embed(params, cfg, x, t, ctx, cv)
        return wan_trunk(params, cfg, h0, aux, cv)

    a, b = np.asarray(run(carve)), np.asarray(run(fixed))
    assert np.abs(a).max() > 0
    np.testing.assert_array_equal(a, b)


def test_sel_mask_guards_fail_loudly():
    """The replay hook must never silently degrade: a sel_mask paired with
    the dense fallback (drop <= 0.25) raises, and a mask recorded on a
    different grid fails the shape check instead of an opaque kernel
    error (ADVICE r4)."""
    cfg = dataclasses.replace(TINY, num_layers=1)
    key = jax.random.PRNGKey(7)
    params = init_wan_params(key, cfg)
    lat = (4, 16, 24)
    x = jax.random.normal(jax.random.fold_in(key, 1),
                          (1, cfg.in_dim, *lat), jnp.float32)
    t = jnp.full((1,), 600.0, jnp.float32)
    ctx = jax.random.normal(jax.random.fold_in(key, 2),
                            (1, cfg.text_len, cfg.text_dim), jnp.float32)
    plan = build_curve_plan((4, 8, 12), "sliced", 128)
    carve = make_wan_carve(cfg, plan, sa_drop_rate=0.5, p_remain=0.9)
    nb = -(-plan.seq_len // 128)
    good = jnp.ones((1, cfg.num_heads, nb, nb), bool)

    def run(cv):
        h0, aux = wan_embed(params, cfg, x, t, ctx, cv)
        return wan_trunk(params, cfg, h0, aux, cv)

    # dense fallback with a recorded selection: loud failure, not dense
    low = dataclasses.replace(carve, sa_drop_rate=0.2, sel_mask=good)
    with pytest.raises(ValueError, match="dense fallback"):
        run(low)

    # wrong-grid mask: shape check fires before the kernel does
    bad = dataclasses.replace(
        carve, sel_mask=jnp.ones((1, cfg.num_heads, nb + 1, nb + 1), bool))
    with pytest.raises(ValueError, match="sel_mask shape"):
        run(bad)
