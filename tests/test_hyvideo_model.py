"""HunyuanVideo MMDiT tests on a tiny config (CPU, interpret kernels)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jenga_tpu.curves.blocks import build_curve_plan
from jenga_tpu.models.hyvideo import (
    HYVideoConfig,
    hyvideo_embed,
    hyvideo_forward,
    hyvideo_head,
    hyvideo_trunk,
    init_hyvideo_params,
    make_hy_carve,
)

TINY = HYVideoConfig(hidden_size=128, heads_num=2, double_blocks=2,
                     single_blocks=2, rope_dim_list=(16, 24, 24),
                     text_states_dim=48, text_states_dim_2=24,
                     refiner_depth=1, guidance_embed=True, dtype="float32")
LATENT = (2, 8, 12)   # -> token grid (2, 4, 6) = 48 img tokens
TXT_LEN = 8


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    params = init_hyvideo_params(key, TINY)
    f, h, w = LATENT
    x = jax.random.normal(jax.random.fold_in(key, 1),
                          (1, TINY.in_channels, f, h, w), jnp.float32)
    t = jnp.array([500.0])
    txt = jax.random.normal(jax.random.fold_in(key, 2),
                            (1, TXT_LEN, TINY.text_states_dim), jnp.float32)
    mask = jnp.ones((1, TXT_LEN), jnp.int32).at[0, 6:].set(0)
    txt2 = jax.random.normal(jax.random.fold_in(key, 3),
                             (1, TINY.text_states_dim_2), jnp.float32)
    return params, x, t, txt, mask, txt2


def test_dense_forward_shape_and_zero_head(setup):
    params, x, t, txt, mask, txt2 = setup
    out = hyvideo_forward(params, TINY, x, t, txt, mask, txt2)
    assert out.shape == (1, TINY.out_channels, *LATENT)
    np.testing.assert_array_equal(np.asarray(out), 0.0)  # zero-init head


def test_carved_forward_runs(setup):
    params, x, t, txt, mask, txt2 = setup
    plan = build_curve_plan((2, 4, 6), "gilbert", 128)
    carve = make_hy_carve(TINY, plan, sa_drop_rate=0.5, p_remain=0.5,
                          text_amp=-1.0, txt_block_num=1)
    out = hyvideo_forward(params, TINY, x, t, txt, mask, txt2, carve=carve)
    assert out.shape == (1, TINY.out_channels, *LATENT)
    assert np.isfinite(np.asarray(out)).all()


def test_stage_split_composition(setup):
    params, x, t, txt, mask, txt2 = setup
    img, txth, aux = hyvideo_embed(params, TINY, x, t, txt, mask, txt2)
    img2 = hyvideo_trunk(params, TINY, img, txth, aux)
    out = hyvideo_head(params, TINY, img2, aux)
    full = hyvideo_forward(params, TINY, x, t, txt, mask, txt2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(full), atol=1e-6)


def test_text_mask_affects_refiner(setup):
    params, x, t, txt, mask, txt2 = setup
    # adaLN gates are zero-initialized (reference parity), which makes the
    # refiner identity at init; randomize them so attention reaches out.
    params = jax.tree.map(lambda a: a, params)  # shallow copy
    for blk in params["txt_in"]["blocks"]:
        blk["adaLN"] = dict(blk["adaLN"])
        blk["adaLN"]["w"] = jax.random.normal(
            jax.random.PRNGKey(7), blk["adaLN"]["w"].shape,
            jnp.float32) * 0.1
    img1, txt_a, _ = hyvideo_embed(params, TINY, x, t, txt, mask, txt2)
    mask_b = jnp.ones_like(mask)
    _, txt_b, _ = hyvideo_embed(params, TINY, x, t, txt, mask_b, txt2)
    assert not np.allclose(np.asarray(txt_a), np.asarray(txt_b))


def test_guidance_changes_modulation():
    cfg = TINY
    key = jax.random.PRNGKey(5)
    params = init_hyvideo_params(key, cfg)
    # randomize final layer adaLN so modulation reaches the output
    params["final_layer"]["adaLN"]["w"] = jax.random.normal(
        key, params["final_layer"]["adaLN"]["w"].shape, jnp.float32) * 0.1
    params["final_layer"]["linear"]["w"] = jax.random.normal(
        jax.random.fold_in(key, 1),
        params["final_layer"]["linear"]["w"].shape, jnp.float32) * 0.02
    f, h, w = LATENT
    x = jax.random.normal(key, (1, cfg.in_channels, f, h, w))
    txt = jnp.zeros((1, TXT_LEN, cfg.text_states_dim))
    txt2 = jnp.zeros((1, cfg.text_states_dim_2))
    o1 = hyvideo_forward(params, cfg, x, jnp.array([500.0]), txt, None, txt2,
                         guidance=jnp.array([1000.0]))
    o2 = hyvideo_forward(params, cfg, x, jnp.array([500.0]), txt, None, txt2,
                         guidance=jnp.array([6000.0]))
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_carve_transparent_at_zero_drop(setup):
    """sa_drop_rate == 0 -> dense attention; the curve reorder + rope
    permutation + inverse must reproduce the dense result."""
    params, x, t, txt, mask, txt2 = setup
    plan = build_curve_plan((2, 4, 6), "gilbert", 128)
    carve = make_hy_carve(TINY, plan, sa_drop_rate=0.0, p_remain=0.5)
    dense = hyvideo_forward(params, TINY, x, t, txt, mask, txt2)
    carved = hyvideo_forward(params, TINY, x, t, txt, mask, txt2,
                             carve=carve)
    np.testing.assert_allclose(np.asarray(carved), np.asarray(dense),
                               atol=2e-4, rtol=2e-3)


def test_token_replace_i2v_variant():
    """token_replace: first-frame tokens use t=0 modulation; output must
    differ from the plain path and stay finite."""
    cfg = dataclasses.replace(TINY, i2v_condition_type="token_replace")
    key = jax.random.PRNGKey(11)
    params = init_hyvideo_params(key, cfg)
    params["final_layer"]["linear"]["w"] = jax.random.normal(
        key, params["final_layer"]["linear"]["w"].shape, jnp.float32) * 0.02
    f, h, w = LATENT
    x = jax.random.normal(key, (1, cfg.in_channels, f, h, w))
    txt = jnp.zeros((1, TXT_LEN, cfg.text_states_dim))
    txt2 = jax.random.normal(jax.random.fold_in(key, 1),
                             (1, cfg.text_states_dim_2))
    out = hyvideo_forward(params, cfg, x, jnp.array([700.0]), txt, None,
                          txt2)
    assert out.shape == (1, cfg.out_channels, *LATENT)
    assert np.isfinite(np.asarray(out)).all()
    plain_cfg = dataclasses.replace(cfg, i2v_condition_type=None)
    out_plain = hyvideo_forward(params, plain_cfg, x, jnp.array([700.0]),
                                txt, None, txt2)
    assert not np.allclose(np.asarray(out), np.asarray(out_plain))
    # without guidance embed, t=0 makes the replace vec equal the main
    # vec, so token_replace must reduce to the plain path exactly
    ng = dataclasses.replace(cfg, guidance_embed=False)
    ng_plain = dataclasses.replace(ng, i2v_condition_type=None)
    params_ng = {k: v for k, v in params.items() if k != "guidance_in"}
    out_t0 = hyvideo_forward(params_ng, ng, x, jnp.array([0.0]), txt, None,
                             txt2)
    out_plain_t0 = hyvideo_forward(params_ng, ng_plain, x,
                                   jnp.array([0.0]), txt, None, txt2)
    np.testing.assert_allclose(np.asarray(out_t0), np.asarray(out_plain_t0),
                               atol=1e-4)


def test_padded_text_keys_masked(setup):
    """Padded text tokens (text_mask 0) must not influence img rows in
    either the dense or the carved joint-attention path (the reference's
    cu_seqlens semantics, `/root/reference/hyvideo/modules/attenion.py:
    34-57`)."""
    params, x, t, txt, mask, txt2 = setup
    garbage = txt.at[:, 6:].add(100.0)   # mask zeroes positions 6..8

    def img_out(txt_states, carve):
        img, txth, aux = hyvideo_embed(params, TINY, x, t, txt_states,
                                       mask, txt2, carve)
        return hyvideo_trunk(params, TINY, img, txth, aux, carve)

    for carve in (None,
                  make_hy_carve(TINY, build_curve_plan((2, 4, 6), "gilbert",
                                                       128),
                                sa_drop_rate=0.5, p_remain=0.5,
                                txt_block_num=1)):
        a = img_out(txt, carve)
        b = img_out(garbage, carve)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_shared_gather_q_rows_matches_per_row():
    """carve.q_rows>1 (shared-gather kernel) must match the per-row path.

    Needs a sequence long enough that the SPARSE branch actually runs
    (the module fixture's 48+8 tokens pad to ONE block and take the dense
    fallback, which would make this test vacuous): (4,10,15) grid = 600
    img + 8 txt tokens -> 5 blocks, and q_rows=2 also exercises the
    odd-row-count padding (5 -> 6)."""
    key = jax.random.PRNGKey(4)
    params = init_hyvideo_params(key, TINY)
    lat = (4, 20, 30)
    x = jax.random.normal(jax.random.fold_in(key, 1),
                          (1, TINY.in_channels, *lat), jnp.float32)
    t = jnp.array([500.0])
    txt = jax.random.normal(jax.random.fold_in(key, 2),
                            (1, TXT_LEN, TINY.text_states_dim), jnp.float32)
    mask = jnp.ones((1, TXT_LEN), jnp.int32)
    txt2 = jax.random.normal(jax.random.fold_in(key, 3),
                             (1, TINY.text_states_dim_2), jnp.float32)
    plan = build_curve_plan((4, 10, 15), "gilbert", 128)

    def run(q_rows):
        carve = make_hy_carve(TINY, plan, sa_drop_rate=0.5, p_remain=0.5,
                              txt_block_num=1, q_rows=q_rows)
        img, txth, aux = hyvideo_embed(params, TINY, x, t, txt, mask,
                                       txt2, carve)
        return hyvideo_trunk(params, TINY, img, txth, aux, carve)

    a, b = np.asarray(run(1)), np.asarray(run(2))
    assert np.abs(a).max() > 0          # non-degenerate activations
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=2e-5)


def test_trunk_scan_matches_unrolled(setup):
    """scan=True (lax.scan over stacked block params, the BENCH_FULL
    memory-bounded mode) is numerically identical to the unrolled trunk,
    dense AND carved."""
    params, x, t, txt, mask, txt2 = setup
    img, txth, aux = hyvideo_embed(params, TINY, x, t, txt, mask, txt2)
    a = hyvideo_trunk(params, TINY, img, txth, aux)
    b = hyvideo_trunk(params, TINY, img, txth, aux, scan=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=1e-5)

    plan = build_curve_plan((2, 4, 6), "gilbert", 128)
    carve = make_hy_carve(TINY, plan, sa_drop_rate=0.5, p_remain=0.5,
                          txt_block_num=1)
    img, txth, aux = hyvideo_embed(params, TINY, x, t, txt, mask, txt2,
                                   carve)
    a = hyvideo_trunk(params, TINY, img, txth, aux, carve)
    b = hyvideo_trunk(params, TINY, img, txth, aux, carve, scan=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=1e-5)


def test_sel_mask_replay_matches_planner(setup):
    """HYCarve.sel_mask (planner bypass) replaying the planner's own
    first-block mask — video rows from hy_first_selection_mask plus the
    all-true text rows — reproduces the planner path exactly on a
    1-double/0-single trunk (selection is per block, so equality needs
    one attention layer).

    The grid must give >= 2 video blocks after padding or the joint
    attention takes the tiny-shape dense short-circuit and never runs
    the replay at all (the original (2,4,6) grid did exactly that; the
    sel_mask guard in _joint_attention now raises on it)."""
    from jenga_tpu.models.hyvideo import hy_first_selection_mask
    cfg = dataclasses.replace(TINY, double_blocks=1, single_blocks=0)
    params, _, t, txt, mask, txt2 = setup
    params = init_hyvideo_params(jax.random.PRNGKey(9), cfg)
    plan = build_curve_plan((4, 8, 8), "gilbert", 128)   # 256 img tokens
    x = jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(9), 4),
                          (1, cfg.in_channels, 4, 16, 16), jnp.float32)
    carve = make_hy_carve(cfg, plan, sa_drop_rate=0.5, p_remain=0.5,
                          text_amp=-1.0, txt_block_num=1)
    g = jnp.array([1000.0])

    m = hy_first_selection_mask(params, cfg, x, t, txt, mask, txt2, carve,
                                guidance=g)
    b_, h_, tsb, nb = m.shape
    full = jnp.ones((b_, h_, nb - tsb, nb), bool)
    fixed = dataclasses.replace(
        carve, sel_mask=jnp.concatenate([m, full], axis=2))

    def run(cv):
        img, txth, aux = hyvideo_embed(params, cfg, x, t, txt, mask, txt2,
                                       cv, g)
        return hyvideo_trunk(params, cfg, img, txth, aux, cv)

    a, b = np.asarray(run(carve)[0]), np.asarray(run(fixed)[0])
    assert np.abs(a).max() > 0
    np.testing.assert_array_equal(a, b)


def test_sel_mask_guard_on_noncarved_path(setup):
    """A set sel_mask on any non-carved path (here the tiny-shape dense
    short-circuit) raises instead of silently running dense attention
    (ADVICE r4 — the guard that exposed the original vacuous replay
    test)."""
    cfg = dataclasses.replace(TINY, double_blocks=1, single_blocks=0)
    params, x, t, txt, mask, txt2 = setup
    params = init_hyvideo_params(jax.random.PRNGKey(9), cfg)
    plan = build_curve_plan((2, 4, 6), "gilbert", 128)   # 1 padded block
    carve = make_hy_carve(cfg, plan, sa_drop_rate=0.5, p_remain=0.5,
                          text_amp=-1.0, txt_block_num=1)
    fixed = dataclasses.replace(
        carve, sel_mask=jnp.ones((1, cfg.heads_num, 1, 1), bool))
    with pytest.raises(NotImplementedError, match="sel_mask"):
        img, txth, aux = hyvideo_embed(params, cfg, x, t, txt, mask, txt2,
                                       fixed, jnp.array([1000.0]))
        hyvideo_trunk(params, cfg, img, txth, aux, fixed)
