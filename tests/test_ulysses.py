"""Ulysses sequence-parallel attention on an 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jenga_tpu.models.layers import apply_rope, rope_table_1d
from jenga_tpu.ops.flash_attention import dense_attention
from jenga_tpu.parallel.mesh import make_sp_mesh, shard_params_fsdp
from jenga_tpu.parallel.ulysses import ulysses_self_attention
from jenga_tpu.ops.attention_ref import block_sparse_attention_reference
from jenga_tpu.sparse.planner import build_block_mask


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    return make_sp_mesh()


def _qkv(key, b, s, h, d):
    ks = jax.random.split(key, 3)
    return [jax.random.normal(k, (b, s, h, d), jnp.float32) for k in ks]


def test_dense_ulysses_matches_single_device(mesh):
    b, s, h, d = 1, 8 * 128, 8, 32
    q, k, v = _qkv(jax.random.PRNGKey(0), b, s, h, d)
    cos, sin = rope_table_1d(np.arange(s), d)
    out_sp = ulysses_self_attention(q, k, v, jnp.asarray(cos),
                                    jnp.asarray(sin), mesh, sparse=False)
    qr = apply_rope(q, jnp.asarray(cos), jnp.asarray(sin))
    kr = apply_rope(k, jnp.asarray(cos), jnp.asarray(sin))
    ref = dense_attention(qr.transpose(0, 2, 1, 3), kr.transpose(0, 2, 1, 3),
                          v.transpose(0, 2, 1, 3)).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out_sp), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_sparse_ulysses_matches_single_device(mesh):
    b, s, h, d = 1, 8 * 128, 8, 32
    q, k, v = _qkv(jax.random.PRNGKey(1), b, s, h, d)
    cos = np.ones((s, d // 2), np.float32)
    sin = np.zeros((s, d // 2), np.float32)  # identity rope isolates carving
    top_k = 3
    out_sp = ulysses_self_attention(
        q, k, v, jnp.asarray(cos), jnp.asarray(sin), mesh, sparse=True,
        top_k=top_k, p_remain=0.5)
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    mask = build_block_mask(qt, kt, top_k=top_k, p_remain=0.5,
                            text_start_block=s // 128, text_blocks=0,
                            block_neighbors=None)
    ref = block_sparse_attention_reference(qt, kt, vt, mask)
    np.testing.assert_allclose(np.asarray(out_sp),
                               np.asarray(ref.transpose(0, 2, 1, 3)),
                               atol=2e-5, rtol=2e-5)


def test_fsdp_sharding_spec(mesh):
    params = {"big": jnp.zeros((1024, 512)), "small": jnp.zeros((16,))}
    sharded = shard_params_fsdp(params, mesh)
    big_sharding = sharded["big"].sharding
    assert "sp" in str(big_sharding.spec)
    assert np.prod(sharded["small"].sharding.shard_shape((16,))) == 16


def test_norope_joint_text_ulysses_matches_single_device(mesh):
    """HY joint-text semantics under Ulysses: RoPE pre-applied outside
    (tables=None), trailing text blocks forced on, nonzero text_amp bias
    (reference `/root/reference/hyvideo/modules/xdit_ring_atten.py:133-177`)."""
    b, s, h, d = 1, 8 * 128, 8, 32
    text_blocks = 2
    nkb = s // 128
    tsb = nkb - text_blocks
    q, k, v = _qkv(jax.random.PRNGKey(2), b, s, h, d)
    top_k, p_remain, text_amp = 2, 0.4, 0.7
    out_sp = ulysses_self_attention(
        q, k, v, None, None, mesh, sparse=True, top_k=top_k,
        p_remain=p_remain, seqlen=s, text_start_block=tsb,
        text_blocks=text_blocks, text_amp=text_amp)

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    mask = build_block_mask(qt[:, :, :tsb * 128], kt, top_k=top_k,
                            p_remain=p_remain, text_start_block=tsb,
                            text_blocks=text_blocks, block_neighbors=None)
    full = jnp.ones((b, h, nkb - tsb, nkb), bool)
    mask = jnp.concatenate([mask, full], axis=2)
    ref = block_sparse_attention_reference(
        qt, kt, vt, mask, text_amp=text_amp, text_start_block=tsb)
    np.testing.assert_allclose(np.asarray(out_sp),
                               np.asarray(ref.transpose(0, 2, 1, 3)),
                               atol=2e-5, rtol=2e-5)


def test_hyvideo_forward_mesh_joint_text():
    """hyvideo_forward(mesh=...) with text blocks + text_amp matches the
    single-device forward (the round-1 TypeError regression)."""
    from jenga_tpu.curves.blocks import build_curve_plan
    from jenga_tpu.models.hyvideo import (
        HYVideoConfig, init_hyvideo_params, make_hy_carve, hyvideo_forward)

    mesh = make_sp_mesh()
    n_dev = 8
    cfg = HYVideoConfig(hidden_size=32 * n_dev, heads_num=n_dev,
                        double_blocks=1, single_blocks=1,
                        text_states_dim=64, text_states_dim_2=16,
                        rope_dim_list=(8, 12, 12), dtype="float32")
    params = init_hyvideo_params(jax.random.PRNGKey(3), cfg)
    grid = (4, 8, 12)   # 384 img tokens
    txt_len = 256       # 2 trailing text blocks -> 640 total, /8 devices
    plan = build_curve_plan(grid, "gilbert", 128)
    carve = make_hy_carve(cfg, plan, sa_drop_rate=0.6, p_remain=0.5,
                          text_amp=0.5, txt_block_num=2)
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (1, cfg.in_channels, 4, 16, 24), jnp.float32)
    t = jnp.array([500.0], jnp.float32)
    txt = jax.random.normal(jax.random.fold_in(key, 1),
                            (1, txt_len, cfg.text_states_dim), jnp.float32)
    tmask = jnp.ones((1, txt_len), jnp.int32)
    txt2 = jax.random.normal(jax.random.fold_in(key, 2),
                             (1, cfg.text_states_dim_2), jnp.float32)

    out_mesh = hyvideo_forward(params, cfg, x, t, txt, tmask, txt2,
                               carve=carve, mesh=mesh)
    out_single = hyvideo_forward(params, cfg, x, t, txt, tmask, txt2,
                                 carve=carve)
    np.testing.assert_allclose(np.asarray(out_mesh), np.asarray(out_single),
                               atol=3e-4, rtol=3e-4)


def test_wan_pipeline_generate_on_mesh(mesh):
    """Full pipeline generate with mesh: Ulysses-parallel stage fns match
    the single-device pipeline bit-for-bit at matched seeds."""
    from jenga_tpu.models.wan import WanConfig, init_wan_params
    from jenga_tpu.pipelines.wan_t2v import WanT2VOptions, WanT2VPipeline

    cfg = WanConfig(dim=64 * 8, ffn_dim=128, freq_dim=32, num_heads=8,
                    num_layers=1, text_dim=32, text_len=8, dtype="float32")
    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    opts = WanT2VOptions(size=(256, 128), frame_num=5, sampling_steps=2,
                         teacache_thresh=None, sa_drop_rates=(0.5, 0.5),
                         p_remain=0.9, seed=3)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (8, cfg.text_dim))

    pipe_single = WanT2VPipeline(cfg, params)
    pipe_mesh = WanT2VPipeline(cfg, params, mesh=mesh)
    a = np.asarray(pipe_single.generate(ctx, ctx, opts, decode=False))
    b = np.asarray(pipe_mesh.generate(ctx, ctx, opts, decode=False))
    np.testing.assert_allclose(a, b, atol=2e-4, rtol=2e-4)


def test_sparse_ulysses_joint_q4_matches_reference(mesh):
    """The PRODUCTION kernel config — joint 4-row group selection feeding
    the all-member shared-gather kernel — under Ulysses on the 8-device
    mesh must match the dense reference evaluated at the same group-level
    selection (VERDICT r2 item 5: the headline path was previously only
    covered by bench.py's own numerics check)."""
    b, s, h, d = 1, 8 * 128, 8, 32
    q, k, v = _qkv(jax.random.PRNGKey(3), b, s, h, d)
    cos = np.ones((s, d // 2), np.float32)
    sin = np.zeros((s, d // 2), np.float32)
    out_sp = ulysses_self_attention(
        q, k, v, jnp.asarray(cos), jnp.asarray(sin), mesh, sparse=True,
        top_k=3, p_remain=0.5, q_rows=4, joint_sel=True)
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    mask = build_block_mask(qt, kt, top_k=3, p_remain=0.5,
                            text_start_block=s // 128, text_blocks=0,
                            block_neighbors=None, sel_group=4)
    ref = block_sparse_attention_reference(qt, kt, vt, mask)
    np.testing.assert_allclose(np.asarray(out_sp),
                               np.asarray(ref.transpose(0, 2, 1, 3)),
                               atol=2e-5, rtol=2e-5)


def test_sparse_ulysses_joint_q8_matches_reference(mesh):
    """Same as the q4 case at the round-3 production width: joint 8-row
    group selection + all-member kernel (the fixed-max epilogue made
    q_rows=8 the measured winner, 327 vs 351 ms/layer at HY-720p)."""
    b, s, h, d = 1, 16 * 128, 8, 32
    q, k, v = _qkv(jax.random.PRNGKey(5), b, s, h, d)
    cos = np.ones((s, d // 2), np.float32)
    sin = np.zeros((s, d // 2), np.float32)
    out_sp = ulysses_self_attention(
        q, k, v, jnp.asarray(cos), jnp.asarray(sin), mesh, sparse=True,
        top_k=3, p_remain=0.5, q_rows=8, joint_sel=True)
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    mask = build_block_mask(qt, kt, top_k=3, p_remain=0.5,
                            text_start_block=s // 128, text_blocks=0,
                            block_neighbors=None, sel_group=8)
    ref = block_sparse_attention_reference(qt, kt, vt, mask)
    np.testing.assert_allclose(np.asarray(out_sp),
                               np.asarray(ref.transpose(0, 2, 1, 3)),
                               atol=2e-5, rtol=2e-5)


def test_sparse_ulysses_q_rows_matches_per_row(mesh):
    """Shared-gather (q_rows=2) under Ulysses must match the per-row path
    on the 8-device mesh (each shard holds the full sequence for its
    local heads, so the grouped kernel drops in unchanged)."""
    b, s, h, d = 1, 8 * 128, 8, 32
    q, k, v = _qkv(jax.random.PRNGKey(2), b, s, h, d)
    cos = np.ones((s, d // 2), np.float32)
    sin = np.zeros((s, d // 2), np.float32)
    kw = dict(sparse=True, top_k=3, p_remain=0.5)
    base = ulysses_self_attention(q, k, v, jnp.asarray(cos),
                                  jnp.asarray(sin), mesh, **kw)
    grouped = ulysses_self_attention(q, k, v, jnp.asarray(cos),
                                     jnp.asarray(sin), mesh, q_rows=2, **kw)
    np.testing.assert_allclose(np.asarray(grouped), np.asarray(base),
                               atol=2e-5, rtol=2e-5)
