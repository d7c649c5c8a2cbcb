"""Ring attention vs single-device dense reference (8-dev CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from jenga_tpu.ops.flash_attention import dense_attention
from jenga_tpu.parallel.mesh import make_sp_mesh
from jenga_tpu.parallel.ring import ring_attention


def _qkv(key, b, s, h, d):
    ks = jax.random.split(key, 3)
    return [jax.random.normal(k, (b, s, h, d), jnp.float32) for k in ks]


def test_ring_matches_dense():
    mesh = make_sp_mesh()
    b, s, h, d = 1, 8 * 64, 4, 32
    q, k, v = _qkv(jax.random.PRNGKey(0), b, s, h, d)
    out = ring_attention(q, k, v, mesh)
    ref = dense_attention(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                          v.transpose(0, 2, 1, 3)).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


def test_ring_with_joint_text_kv():
    mesh = make_sp_mesh()
    b, s, h, d, st = 1, 8 * 32, 2, 16, 24
    q, k, v = _qkv(jax.random.PRNGKey(1), b, s, h, d)
    jk = jax.random.normal(jax.random.PRNGKey(2), (b, st, h, d))
    jv = jax.random.normal(jax.random.PRNGKey(3), (b, st, h, d))
    out = ring_attention(q, k, v, mesh, joint_k=jk, joint_v=jv)
    kf = jnp.concatenate([k, jk], axis=1)
    vf = jnp.concatenate([v, jv], axis=1)
    ref = dense_attention(q.transpose(0, 2, 1, 3), kf.transpose(0, 2, 1, 3),
                          vf.transpose(0, 2, 1, 3)).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


def test_wan_forward_ring_fallback_heads_lt_devices():
    """Dense wan_forward on an 8-device mesh with 2 heads routes through
    ring attention and matches the single-device result."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jenga_tpu.models.wan import WanConfig, init_wan_params, wan_forward
    from jenga_tpu.parallel.mesh import make_sp_mesh

    mesh = make_sp_mesh()
    cfg = WanConfig(dim=64, ffn_dim=128, freq_dim=32, num_heads=2,
                    num_layers=1, text_dim=32, text_len=8, dtype="float32")
    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.in_dim, 2, 8, 16))
    t = jnp.array([300.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (1, cfg.text_len, cfg.text_dim))
    out_mesh = wan_forward(params, cfg, x, t, ctx, mesh=mesh)
    out_single = wan_forward(params, cfg, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out_mesh), np.asarray(out_single),
                               atol=3e-4, rtol=3e-4)


def test_wan_forward_carved_heads_not_divisible_raises():
    import jax
    import jax.numpy as jnp
    import pytest
    from jenga_tpu.curves.blocks import build_curve_plan
    from jenga_tpu.models.wan import (WanConfig, init_wan_params,
                                      make_wan_carve, wan_forward)
    from jenga_tpu.parallel.mesh import make_sp_mesh

    mesh = make_sp_mesh()
    cfg = WanConfig(dim=64, ffn_dim=128, freq_dim=32, num_heads=2,
                    num_layers=1, text_dim=32, text_len=8, dtype="float32")
    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    plan = build_curve_plan((2, 8, 16), "sliced", 128)
    carve = make_wan_carve(cfg, plan, sa_drop_rate=0.75, p_remain=0.9)
    x = jnp.zeros((1, cfg.in_dim, 2, 16, 32))
    t = jnp.array([300.0])
    ctx = jnp.zeros((1, cfg.text_len, cfg.text_dim))
    with pytest.raises(ValueError, match="divisible"):
        wan_forward(params, cfg, x, t, ctx, carve=carve, mesh=mesh)


def test_hy_forward_ring_joint_text_heads_lt_devices():
    """HY dense forward on an 8-device mesh with 2 heads: the joint-text
    ring path (video rows ring over tokens, replicated text KV appended)
    matches the single-device forward."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jenga_tpu.models.hyvideo import (HYVideoConfig,
                                          init_hyvideo_params,
                                          hyvideo_forward)
    from jenga_tpu.parallel.mesh import make_sp_mesh

    mesh = make_sp_mesh()
    cfg = HYVideoConfig(hidden_size=64, heads_num=2, double_blocks=1,
                        single_blocks=1, text_states_dim=48,
                        text_states_dim_2=16, rope_dim_list=(8, 12, 12),
                        dtype="float32")
    params = init_hyvideo_params(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (1, cfg.in_channels, 2, 8, 16))  # 128 tokens
    t = jnp.array([400.0])
    txt = jax.random.normal(jax.random.fold_in(key, 1),
                            (1, 24, cfg.text_states_dim))
    tmask = jnp.ones((1, 24), jnp.int32)
    txt2 = jax.random.normal(jax.random.fold_in(key, 2),
                             (1, cfg.text_states_dim_2))
    out_mesh = hyvideo_forward(params, cfg, x, t, txt, tmask, txt2,
                               mesh=mesh)
    out_single = hyvideo_forward(params, cfg, x, t, txt, tmask, txt2)
    np.testing.assert_allclose(np.asarray(out_mesh), np.asarray(out_single),
                               atol=3e-4, rtol=3e-4)


def test_ring_zero_joint_keys_no_nan():
    """A sample whose joint (text) mask is all padding must contribute
    zero weight, not NaN (exp(-inf - -inf) guard in _partial_attn)."""
    mesh = make_sp_mesh()
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (1, 32, 2, 8), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (1, 32, 2, 8),
                          jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (1, 32, 2, 8),
                          jnp.float32)
    jk = jax.random.normal(jax.random.fold_in(key, 3), (1, 4, 2, 8),
                           jnp.float32)
    jv = jax.random.normal(jax.random.fold_in(key, 4), (1, 4, 2, 8),
                           jnp.float32)
    out = ring_attention(q, k, v, mesh, joint_k=jk, joint_v=jv,
                         joint_kv_len=jnp.zeros((1,), jnp.int32))
    assert np.isfinite(np.asarray(out)).all()
    # zero valid joint keys == no joint chunk at all
    ref = ring_attention(q, k, v, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_ring_ulysses_composition_matches_dense():
    """Explicit 2-D ring x ulysses (world == 2 x 4) with joint text KV
    equals single-device dense attention — the reference's composition
    contract (`hyvideo/config.py:451-468`)."""
    from jenga_tpu.parallel.ring import ring_ulysses_attention

    mesh = make_sp_mesh(ring=2)
    assert dict(mesh.shape) == {"ring": 2, "sp": 4}
    b, s, h, d, st = 1, 8 * 32, 4, 32, 16   # heads divide ulysses=4
    q, k, v = _qkv(jax.random.PRNGKey(5), b, s, h, d)
    jk = jax.random.normal(jax.random.PRNGKey(6), (b, st, h, d))
    jv = jax.random.normal(jax.random.PRNGKey(7), (b, st, h, d))
    out = ring_ulysses_attention(q, k, v, mesh, joint_k=jk, joint_v=jv,
                                 joint_kv_len=st - 5)
    kf = jnp.concatenate([k, jk], axis=1)
    vf = jnp.concatenate([v, jv], axis=1)
    ref = dense_attention(q.transpose(0, 2, 1, 3), kf.transpose(0, 2, 1, 3),
                          vf.transpose(0, 2, 1, 3),
                          kv_len=jnp.array([s + st - 5])
                          ).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


def test_ring_ulysses_rejects_bad_heads():
    from jenga_tpu.parallel.ring import ring_ulysses_attention
    import pytest

    mesh = make_sp_mesh(ring=2)
    q, k, v = _qkv(jax.random.PRNGKey(8), 1, 8 * 16, 3, 16)  # 3 % 4 != 0
    with pytest.raises(ValueError, match="heads"):
        ring_ulysses_attention(q, k, v, mesh)


def test_mesh_builders_and_init_distributed():
    """Config plumbing: ring composition contract + single-process
    init_distributed no-op + multihost mesh shape."""
    import pytest
    from jenga_tpu.parallel.mesh import (init_distributed,
                                         make_multihost_sp_mesh)

    with pytest.raises(ValueError, match="ring"):
        make_sp_mesh(ring=3)             # 8 % 3 != 0
    assert init_distributed() == 1       # no coordinator: no-op
    m = make_multihost_sp_mesh()
    assert tuple(m.axis_names) == ("dp", "sp")
    assert m.shape["dp"] == 1 and m.shape["sp"] == 8
