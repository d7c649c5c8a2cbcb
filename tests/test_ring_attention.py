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
