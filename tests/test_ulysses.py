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
