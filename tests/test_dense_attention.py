"""Dense attention dispatch tests (CPU fallback paths)."""

import jax
import jax.numpy as jnp
import numpy as np

from jenga_tpu.ops.flash_attention import attention_bshd, dense_attention


def _naive(q, k, v, causal=False):
    d = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * d ** -0.5
    if causal:
        mask = jnp.tril(jnp.ones(logits.shape[-2:], bool))
        logits = jnp.where(mask, logits, -jnp.inf)
    p = jax.nn.softmax(logits, -1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))


def test_dense_matches_naive():
    key = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (2, 3, 96, 32))
               for i in range(3))
    out = dense_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_naive(q, k, v)),
                               atol=1e-5, rtol=1e-5)


def test_dense_chunked_long_seq():
    key = jax.random.PRNGKey(1)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (1, 2, 5000, 32))
               for i in range(3))
    out = dense_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_naive(q, k, v)),
                               atol=1e-4, rtol=1e-4)


def test_causal():
    key = jax.random.PRNGKey(2)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (1, 2, 64, 16))
               for i in range(3))
    out = dense_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_naive(q, k, v, causal=True)),
                               atol=1e-5, rtol=1e-5)


def test_bshd_layout():
    key = jax.random.PRNGKey(3)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (2, 80, 4, 32))
               for i in range(3))
    out = attention_bshd(q, k, v)
    ref = dense_attention(*(x.transpose(0, 2, 1, 3) for x in (q, k, v)))
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref.transpose(0, 2, 1, 3)),
                               atol=1e-6)
