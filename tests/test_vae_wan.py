"""Wan VAE tests: stride arithmetic, shapes, finiteness (small cfg, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jenga_tpu.codec.vae_wan import (
    WanVAEConfig,
    init_wanvae_params,
    wanvae_decode,
    wanvae_encode,
)

SMALL = WanVAEConfig(dim=8, z_dim=4, dim_mult=(1, 2, 2, 2),
                     num_res_blocks=1)


@pytest.fixture(scope="module")
def params():
    return init_wanvae_params(jax.random.PRNGKey(0), SMALL)


@pytest.mark.parametrize("f", [1, 5, 9])
def test_encode_shapes(params, f):
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, f, 32, 32))
    z = wanvae_encode(params, x, SMALL, normalize=False)
    assert z.shape == (1, SMALL.z_dim, 1 + (f - 1) // 4, 4, 4)
    assert np.isfinite(np.asarray(z)).all()


@pytest.mark.parametrize("t", [1, 3])
def test_decode_shapes(params, t):
    z = jax.random.normal(jax.random.PRNGKey(2), (1, SMALL.z_dim, t, 4, 4))
    v = wanvae_decode(params, z, SMALL, normalize=False)
    assert v.shape == (1, 3, 1 + (t - 1) * 4, 32, 32)
    assert np.isfinite(np.asarray(v)).all()
    assert float(jnp.abs(v).max()) <= 1.0  # output clamp


def test_normalization_roundtrip():
    """encode normalize + decode un-normalize use the same constants."""
    from jenga_tpu.codec.vae_wan import WAN_LATENT_MEAN, WAN_LATENT_STD
    z = np.random.default_rng(0).standard_normal((1, 16, 2, 4, 4)) \
        .astype(np.float32)
    normed = (z - WAN_LATENT_MEAN.reshape(1, -1, 1, 1, 1)) \
        / WAN_LATENT_STD.reshape(1, -1, 1, 1, 1)
    back = normed * WAN_LATENT_STD.reshape(1, -1, 1, 1, 1) \
        + WAN_LATENT_MEAN.reshape(1, -1, 1, 1, 1)
    np.testing.assert_allclose(back, z, atol=1e-5)


def test_encode_decode_roundtrip_runs(params):
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 5, 32, 32)) * 0.5
    z = wanvae_encode(params, x, SMALL, normalize=False)
    v = wanvae_decode(params, z, SMALL, normalize=False)
    assert v.shape == x.shape
