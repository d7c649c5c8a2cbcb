"""HY causal 3-D VAE tests: shapes, causality, tiling (small config, CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jenga_tpu.codec.vae_hy import (
    HYVAEConfig,
    gaussian_sample,
    init_hyvae_params,
    vae_decode,
    vae_decode_tiled,
    vae_encode,
)

SMALL = HYVAEConfig(block_out_channels=(8, 16, 16, 16), norm_num_groups=4,
                    latent_channels=4, sample_tsize=8, sample_size=64,
                    layers_per_block=1)


@pytest.fixture(scope="module")
def params():
    return init_hyvae_params(jax.random.PRNGKey(0), SMALL)


def test_encode_decode_shapes(params):
    f, h, w = 9, 32, 48
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, f, h, w))
    moments = vae_encode(params, x, SMALL)
    lt = (f - 1) // 4 + 1
    assert moments.shape == (1, 2 * SMALL.latent_channels, lt, h // 8, w // 8)
    z = gaussian_sample(moments)
    video = vae_decode(params, z, SMALL)
    assert video.shape == (1, 3, f, h, w)
    assert np.isfinite(np.asarray(video)).all()


def test_causal_conv_is_temporally_causal():
    """The conv primitive itself: output frame t sees only frames <= t.
    (The full encoder/decoder are only conv-causal — GroupNorm statistics
    are global over T, matching the reference's behavior.)"""
    from jenga_tpu.codec.vae_hy import causal_conv3d
    key = jax.random.PRNGKey(2)
    p = {"w": jax.random.normal(key, (4, 3, 3, 3, 3)),
         "b": jnp.zeros((4,))}
    x = jax.random.normal(jax.random.fold_in(key, 1), (1, 3, 7, 8, 8))
    x2 = x.at[:, :, -1:].add(100.0)
    a = causal_conv3d(p, x)
    b = causal_conv3d(p, x2)
    np.testing.assert_allclose(np.asarray(a[:, :, :-1]),
                               np.asarray(b[:, :, :-1]), atol=1e-5)
    assert not np.allclose(np.asarray(a[:, :, -1]), np.asarray(b[:, :, -1]))


def test_causal_conv_stride_shape():
    from jenga_tpu.codec.vae_hy import causal_conv3d
    key = jax.random.PRNGKey(3)
    p = {"w": jax.random.normal(key, (4, 3, 3, 3, 3)), "b": jnp.zeros((4,))}
    x = jnp.zeros((1, 3, 9, 16, 16))
    out = causal_conv3d(p, x, stride=(2, 2, 2))
    # causal temporal stride-2: (T-1)//2 + 1
    assert out.shape == (1, 4, 5, 8, 8)


def test_gaussian_sample_modes(params):
    moments = jnp.concatenate([jnp.full((1, 4, 2, 2, 2), 3.0),
                               jnp.full((1, 4, 2, 2, 2), -30.0)], axis=1)
    mode = gaussian_sample(moments)
    np.testing.assert_allclose(np.asarray(mode), 3.0)
    sample = gaussian_sample(moments, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(sample), 3.0, atol=1e-3)


def test_tiled_decode_matches_untiled_when_single_tile(params):
    f, h, w = 5, 16, 16
    lt = (f - 1) // 4 + 1
    z = jax.random.normal(jax.random.PRNGKey(4),
                          (1, SMALL.latent_channels, lt, h // 8, w // 8))
    a = vae_decode(params, z, SMALL)
    b = vae_decode_tiled(params, z, SMALL)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_tiled_decode_multi_tile_shape(params):
    # force temporal + spatial tiling; ratios chosen so the reference
    # arithmetic is exact (limit == stride * time_ratio)
    cfg = dataclasses.replace(SMALL, sample_tsize=16, sample_size=32)
    f, h, w = 29, 64, 64
    lt = (f - 1) // 4 + 1
    z = jax.random.normal(jax.random.PRNGKey(5),
                          (1, cfg.latent_channels, lt, h // 8, w // 8))
    out = vae_decode_tiled(params, z, cfg)
    assert out.shape == (1, 3, f, h, w)
    assert np.isfinite(np.asarray(out)).all()


def test_tiled_encode_matches_untiled_when_single_tile(params):
    from jenga_tpu.codec.vae_hy import vae_encode_tiled
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 5, 32, 32))
    tiled = vae_encode_tiled(params, x, SMALL)
    untiled = vae_encode(params, x, SMALL)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(untiled),
                               atol=1e-5, rtol=1e-5)


def test_tiled_encode_multi_tile_shape(params):
    """Spatial+temporal multi-tile input: latent grid matches the untiled
    compression arithmetic exactly (reference temporal_tiled_encode,
    `/root/reference/hyvideo/vae/autoencoder_kl_causal_3d.py:465-498`).

    The temporal tile must satisfy (tile_lat - blend) * 4 == pixel overlap
    (production 64 -> 16/4/12/48 does; tiny 8 truncates blend to 0 and
    breaks the arithmetic), so the temporal test uses sample_tsize=16.
    """
    from jenga_tpu.codec.vae_hy import vae_encode_tiled
    cfg = dataclasses.replace(SMALL, sample_tsize=16)
    f, h, w = 21, 96, 128   # > sample_tsize(16) and > sample_size(64)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 3, f, h, w))
    moments = vae_encode_tiled(params, x, cfg)
    assert moments.shape == (1, 2 * SMALL.latent_channels,
                             (f - 1) // 4 + 1, h // 8, w // 8)
    assert np.isfinite(np.asarray(moments)).all()


def test_tiled_encode_decode_roundtrip(params):
    """Full tiled encode -> decode roundtrip keeps shapes and is finite."""
    from jenga_tpu.codec.vae_hy import vae_encode_tiled
    cfg = dataclasses.replace(SMALL, sample_tsize=16)
    f, h, w = 21, 64, 64
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 3, f, h, w))
    z = gaussian_sample(vae_encode_tiled(params, x, cfg))
    video = vae_decode_tiled(params, z, cfg)
    assert video.shape == (1, 3, f, h, w)
    assert np.isfinite(np.asarray(video)).all()
