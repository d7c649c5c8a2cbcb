"""Converter tests: synthetic torch state dicts -> param trees -> forward."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from jenga_tpu.convert import (
    convert_hyvae,
    convert_wan_dit,
    load_params,
    save_params,
)
from jenga_tpu.codec.vae_hy import HYVAEConfig, init_hyvae_params, vae_decode
from jenga_tpu.models.wan import WanConfig, init_wan_params, wan_forward

TINY_WAN = WanConfig(dim=64, ffn_dim=128, freq_dim=32, num_heads=2,
                     num_layers=2, text_dim=48, text_len=8, dtype="float32")


def _t(shape, seed):
    g = torch.Generator().manual_seed(seed)
    return torch.randn(*shape, generator=g)


def _wan_state_dict(cfg: WanConfig):
    d, fd = cfg.dim, cfg.ffn_dim
    sd, seed = {}, [0]

    def add(name, shape):
        seed[0] += 1
        sd[name] = _t(shape, seed[0])

    add("patch_embedding.weight", (d, cfg.in_dim, *cfg.patch_size))
    add("patch_embedding.bias", (d,))
    for i, (a, b) in enumerate([(cfg.text_dim, d), (d, d)]):
        add(f"text_embedding.{i * 2}.weight", (b, a))
        add(f"text_embedding.{i * 2}.bias", (b,))
    for i, (a, b) in enumerate([(cfg.freq_dim, d), (d, d)]):
        add(f"time_embedding.{i * 2}.weight", (b, a))
        add(f"time_embedding.{i * 2}.bias", (b,))
    add("time_projection.1.weight", (6 * d, d))
    add("time_projection.1.bias", (6 * d,))
    for i in range(cfg.num_layers):
        p = f"blocks.{i}"
        for a in ("self_attn", "cross_attn"):
            for n in ("q", "k", "v", "o"):
                add(f"{p}.{a}.{n}.weight", (d, d))
                add(f"{p}.{a}.{n}.bias", (d,))
            add(f"{p}.{a}.norm_q.weight", (d,))
            add(f"{p}.{a}.norm_k.weight", (d,))
        add(f"{p}.norm3.weight", (d,))
        add(f"{p}.norm3.bias", (d,))
        add(f"{p}.ffn.0.weight", (fd, d))
        add(f"{p}.ffn.0.bias", (fd,))
        add(f"{p}.ffn.2.weight", (d, fd))
        add(f"{p}.ffn.2.bias", (d,))
        add(f"{p}.modulation", (1, 6, d))
    add("head.head.weight", (math.prod(cfg.patch_size) * cfg.out_dim, d))
    add("head.head.bias", (math.prod(cfg.patch_size) * cfg.out_dim,))
    add("head.modulation", (1, 2, d))
    return sd


def test_convert_wan_matches_init_structure():
    sd = _wan_state_dict(TINY_WAN)
    params = convert_wan_dit(sd, TINY_WAN)
    ref = init_wan_params(jax.random.PRNGKey(0), TINY_WAN)
    ref_paths = {p for p, _ in
                 jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_paths = {p for p, _ in
                 jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_paths == got_paths
    # shapes line up
    for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(ref)[0],
                   key=lambda x: str(x[0])),
            sorted(jax.tree_util.tree_flatten_with_path(params)[0],
                   key=lambda x: str(x[0]))):
        assert np.shape(a) == np.shape(b), (pa, np.shape(a), np.shape(b))


def test_converted_wan_runs_forward():
    sd = _wan_state_dict(TINY_WAN)
    params = jax.tree.map(jnp.asarray, convert_wan_dit(sd, TINY_WAN))
    x = jnp.ones((1, TINY_WAN.in_dim, 2, 8, 8)) * 0.1
    ctx = jnp.zeros((1, TINY_WAN.text_len, TINY_WAN.text_dim))
    out = wan_forward(params, TINY_WAN, x, jnp.array([100.0]), ctx)
    assert out.shape == (1, TINY_WAN.out_dim, 2, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_linear_transposition():
    """torch Linear [out,in] must land as [in,out]: y = x @ w + b equals
    torch's x @ W.T + b."""
    sd = _wan_state_dict(TINY_WAN)
    params = convert_wan_dit(sd, TINY_WAN)
    w_torch = sd["blocks.0.self_attn.q.weight"].numpy()
    x = np.random.default_rng(0).standard_normal(TINY_WAN.dim).astype(
        np.float32)
    ours = x @ params["blocks"][0]["self_attn"]["q"]["w"] \
        + params["blocks"][0]["self_attn"]["q"]["b"]
    theirs = w_torch @ x + sd["blocks.0.self_attn.q.bias"].numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_save_load_roundtrip(tmp_path):
    params = init_wan_params(jax.random.PRNGKey(1), TINY_WAN)
    path = str(tmp_path / "wan.npz")
    save_params(path, params)
    loaded = load_params(path, params)
    for (_, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(loaded)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _vae_state_dict(cfg: HYVAEConfig):
    sd, seed = {}, [100]

    def add(name, shape):
        seed[0] += 1
        sd[name] = _t(shape, seed[0])

    def conv(name, ci, co, k=3):
        add(f"{name}.conv.weight", (co, ci, k, k, k))
        add(f"{name}.conv.bias", (co,))

    def norm(name, c):
        add(f"{name}.weight", (c,))
        add(f"{name}.bias", (c,))

    def resnet(pre, ci, co):
        norm(f"{pre}.norm1", ci)
        conv(f"{pre}.conv1", ci, co)
        norm(f"{pre}.norm2", co)
        conv(f"{pre}.conv2", co, co)
        if ci != co:
            conv(f"{pre}.conv_shortcut", ci, co, k=1)

    def mid(pre, c):
        resnet(f"{pre}.resnets.0", c, c)
        resnet(f"{pre}.resnets.1", c, c)
        a = f"{pre}.attentions.0"
        norm(f"{a}.group_norm", c)
        for nm in ("to_q", "to_k", "to_v", "to_out.0"):
            add(f"{a}.{nm}.weight", (c, c))
            add(f"{a}.{nm}.bias", (c,))

    ch = cfg.block_out_channels
    conv("encoder.conv_in", cfg.in_channels, ch[0])
    c_in = ch[0]
    for i, c_out in enumerate(ch):
        for j in range(cfg.layers_per_block):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}",
                   c_in if j == 0 else c_out, c_out)
        if i != len(ch) - 1:
            conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", c_out,
                 c_out)
        c_in = c_out
    mid("encoder.mid_block", ch[-1])
    norm("encoder.conv_norm_out", ch[-1])
    conv("encoder.conv_out", ch[-1], 2 * cfg.latent_channels)

    rch = list(reversed(ch))
    conv("decoder.conv_in", cfg.latent_channels, ch[-1])
    mid("decoder.mid_block", ch[-1])
    c_in = rch[0]
    for i, c_out in enumerate(rch):
        for j in range(cfg.layers_per_block + 1):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}",
                   c_in if j == 0 else c_out, c_out)
        if i != len(rch) - 1:
            conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", c_out, c_out)
        c_in = c_out
    norm("decoder.conv_norm_out", ch[0])
    conv("decoder.conv_out", ch[0], cfg.out_channels)

    lc = cfg.latent_channels
    add("quant_conv.weight", (2 * lc, 2 * lc, 1, 1, 1))
    add("quant_conv.bias", (2 * lc,))
    add("post_quant_conv.weight", (lc, lc, 1, 1, 1))
    add("post_quant_conv.bias", (lc,))
    return sd


def test_convert_vae_structure_and_decode():
    cfg = HYVAEConfig(block_out_channels=(8, 16, 16, 16), norm_num_groups=4,
                      latent_channels=4, layers_per_block=1)
    sd = _vae_state_dict(cfg)
    params = convert_hyvae(sd, cfg)
    ref = init_hyvae_params(jax.random.PRNGKey(0), cfg)
    ref_paths = {p for p, _ in
                 jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_paths = {p for p, _ in
                 jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_paths == got_paths
    z = jnp.ones((1, 4, 2, 4, 4)) * 0.1
    out = vae_decode(jax.tree.map(jnp.asarray, params), z, cfg)
    assert out.shape == (1, 3, 5, 32, 32)


def _wanvae_state_dict(cfg):
    from jenga_tpu.codec.vae_wan import WanVAEConfig
    sd, seed = {}, [500]

    def add(name, shape):
        seed[0] += 1
        sd[name] = _t(shape, seed[0])

    def c3(name, ci, co, k=(3, 3, 3)):
        add(f"{name}.weight", (co, ci, *k))
        add(f"{name}.bias", (co,))

    def c2(name, ci, co, k=3):
        add(f"{name}.weight", (co, ci, k, k))
        add(f"{name}.bias", (co,))

    def rms(name, c, dims=(1, 1, 1)):
        add(f"{name}.gamma", (c, *dims))

    def res(pre, ci, co):
        rms(f"{pre}.residual.0", ci)
        c3(f"{pre}.residual.2", ci, co)
        rms(f"{pre}.residual.3", co)
        c3(f"{pre}.residual.6", co, co)
        if ci != co:
            c3(f"{pre}.shortcut", ci, co, k=(1, 1, 1))

    def attnb(pre, c):
        rms(f"{pre}.norm", c, dims=(1, 1))
        c2(f"{pre}.to_qkv", c, 3 * c, k=1)
        c2(f"{pre}.proj", c, c, k=1)

    dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
    c3("encoder.conv1", 3, dims[0])
    idx = 0
    c = dims[0]
    for i, co in enumerate(dims[1:]):
        for _ in range(cfg.num_res_blocks):
            res(f"encoder.downsamples.{idx}", c, co)
            c = co
            idx += 1
        if i != len(cfg.dim_mult) - 1:
            pre = f"encoder.downsamples.{idx}"
            c2(f"{pre}.resample.1", co, co)
            if cfg.temporal_downsample[i]:
                c3(f"{pre}.time_conv", co, co, k=(3, 1, 1))
            idx += 1
    cm = dims[-1]
    res("encoder.middle.0", cm, cm)
    attnb("encoder.middle.1", cm)
    res("encoder.middle.2", cm, cm)
    rms("encoder.head.0", cm)
    c3("encoder.head.2", cm, 2 * cfg.z_dim)

    rdims = [cfg.dim * u for u in (cfg.dim_mult[-1],)
             + tuple(reversed(cfg.dim_mult))]
    t_up = tuple(reversed(cfg.temporal_downsample))
    c3("decoder.conv1", cfg.z_dim, rdims[0])
    res("decoder.middle.0", rdims[0], rdims[0])
    attnb("decoder.middle.1", rdims[0])
    res("decoder.middle.2", rdims[0], rdims[0])
    idx = 0
    for i, co in enumerate(rdims[1:]):
        ci = rdims[i] // 2 if i in (1, 2, 3) else rdims[i]
        c = ci
        for _ in range(cfg.num_res_blocks + 1):
            res(f"decoder.upsamples.{idx}", c, co)
            c = co
            idx += 1
        if i != len(cfg.dim_mult) - 1:
            pre = f"decoder.upsamples.{idx}"
            c2(f"{pre}.resample.1", co, co // 2)
            if t_up[i]:
                c3(f"{pre}.time_conv", co, 2 * co, k=(3, 1, 1))
            idx += 1
    rms("decoder.head.0", cfg.dim)
    c3("decoder.head.2", cfg.dim, 3)

    c3("conv1", 2 * cfg.z_dim, 2 * cfg.z_dim, k=(1, 1, 1))
    c3("conv2", cfg.z_dim, cfg.z_dim, k=(1, 1, 1))
    return sd


def test_convert_wanvae_structure_and_run():
    from jenga_tpu.codec.vae_wan import (
        WanVAEConfig, init_wanvae_params, wanvae_decode)
    from jenga_tpu.convert import convert_wanvae
    cfg = WanVAEConfig(dim=8, z_dim=4, dim_mult=(1, 2, 2, 2),
                       num_res_blocks=1)
    sd = _wanvae_state_dict(cfg)
    params = convert_wanvae(sd, cfg)
    ref = init_wanvae_params(jax.random.PRNGKey(0), cfg)
    ref_paths = {p for p, _ in jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_paths = {p for p, _ in
                 jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_paths == got_paths
    for (pa, a), (_, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(ref)[0],
                   key=lambda x: str(x[0])),
            sorted(jax.tree_util.tree_flatten_with_path(params)[0],
                   key=lambda x: str(x[0]))):
        assert np.shape(a) == np.shape(b), (pa, np.shape(a), np.shape(b))
    z = jnp.ones((1, 4, 2, 4, 4)) * 0.1
    out = wanvae_decode(jax.tree.map(jnp.asarray, params), z, cfg,
                        normalize=False)
    assert out.shape == (1, 3, 5, 32, 32)


def test_orbax_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jenga_tpu.convert import load_params_orbax, save_params_orbax
    tree = {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
            "blocks": [{"w": jnp.ones((4, 4), jnp.bfloat16)}]}
    path = str(tmp_path / "ckpt")
    save_params_orbax(path, tree)
    back = load_params_orbax(path, like=tree)
    np.testing.assert_array_equal(np.asarray(back["a"]),
                                  np.asarray(tree["a"]))
    assert back["blocks"][0]["w"].dtype == jnp.bfloat16
