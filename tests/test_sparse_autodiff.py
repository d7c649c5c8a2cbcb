"""Carved-training autodiff: the Pallas kernels are forward-only, so
``ops/sparse_autodiff.sparse_attention_from_mask`` supplies a
recompute-style backward through the dense jnp oracle masked by the same
selection. These tests pin (a) the forward still dispatches to the
kernels, (b) gradients match differentiating the oracle directly —
including the joint-selection union expansion — and (c) a carve-bearing
Wan forward trains end-to-end under ``jax.grad`` (VERDICT r3 weak-5:
this used to die in Mosaic AD)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jenga_tpu.ops.attention_ref import block_sparse_attention_reference
from jenga_tpu.ops.sparse_autodiff import (_effective_mask,
                                           sparse_attention_from_mask)


def _rand_case(key, b=1, h=2, nqb=4, nkb=4, d=32, density=0.6):
    ks = jax.random.split(key, 4)
    s, skv = nqb * 128, nkb * 128
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, skv, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, skv, d), jnp.float32)
    mask = jax.random.uniform(ks[3], (b, h, nqb, nkb)) < density
    # every row keeps its diagonal block so no row is empty
    eye = jnp.eye(nqb, nkb, dtype=bool)[None, None]
    return q, k, v, mask | eye


def _oracle_grads(q, k, v, eff, g, **kw):
    def f(q, k, v):
        out = block_sparse_attention_reference(q, k, v, eff, **kw)
        return jnp.sum(out * g)
    return jax.grad(f, argnums=(0, 1, 2))(q, k, v)


@pytest.mark.parametrize("q_rows,joint", [(1, False), (2, False), (2, True)])
def test_grads_match_oracle(q_rows, joint):
    q, k, v, mask = _rand_case(jax.random.PRNGKey(0))
    g = jax.random.normal(jax.random.PRNGKey(1), q.shape, jnp.float32)

    def f(q, k, v):
        out = sparse_attention_from_mask(q, k, v, mask, q_rows=q_rows,
                                         joint=joint)
        return jnp.sum(out * g)

    val, grads = jax.value_and_grad(f, argnums=(0, 1, 2))(q, k, v)
    assert np.isfinite(float(val))

    eff = _effective_mask(mask, q_rows, joint)
    want = _oracle_grads(q, k, v, eff, g)
    for got, exp, name in zip(grads, want, "qkv"):
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                                   atol=2e-3, rtol=2e-3,
                                   err_msg=f"d{name} mismatch")


def test_joint_effective_mask_is_group_union():
    _, _, _, mask = _rand_case(jax.random.PRNGKey(2), nqb=4)
    eff = _effective_mask(mask, q_rows=2, joint=True)
    m = np.asarray(mask)
    e = np.asarray(eff)
    for grp in range(2):
        union = m[:, :, 2 * grp] | m[:, :, 2 * grp + 1]
        np.testing.assert_array_equal(e[:, :, 2 * grp], union)
        np.testing.assert_array_equal(e[:, :, 2 * grp + 1], union)
    # non-joint modes are exact
    np.testing.assert_array_equal(
        np.asarray(_effective_mask(mask, q_rows=2, joint=False)), m)


def test_forward_unchanged_by_vjp_wrapper():
    """The wrapper's primal is the same kernel dispatch the models used to
    call directly."""
    from jenga_tpu.ops.block_sparse_attention import \
        grouped_attention_from_mask
    from jenga_tpu.sparse.planner import (mask_to_block_lists,
                                          pack_block_lists)

    q, k, v, mask = _rand_case(jax.random.PRNGKey(3))
    out = sparse_attention_from_mask(q, k, v, mask)
    lists = pack_block_lists(*mask_to_block_lists(mask))
    want = __import__("jenga_tpu.ops.block_sparse_attention",
                      fromlist=["block_sparse_attention"]) \
        .block_sparse_attention(q, k, v, lists)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))

    out_j = sparse_attention_from_mask(q, k, v, mask, q_rows=2, joint=True)
    want_j = grouped_attention_from_mask(q, k, v, mask, q_rows=2,
                                         joint=True)
    np.testing.assert_array_equal(np.asarray(out_j), np.asarray(want_j))


def test_text_amp_and_seqlen_in_backward():
    """Bias and KV-length masking flow through the recompute backward."""
    q, k, v, mask = _rand_case(jax.random.PRNGKey(4), nqb=4, nkb=4)
    g = jax.random.normal(jax.random.PRNGKey(5), q.shape, jnp.float32)
    kw = dict(text_start_block=3, text_amp=-1.5)
    sl = 3 * 128 + 64

    def f(q, k, v):
        out = sparse_attention_from_mask(q, k, v, mask, seqlens=sl, **kw)
        return jnp.sum(out * g)

    grads = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    want = _oracle_grads(q, k, v, mask, g, seqlen=sl, **kw)
    for got, exp in zip(grads, want):
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                                   atol=2e-3, rtol=2e-3)
    # masked-out keys receive zero gradient
    assert float(jnp.abs(grads[1][:, :, sl:]).max()) == 0.0
    assert float(jnp.abs(grads[2][:, :, sl:]).max()) == 0.0


def test_carved_wan_forward_trains():
    """A carve-bearing Wan forward differentiates end-to-end (remat'd
    trunk included) and one LoRA train step runs — previously an opaque
    Mosaic/AD failure (VERDICT r3 weak-5)."""
    import optax
    from jenga_tpu.curves.blocks import build_curve_plan
    from jenga_tpu.models.wan import (WanConfig, init_wan_params,
                                      make_wan_carve, wan_forward)
    from jenga_tpu.train import (TransportConfig, init_lora,
                                 make_lora_train_step)

    cfg = WanConfig(dim=32, ffn_dim=64, freq_dim=16, num_heads=2,
                    num_layers=1, text_dim=16, text_len=4, dtype="float32")
    base = init_wan_params(jax.random.PRNGKey(0), cfg)
    base["head"]["linear"]["w"] = jax.random.normal(
        jax.random.PRNGKey(9), base["head"]["linear"]["w"].shape) * 0.1

    # latents (2, 16, 2, 32, 32) -> grid (2, 16, 16) = 512 tokens, 4 blocks
    plan = build_curve_plan((2, 16, 16), "sliced", 128)
    carve = make_wan_carve(cfg, plan, sa_drop_rate=0.75, p_remain=0.5)

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 2, 32, 32))
    t = jnp.array([500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 16))

    def loss(p):
        out = wan_forward(p, cfg, x, t, ctx, carve=carve, remat=True)
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(base)
    gn = float(jnp.linalg.norm(g["blocks"][0]["self_attn"]["q"]["w"]))
    assert np.isfinite(gn) and gn > 0.0

    batch = {"latents": x, "context": ctx}

    def model_apply(params, xt, tt, b):
        return wan_forward(params, cfg, xt, tt, b["context"], carve=carve)

    lora = init_lora(jax.random.PRNGKey(3), base, rank=2)
    opt = optax.adamw(1e-2)
    step = make_lora_train_step(model_apply, TransportConfig(shift=7.0), opt)
    lora2, _, l0 = step(lora, opt.init(lora), base, batch,
                        jax.random.PRNGKey(4))
    assert np.isfinite(float(l0))
    delta = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), lora2, 0.0)
    assert delta > 0.0   # the optimizer moved the adapters
