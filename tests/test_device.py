"""Device-generation keying of kernel tuning constants (utils/device.py).

The measured constants are v5e's; PROJECTION.md documents the roofline
model behind the v5p/v6e picks. These tests pin the detection override,
the keyed group widths, and that the kernel dispatch path consumes them.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jenga_tpu.utils import device
from jenga_tpu.utils.device import (CHIP_SPECS, ChipSpec, gather_group_width,
                                    tpu_generation)


@pytest.fixture(autouse=True)
def _clear_cache(monkeypatch):
    tpu_generation.cache_clear()
    yield
    tpu_generation.cache_clear()


def test_generation_env_override(monkeypatch):
    monkeypatch.setenv("JENGA_TPU_GEN", "v5p")
    assert tpu_generation() == "v5p"


def test_generation_on_cpu_backend():
    # the test suite runs on the forced-CPU backend (conftest)
    assert tpu_generation() == "cpu"


def test_ridge_values():
    # published-spec sanity: ridge = peak FLOPs / HBM bytes
    assert CHIP_SPECS["v5e"].ridge == pytest.approx(240.5, abs=1.0)
    assert CHIP_SPECS["v5p"].ridge == pytest.approx(166.0, abs=1.0)
    assert CHIP_SPECS["v6e"].ridge == pytest.approx(559.8, abs=1.0)
    # v6e has LESS bandwidth per FLOP than v5e (PROJECTION.md's per-row
    # collapse argument rests on this ordering)
    assert CHIP_SPECS["v6e"].ridge > CHIP_SPECS["v5e"].ridge > \
        CHIP_SPECS["v5p"].ridge


def test_group_width_keying():
    # v5e measured default: 16 at d=128, halved at d=256
    assert gather_group_width(128, "v5e") == 16
    assert gather_group_width(256, "v5e") == 8
    # cpu (tests) mirrors v5e so golden/parity shapes are unchanged
    assert gather_group_width(128, "cpu") == 16
    # v5p projected: wider matmuls near the ridge
    assert gather_group_width(128, "v5p") == 24
    # floor at 4 for very fat heads
    assert gather_group_width(1024, "v5e") == 4
    assert gather_group_width(1024, "v5p") == 4


def test_group_width_uses_detected_generation(monkeypatch):
    monkeypatch.setenv("JENGA_TPU_GEN", "v5p")
    assert gather_group_width(128) == 24


def test_kind_map_longest_match(monkeypatch):
    # "TPU v5 lite" must map to v5e, not the bare-"v5" (=v5p) entry
    class _Dev:
        device_kind = "TPU v5 lite"

    monkeypatch.setattr(device.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(device.jax, "devices", lambda: [_Dev()])
    assert tpu_generation() == "v5e"

    tpu_generation.cache_clear()
    _Dev.device_kind = "TPU v5p chip"
    assert tpu_generation() == "v5p"

    tpu_generation.cache_clear()
    _Dev.device_kind = "some future tpu"
    assert tpu_generation() == "v5e"   # safe floor


def test_kernel_dispatch_consumes_keyed_width(monkeypatch):
    """The block-sparse kernel's group=None default must come from
    utils/device.py — outputs stay exact under either generation's pick."""
    from jenga_tpu.ops.attention_ref import block_sparse_attention_reference
    from jenga_tpu.ops.block_sparse_attention import block_sparse_attention
    from jenga_tpu.sparse.planner import mask_to_block_lists, pack_block_lists

    b, h, s, d = 1, 2, 512, 64
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, s, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, s, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, s, d), jnp.float32)
    nqb = s // 128
    mask = jnp.asarray(np.ones((b, h, nqb, nqb), bool))
    lists = pack_block_lists(*mask_to_block_lists(mask))
    ref = block_sparse_attention_reference(q, k, v, mask)

    outs = {}
    for gen in ("v5e", "v5p"):
        monkeypatch.setenv("JENGA_TPU_GEN", gen)
        tpu_generation.cache_clear()
        out = block_sparse_attention(q, k, v, lists)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
        outs[gen] = np.asarray(out)
    # group width is a pure scheduling knob: bit-identical math
    np.testing.assert_allclose(outs["v5e"], outs["v5p"], atol=2e-6)


def test_chipspec_frozen():
    import dataclasses
    with pytest.raises(dataclasses.FrozenInstanceError):
        CHIP_SPECS["v5e"].bf16_tflops = 0  # type: ignore[misc]
    assert isinstance(CHIP_SPECS["v5e"], ChipSpec)


def test_gather_group_pick_shape_aware(monkeypatch):
    from jenga_tpu.utils.device import gather_group_pick
    monkeypatch.delenv("JENGA_GATHER_GROUP", raising=False)
    # shape-INDEPENDENT by measurement (tools/smallshape_sweep.py +
    # in-model A/B neutral at the small shapes): q8 joint bf16 d=128
    # picks 8 at every nkb
    args = dict(head_dim=128, q_rows=8, all_member=True, kv_itemsize=2,
                generation="v5e")
    for nkb in (144, 222, 256, 898, None):
        assert gather_group_pick(nkb=nkb, **args) == 8
    # VMEM scaling unchanged: q16 quarters, f32 shrinks further
    assert gather_group_pick(128, 16, True, 2, 898, "v5e") == 4
    assert gather_group_pick(128, 16, True, 2, 144, "v5e") == 4
    assert gather_group_pick(128, 8, True, 4, 898, "v5e") == 4
    # per-row membership path (all_member=False) keeps the old halving
    assert gather_group_pick(128, 8, False, 2, 144, "v5e") == 8


def test_gather_group_pick_env_override(monkeypatch):
    from jenga_tpu.utils.device import gather_group_pick
    monkeypatch.setenv("JENGA_GATHER_GROUP", "6")
    assert gather_group_pick(128, 8, True, 2, 144, "v5e") == 6
