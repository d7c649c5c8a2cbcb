"""Carving planner properties + Pallas kernel vs dense-masked reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jenga_tpu.curves.blocks import build_curve_plan
from jenga_tpu.ops.attention_ref import block_sparse_attention_reference
from jenga_tpu.ops.block_sparse_attention import block_sparse_attention
from jenga_tpu.sparse.planner import (
    build_block_mask,
    mask_to_block_lists,
    pack_block_lists,
    plan_block_sparsity,
)


def _lists(mask, seqlens=None):
    return pack_block_lists(*mask_to_block_lists(mask), seqlens=seqlens)

BM = 128


def _qkv(key, b, h, s, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, s, d), dtype)
    k = jax.random.normal(kk, (b, h, s, d), dtype)
    v = jax.random.normal(kv, (b, h, s, d), dtype)
    return q, k, v


class TestPlanner:
    def setup_method(self, method):
        self.key = jax.random.PRNGKey(0)

    def test_mask_shape_and_text_forcing(self):
        b, h, s, d = 1, 2, 8 * BM, 64
        q, k, _ = _qkv(self.key, b, h, s, d)
        tsb, tb = 6, 2
        mask = build_block_mask(q[:, :, :tsb * BM], k, top_k=1, p_remain=0.3,
                                text_start_block=tsb, text_blocks=tb,
                                block_neighbors=None)
        assert mask.shape == (b, h, tsb, 8)
        assert bool(mask[..., tsb:tsb + tb].all())

    def test_top_k_floor(self):
        b, h, s, d = 1, 1, 8 * BM, 64
        q, k, _ = _qkv(self.key, b, h, s, d)
        tsb = 6
        mask = build_block_mask(q[:, :, :tsb * BM], k, top_k=4, p_remain=1e-6,
                                text_start_block=tsb, text_blocks=2,
                                block_neighbors=None)
        video = mask[..., :tsb]
        assert int(video.sum(-1).min()) >= 4

    def test_top_p_monotone(self):
        """Higher p_remain never selects fewer blocks."""
        b, h, s, d = 1, 2, 16 * BM, 64
        q, k, _ = _qkv(self.key, b, h, s, d)
        tsb = 14
        masks = [
            build_block_mask(q[:, :, :tsb * BM], k, top_k=1, p_remain=p,
                             text_start_block=tsb, text_blocks=2,
                             block_neighbors=None)[..., :tsb]
            for p in (0.1, 0.5, 0.9)
        ]
        c = [int(m.sum()) for m in masks]
        assert c[0] <= c[1] <= c[2]

    def test_adjacency_is_superset(self):
        plan = build_curve_plan((4, 16, 16), "gilbert", BM)
        nqb = plan.num_blocks
        s = nqb * BM
        q, k, _ = _qkv(self.key, 1, 1, s + 2 * BM, 64)
        mask = build_block_mask(q[:, :, :s], k, top_k=1, p_remain=0.01,
                                text_start_block=nqb, text_blocks=2,
                                block_neighbors=jnp.asarray(plan.block_neighbors))
        video = np.asarray(mask[0, 0, :, :nqb])
        assert (video | ~plan.block_neighbors).all()

    def test_first_frame_forcing(self):
        b, h = 1, 1
        tsb, ffb = 8, 2
        s = (tsb + 2) * BM
        q, k, _ = _qkv(self.key, b, h, s, 64)
        mask = build_block_mask(q[:, :, :tsb * BM], k, top_k=1, p_remain=0.05,
                                text_start_block=tsb, text_blocks=2,
                                block_neighbors=None, first_frame_blocks=ffb)
        assert bool(mask[:, :, :ffb, :ffb].all())

    def test_sel_group_rows_uniform_and_supersets(self):
        """Joint group selection: rows within a group identical; adjacency
        becomes the union of member-row neighborhoods (a superset of each
        row's own 26-neighborhood); group-level floor respected."""
        plan = build_curve_plan((4, 16, 16), "gilbert", BM)
        nqb = plan.num_blocks
        s = nqb * BM
        g = 2
        q, k, _ = _qkv(self.key, 1, 2, s + 2 * BM, 64)
        mask = build_block_mask(q[:, :, :s], k, top_k=3, p_remain=0.01,
                                text_start_block=nqb, text_blocks=2,
                                block_neighbors=jnp.asarray(
                                    plan.block_neighbors),
                                sel_group=g)
        m = np.asarray(mask)
        ng = -(-nqb // g)
        pad = ng * g - nqb
        mp = np.concatenate(
            [m, np.zeros((*m.shape[:2], pad, m.shape[-1]), bool)], axis=2)
        grp = mp.reshape(*m.shape[:2], ng, g, m.shape[-1])
        # rows of each full group identical (tail group may be ragged)
        full_groups = nqb // g
        assert (grp[:, :, :full_groups, 0:1] ==
                grp[:, :, :full_groups]).all()
        # adjacency superset: every row covers its own 26-neighborhood
        video = m[0, 0, :, :nqb]
        assert (video | ~plan.block_neighbors).all()
        # floor: at least top_k video blocks per row
        assert (m[..., :nqb].sum(-1) >= 3).all()

    def test_sel_group_first_frame_forcing(self):
        b, h = 1, 1
        tsb, ffb, g = 8, 3, 2
        s = (tsb + 2) * BM
        q, k, _ = _qkv(self.key, b, h, s, 64)
        mask = build_block_mask(q[:, :, :tsb * BM], k, top_k=1,
                                p_remain=0.05, text_start_block=tsb,
                                text_blocks=2, block_neighbors=None,
                                first_frame_blocks=ffb, sel_group=g)
        # every group containing a first-frame row sees all ff blocks:
        # rows 0..ceil(ffb/g)*g-1 get them (superset of the per-row rule)
        rows = -(-ffb // g) * g
        assert bool(mask[:, :, :rows, :ffb].all())

    def test_mask_to_block_lists_roundtrip(self):
        mask = jax.random.bernoulli(self.key, 0.3, (2, 3, 5, 7))
        indices, counts = mask_to_block_lists(mask)
        mask_np = np.asarray(mask)
        idx_np, cnt_np = np.asarray(indices), np.asarray(counts)
        assert (cnt_np == mask_np.sum(-1)).all()
        for b in range(2):
            for h in range(3):
                for qb in range(5):
                    n = cnt_np[b, h, qb]
                    sel = idx_np[b, h, qb, :n]
                    assert sorted(sel.tolist()) == sel.tolist()
                    assert set(sel.tolist()) == set(
                        np.nonzero(mask_np[b, h, qb])[0].tolist())


class TestKernelVsReference:
    def setup_method(self, method):
        self.key = jax.random.PRNGKey(1)

    def _run(self, b, h, nqb, d, dtype, text_amp=0.0, tsb=None, seqlen=None,
             density=0.5):
        s = nqb * BM
        q, k, v = _qkv(self.key, b, h, s, d, dtype)
        mask = jax.random.bernoulli(
            jax.random.fold_in(self.key, 7), density, (b, h, nqb, nqb))
        # guarantee at least one selected block per row
        mask = mask.at[..., 0].set(True)
        if tsb is not None:
            mask = mask.at[..., tsb:].set(True)
        kwargs = dict(text_amp=text_amp,
                      text_start_block=tsb if tsb is not None else nqb)
        out = block_sparse_attention(q, k, v, _lists(mask, seqlens=seqlen),
                                     interpret=True, **kwargs)
        ref = block_sparse_attention_reference(q, k, v, mask, seqlen=seqlen,
                                               **kwargs)
        return np.asarray(out), np.asarray(ref)

    def test_f32_matches_reference(self):
        out, ref = self._run(1, 2, 4, 64, jnp.float32)
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)

    def test_bf16_matches_reference(self):
        out, ref = self._run(1, 2, 4, 128, jnp.bfloat16)
        np.testing.assert_allclose(out.astype(np.float32),
                                   ref.astype(np.float32), atol=4e-2)

    def test_text_amp_bias(self):
        out, ref = self._run(1, 1, 4, 64, jnp.float32, text_amp=-1.5, tsb=3)
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)
        out0, _ = self._run(1, 1, 4, 64, jnp.float32, text_amp=0.0, tsb=3)
        assert not np.allclose(out, out0)  # bias actually changes the result

    def test_partial_last_block_seqlen_mask(self):
        out, ref = self._run(1, 1, 4, 64, jnp.float32, seqlen=4 * BM - 37)
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)

    def test_per_sample_seqlens(self):
        """Each batch sample carries its own valid-KV length (how padded
        text tokens are masked; the reference broadcasts sample 0's)."""
        b, h, nqb, d = 2, 1, 4, 64
        s = nqb * BM
        q, k, v = _qkv(self.key, b, h, s, d, jnp.float32)
        mask = jnp.ones((b, h, nqb, nqb), bool)
        seqlens = jnp.asarray([s - 100, s - 7], jnp.int32)
        out = block_sparse_attention(q, k, v, _lists(mask, seqlens=seqlens),
                                     interpret=True)
        ref = block_sparse_attention_reference(q, k, v, mask,
                                               seqlen=seqlens)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_full_mask_equals_dense_attention(self):
        b, h, nqb, d = 1, 2, 3, 64
        s = nqb * BM
        q, k, v = _qkv(self.key, b, h, s, d, jnp.float32)
        mask = jnp.ones((b, h, nqb, nqb), bool)
        out = block_sparse_attention(q, k, v, _lists(mask), interpret=True)
        expected = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k) * d ** -0.5, -1)
        expected = jnp.einsum("bhqk,bhkd->bhqd", expected, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                                   atol=2e-5, rtol=2e-5)

    def test_planner_kernel_end_to_end(self):
        """Planner-produced lists drive the kernel; video rows differ from
        dense only where planner dropped blocks."""
        b, h, d = 1, 2, 64
        tsb, tb = 6, 2
        nqb = tsb + tb
        s = nqb * BM
        q, k, v = _qkv(self.key, b, h, s, d, jnp.float32)
        mask, packed = plan_block_sparsity(
            q[:, :, :tsb * BM], k, None, top_k=2, p_remain=0.4,
            text_start_block=tsb, text_blocks=tb)
        # text query rows attend densely
        full = jnp.ones((b, h, nqb - tsb, nqb), bool)
        packed_t = _lists(full)
        lists = jnp.concatenate([packed, packed_t], axis=2)
        full_mask = jnp.concatenate([mask, full], axis=2)
        out = block_sparse_attention(q, k, v, lists,
                                     text_start_block=tsb, interpret=True)
        ref = block_sparse_attention_reference(q, k, v, full_mask,
                                               text_start_block=tsb)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_head_dim_below_tile_padded(self):
        """head_dims below the 128-lane tile (reference Triton supports
        {16,32,64,128}) go through the zero-pad wrapper path."""
        for d in (16, 32, 64):
            out, ref = self._run(1, 2, 4, d, jnp.float32)
            assert out.shape[-1] == d
            np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


class TestGroupedKernel:
    """Shared-gather mode must be output-equivalent to the per-row kernel
    (same mask, union lists + membership bits)."""

    def _case(self, q_rows, text_amp=0.0, tsb=None, seqlen=None):
        from jenga_tpu.ops.block_sparse_attention import (
            block_sparse_attention, block_sparse_attention_grouped)
        from jenga_tpu.sparse.planner import (
            mask_to_block_lists, pack_block_lists, pack_block_lists_grouped)

        key = jax.random.PRNGKey(11)
        b, h, s, d = 1, 2, 2048, 128
        nb = s // 128
        tsb = nb if tsb is None else tsb
        kq, kk, kv, km = jax.random.split(key, 4)
        q = jax.random.normal(kq, (b, h, s, d), jnp.float32)
        k = jax.random.normal(kk, (b, h, s, d), jnp.float32)
        v = jax.random.normal(kv, (b, h, s, d), jnp.float32)
        mask = jax.random.uniform(km, (b, h, nb, nb)) < 0.35
        mask = mask.at[:, :, jnp.arange(nb), jnp.arange(nb)].set(True)
        if tsb < nb:
            mask = mask.at[..., tsb:].set(True)
            mask = mask.at[:, :, tsb:].set(True)
        lists = pack_block_lists(*mask_to_block_lists(mask),
                                 seqlens=seqlen)
        glists = pack_block_lists_grouped(mask, q_rows, seqlens=seqlen)
        ref = block_sparse_attention(q, k, v, lists, text_amp=text_amp,
                                     text_start_block=tsb)
        out = block_sparse_attention_grouped(
            q, k, v, glists, q_rows=q_rows, text_amp=text_amp,
            text_start_block=tsb)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5, rtol=3e-5)

    def test_group2(self):
        self._case(2)

    def test_group4_text_amp_seqlen(self):
        self._case(4, text_amp=1.5, tsb=14, seqlen=2048 - 57)

    def test_all_member_joint_lists(self):
        """all_member=True (joint selection): a group-uniform mask packed
        WITHOUT membership words must match the per-row kernel on the
        expanded mask."""
        from jenga_tpu.ops.block_sparse_attention import (
            block_sparse_attention, block_sparse_attention_grouped)
        from jenga_tpu.sparse.planner import (
            mask_to_block_lists, pack_block_lists)

        key = jax.random.PRNGKey(12)
        b, h, s, d, q_rows = 1, 2, 2048, 128, 4
        nb = s // 128
        # text boundary aligned to the group width: rows of a group share
        # one selection, so a video/text boundary INSIDE a group would make
        # the video rows attend the full union (documented superset) and
        # differ from the per-row reference.
        tsb = nb - 4
        seqlen = s - 99
        kq, kk, kv, km = jax.random.split(key, 4)
        q = jax.random.normal(kq, (b, h, s, d), jnp.float32)
        k = jax.random.normal(kk, (b, h, s, d), jnp.float32)
        v = jax.random.normal(kv, (b, h, s, d), jnp.float32)
        # group-uniform mask: select at group granularity, expand to rows
        gmask = jax.random.uniform(km, (b, h, nb // q_rows, nb)) < 0.35
        gmask = gmask.at[..., tsb:].set(True)
        mask = jnp.repeat(gmask, q_rows, axis=2)
        mask = mask.at[:, :, tsb:].set(True)
        gmask = jnp.any(mask.reshape(b, h, nb // q_rows, q_rows, nb), axis=3)

        lists = pack_block_lists(*mask_to_block_lists(mask), seqlens=seqlen)
        ref = block_sparse_attention(q, k, v, lists, text_amp=0.8,
                                     text_start_block=tsb)
        glists = pack_block_lists(*mask_to_block_lists(gmask),
                                  seqlens=seqlen)
        out = block_sparse_attention_grouped(
            q, k, v, glists, q_rows=q_rows, text_amp=0.8,
            text_start_block=tsb, all_member=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-3, rtol=3e-3)

    def test_joint_helper_matches_per_row(self):
        """grouped_attention_from_mask(joint=True) on a sel_group mask
        equals the per-row kernel (boundary text group becomes a full
        union — superset semantics only for rows already full)."""
        from jenga_tpu.ops.block_sparse_attention import (
            block_sparse_attention, grouped_attention_from_mask)
        from jenga_tpu.sparse.planner import (
            build_block_mask, mask_to_block_lists, pack_block_lists)

        key = jax.random.PRNGKey(13)
        b, h, d, q_rows = 1, 2, 128, 2
        nb, tsb = 6, 4
        s = nb * 128
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, h, s, d), jnp.float32)
        k = jax.random.normal(kk, (b, h, s, d), jnp.float32)
        v = jax.random.normal(kv, (b, h, s, d), jnp.float32)
        m = build_block_mask(q[:, :, :tsb * 128], k, top_k=1, p_remain=0.3,
                             text_start_block=tsb, text_blocks=2,
                             block_neighbors=None, sel_group=q_rows)
        # rows within a selection group must be identical
        m2 = m.reshape(b, h, tsb // q_rows, q_rows, nb)
        assert bool(jnp.all(m2[:, :, :, 0:1] == m2))
        mask = jnp.concatenate(
            [m, jnp.ones((b, h, nb - tsb, nb), bool)], axis=2)
        lists = pack_block_lists(*mask_to_block_lists(mask), seqlens=s - 13)
        ref = block_sparse_attention(q, k, v, lists, text_start_block=tsb,
                                     text_amp=0.7)
        out = grouped_attention_from_mask(
            q, k, v, mask, q_rows=q_rows, seqlens=s - 13,
            text_start_block=tsb, text_amp=0.7, joint=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-3, rtol=3e-3)


class TestGroupedQ16:
    """q_rows=16 is joint/all-member only (no membership words): gather
    bytes halve again vs q_rows=8 at unchanged FLOPs."""

    def test_all_member_q16_matches_per_row(self):
        from jenga_tpu.ops.block_sparse_attention import (
            block_sparse_attention, block_sparse_attention_grouped)
        from jenga_tpu.sparse.planner import (
            mask_to_block_lists, pack_block_lists)

        key = jax.random.PRNGKey(14)
        b, h, s, d, q_rows = 1, 1, 4096, 128, 16
        nb = s // 128
        tsb = nb - 16          # text boundary aligned to the group width
        seqlen = s - 77
        kq, kk, kv, km = jax.random.split(key, 4)
        q = jax.random.normal(kq, (b, h, s, d), jnp.float32)
        k = jax.random.normal(kk, (b, h, s, d), jnp.float32)
        v = jax.random.normal(kv, (b, h, s, d), jnp.float32)
        gmask = jax.random.uniform(km, (b, h, nb // q_rows, nb)) < 0.3
        gmask = gmask.at[..., tsb:].set(True)
        mask = jnp.repeat(gmask, q_rows, axis=2)
        mask = mask.at[:, :, tsb:].set(True)
        gmask = jnp.any(mask.reshape(b, h, nb // q_rows, q_rows, nb), axis=3)

        lists = pack_block_lists(*mask_to_block_lists(mask), seqlens=seqlen)
        ref = block_sparse_attention(q, k, v, lists, text_amp=0.8,
                                     text_start_block=tsb)
        glists = pack_block_lists(*mask_to_block_lists(gmask),
                                  seqlens=seqlen)
        out = block_sparse_attention_grouped(
            q, k, v, glists, q_rows=q_rows, text_amp=0.8,
            text_start_block=tsb, all_member=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-3, rtol=3e-3)

    def test_q16_without_all_member_rejected(self):
        from jenga_tpu.ops.block_sparse_attention import (
            block_sparse_attention_grouped)
        q = jnp.zeros((1, 1, 2048, 128), jnp.float32)
        lists = jnp.zeros((1, 1, 1, 2048), jnp.int32)
        with pytest.raises(ValueError, match="q_rows"):
            block_sparse_attention_grouped(q, q, q, lists, q_rows=16)

    def test_carve_q16_requires_joint(self):
        from jenga_tpu.curves.blocks import build_curve_plan
        from jenga_tpu.models.wan import WAN_T2V_1_3B, make_wan_carve
        plan = build_curve_plan((2, 4, 6), "sliced", 128)
        with pytest.raises(ValueError, match="joint"):
            make_wan_carve(WAN_T2V_1_3B, plan, sa_drop_rate=0.75,
                           p_remain=0.15, q_rows=16, joint_sel=False)

    def test_joint_helper_q16_with_row_padding(self):
        """grouped_attention_from_mask(joint=True, q_rows=16) on a mask
        whose query-row count is NOT a multiple of 16 (pads 20 -> 32 rows;
        padded rows produce zeros and are sliced off)."""
        from jenga_tpu.ops.block_sparse_attention import (
            block_sparse_attention, grouped_attention_from_mask)
        from jenga_tpu.sparse.planner import (
            mask_to_block_lists, pack_block_lists)

        key = jax.random.PRNGKey(15)
        b, h, d, q_rows = 1, 1, 128, 16
        nb, tsb = 20, 16
        s = nb * 128
        kq, kk, kv, km = jax.random.split(key, 4)
        q = jax.random.normal(kq, (b, h, s, d), jnp.float32)
        k = jax.random.normal(kk, (b, h, s, d), jnp.float32)
        v = jax.random.normal(kv, (b, h, s, d), jnp.float32)
        # sel_group=16-style mask: rows 0..15 share one selection, the
        # text rows 16..19 are full
        grow = jax.random.uniform(km, (b, h, 1, nb)) < 0.4
        grow = grow.at[..., tsb:].set(True)
        mask = jnp.concatenate(
            [jnp.repeat(grow, tsb, axis=2),
             jnp.ones((b, h, nb - tsb, nb), bool)], axis=2)

        lists = pack_block_lists(*mask_to_block_lists(mask), seqlens=s - 31)
        ref = block_sparse_attention(q, k, v, lists, text_start_block=tsb,
                                     text_amp=0.6)
        out = grouped_attention_from_mask(
            q, k, v, mask, q_rows=q_rows, seqlens=s - 31,
            text_start_block=tsb, text_amp=0.6, joint=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-3, rtol=3e-3)
