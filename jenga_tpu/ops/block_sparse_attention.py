"""Pallas TPU block-sparse flash attention with dynamic per-row block lists.

The flagship kernel of the framework: streaming-softmax attention where each
128-row query block attends only to the key/value blocks named in a per-
(batch·head, query-block) index list produced by the carving planner. Key
design points, TPU-first rather than a port of the reference Triton kernel
(`/root/reference/hyvideo/modules/attention_block_triton_diffres.py:38-136`):

  * **Index lists, not one-hot masks.** The Triton kernel iterates all key
    blocks and branches on a one-hot row. On TPU, branching per block would
    still serialize the grid, so the kernel runs a *dynamic-length*
    ``fori_loop`` over exactly ``counts[bh, qb]`` selected blocks (the
    reference's own Wan variant, `/root/reference/wan/modules/
    attention_block_triton_diffres.py:39-144`, validates the encoding).
  * **KV stays in HBM** (115k-token sequences do not fit VMEM); selected
    blocks are gathered with double-buffered async DMA, the same pattern as
    JAX's paged-attention kernel. The per-row index list is DMA'd to SMEM
    first and drives the gather.
  * **exp2 streaming softmax**: logits are scaled by ``sm_scale*log2(e)``
    once in the query block, and the text amplitude bias is added directly
    to the base-2 logits of text key blocks for video query rows, matching
    the reference numerics exactly.
  * **One launch for everything**: text (condition) query rows simply carry
    a full index list, which turns the same kernel into dense flash
    attention for those rows — no separate dense path like the reference's
    ``flash_attn_func`` call for text queries.

Shapes are static per ProRes stage; ``seqlen`` and ``text_amp`` are
compile-time constants folded into each stage's specialization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.device import gather_group_pick, gather_group_width

_LOG2E = 1.4426950408889634
DEFAULT_BLOCK = 128

__all__ = ["block_sparse_attention", "block_sparse_attention_grouped", "grouped_attention_from_mask"]


def _kernel(
    q_ref,          # VMEM (1, block_m, d)
    kv_hbm,         # ANY  (bh, skv, 2*d) — K and V packed along lanes so a
                    #   block's K and V arrive in ONE 64KB DMA (half the
                    #   transfer count of separate K/V fetches)
    lists_hbm,      # ANY  (bh*nqb*row,) int32 packed [count, ids...] rows
    maxk_smem,      # SMEM (bh, 1) f32 — max key L2 norm per bh row
    o_ref,          # VMEM (1, block_m, d)
    idx_smem,       # SMEM (2*row,) int32 — double-buffered across rows
                    #   (flat: Mosaic can't sublane-slice a (2, row) SMEM)
    kv_buf,         # VMEM (4, group*block_n, 2*d) kv dtype
    list_sems,      # DMA sems (2,)
    kv_sems,        # DMA sems (4, group)
    *,
    sm_scale: float,
    text_amp: float,
    text_start_block: int,
    block_m: int,
    block_n: int,
    row_size: int,
    group: int,
    fixed_max: bool,
):
    """Grid (batch*heads, num_q_blocks). Each step processes its query
    block's selected KV in *groups* of ``group`` blocks: ``group`` DMAs are
    issued back-to-back into one contiguous VMEM buffer and consumed by a
    single (block_m, group*block_n) matmul — amortizing DMA/loop latency
    and feeding the MXU wide tiles (one-block-at-a-time was measured
    latency-bound at <10% of peak). Within-row groups rotate over three
    VMEM slots {0, 1, 3} for a 2-deep prefetch.

    The pipeline also runs *across grid rows*: during row i's compute, the
    kernel prefetches row i+1's packed index list (SMEM slot ``1 - parity``)
    and, as soon as that list lands, row i+1's group 0 into the dedicated
    VMEM slot 2. Without this, every row paid the serial latency of its
    list DMA plus its first KV DMA before any compute could start — ~1/3 of
    kernel time at production density (measured v5e)."""
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    nqb = pl.num_programs(1)
    total = pl.num_programs(0) * nqb
    d = q_ref.shape[-1]
    gn = group * block_n
    step = bh * nqb + qi
    parity = jax.lax.rem(step, 2)

    def idx_dma(row_step, slot):
        # Rows are 1024-aligned (the 1-D int32 HBM tile) for the DMA; slot 0
        # holds the count, slot 1 the valid KV length, slots 2.. block ids.
        return pltpu.make_async_copy(
            lists_hbm.at[pl.ds(row_step * row_size, row_size)],
            idx_smem.at[pl.ds(slot * row_size, row_size)],
            list_sems.at[slot])

    def blk_of(islot, j, g):
        # overhang entries re-read the first listed block; masked below
        base = islot * row_size
        n_ = idx_smem[base]
        pos = j * group + g
        return idx_smem[base + 2 + jnp.where(pos < n_, pos, 0)]

    def group_copies(islot, bh_, j, slot):
        return [
            pltpu.make_async_copy(
                kv_hbm.at[bh_, pl.ds(blk_of(islot, j, g) * block_n, block_n)],
                kv_buf.at[slot, pl.ds(g * block_n, block_n)],
                kv_sems.at[slot, g])
            for g in range(group)
        ]

    def _overhang_guard(islot, j, g, fn):
        # Skip the DMA entirely for list positions past the row's count:
        # the last group's overhang would otherwise re-fetch block 0 per
        # slot — up to (group-1)/count extra traffic (measured 6%+ of
        # gather bytes at group 16, worse for wider groups). Compute masks
        # those lanes, so the stale buffer contents are never read.
        base = islot * row_size
        n_ = idx_smem[base]

        @pl.when(j * group + g < n_)
        def _():
            fn()

    def start_group(islot, bh_, j, slot):
        for g, c in enumerate(group_copies(islot, bh_, j, slot)):
            _overhang_guard(islot, j, g, c.start)

    def wait_group(islot, bh_, j, slot):
        for g, c in enumerate(group_copies(islot, bh_, j, slot)):
            _overhang_guard(islot, j, g, c.wait)

    @pl.when(step == 0)
    def _():
        # Bootstrap: the first row fetches its own list and group 0 (into
        # the cross-row slot 2, where every row's group 0 lives). The KV
        # scratch is zeroed once: overhang-guarded slots are never DMA'd,
        # and uninitialized VMEM could hold NaN bit patterns that poison
        # the PV matmul through 0*NaN (stale data afterwards is always
        # finite real KV bytes).
        kv_buf[...] = jnp.zeros(kv_buf.shape, kv_buf.dtype)
        idx_dma(0, 0).start()
        idx_dma(0, 0).wait()
        start_group(0, bh, 0, 2)

    n = idx_smem[parity * row_size]
    seqlen = idx_smem[parity * row_size + 1]
    n_groups = (n + group - 1) // group

    # Prefetch the next row's index list while this row computes.
    @pl.when(step + 1 < total)
    def _():
        idx_dma(step + 1, 1 - parity).start()

    q_f32 = q_ref[0].astype(jnp.float32)
    q = (q_f32 * (sm_scale * _LOG2E)).astype(kv_buf.dtype)

    neg_inf = jnp.float32(-1e30)
    if fixed_max:
        # Fixed-max epilogue: softmax against a per-query-row CONSTANT
        # instead of the streaming running max. M_i is the Cauchy-Schwarz
        # upper bound on the base-2 logits (scale*log2e*||q_i||*max||k||,
        # plus the text bias when positive), shifted down 63 to center the
        # f32 exp2 window: qk - M <= 63 (no overflow, f32 caps at 2^127)
        # and the bound overestimates the true row max by at most
        # 2*scale*log2e*||q||*max||k|| (qk >= -bound), so exp2 underflow
        # to a zero row needs a ~126-logit gap — impossible for qk-normed
        # heads (gap <= ~33 at unit RMS gains). Removing the max reduction
        # + alpha rescale from every KV group measured 434 -> 377 ms/layer
        # at the HY-720p joint shape (tools/epilogue_probe.py), dev vs the
        # running-max kernel 2.4e-4 (f32/bf16 are scale-free in relative
        # precision, so acc/l loses nothing to the shift).
        qn = jnp.sqrt(jnp.sum(q_f32 * q_f32, axis=-1, keepdims=True))
        m_fix = (qn * (sm_scale * _LOG2E) * maxk_smem[bh, 0]
                 + max(text_amp, 0.0) - 63.0)            # (block_m, 1)
    m0 = jnp.full((block_m, 128), neg_inf, jnp.float32)
    l0 = jnp.zeros((block_m, 128), jnp.float32)
    acc0 = jnp.zeros((block_m, d), jnp.float32)

    # All selection masks depend only on the key column, never the query
    # row: build them as (1, gn) row vectors and let the elementwise ops
    # broadcast — materializing (block_m, gn) selects per group was ~16x
    # more VPU work.
    col = jax.lax.broadcasted_iota(jnp.int32, (1, gn), 1)
    lane = jax.lax.rem(col, block_n)

    def compute_group(j, slot, carry):
        wait_group(parity, bh, j, slot)

        kb = kv_buf[slot, :, :d]
        qk = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (block_m, group*block_n)

        # per-column block id / validity, built from the scalar block list
        blk_ids = [blk_of(parity, j, g) for g in range(group)]
        seg = col // block_n
        blk_col = jnp.zeros((1, gn), jnp.int32)
        for g in range(group):
            blk_col = jnp.where(seg == g, blk_ids[g], blk_col)
        valid = (j * group + seg) < n
        # dynamic per-sample valid length: masks both the 128-pad tail and
        # padded text tokens (reference semantics, `attention_block_triton
        # _diffres.py:327-329`, per-sample rather than sample-0-broadcast)
        valid = jnp.logical_and(valid, blk_col * block_n + lane < seqlen)
        if text_amp != 0.0:
            amp_on = jnp.logical_and(qi < text_start_block,
                                     blk_col >= text_start_block)
            qk = qk + jnp.where(amp_on, jnp.float32(text_amp), 0.0)
        qk = jnp.where(valid, qk, neg_inf)

        vb = kv_buf[slot, :, d:]
        if fixed_max:
            l_prev, acc = carry
            p = jnp.exp2(qk - m_fix)                           # (bm, gn)
            l_next = l_prev + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc + jax.lax.dot_general(
                p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return l_next, acc
        m_prev, l_prev, acc = carry
        m_cur = jnp.max(qk, axis=-1, keepdims=True)           # (bm, 1)
        m_next = jnp.maximum(m_prev, m_cur)                    # (bm, 128)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(qk - m_next[:, :1])                       # (bm, gn)
        l_next = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha[:, :1] + jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_next, l_next, acc

    # Within-row groups j >= 1 rotate over slots {0, 1, 3} (slot 2 is the
    # cross-row group-0 home), giving a 2-deep prefetch: while group j
    # computes, groups j+1 AND j+2 are in flight — one-deep left the DMA
    # engine idle at group boundaries (measured ~5% at the HY-720p shape).
    def wslot(j):
        m_ = jax.lax.rem(j - 1, 3)
        return m_ + jnp.where(m_ == 2, 1, 0)

    # Group 0 (prefetched into slot 2 by the previous row / bootstrap).
    @pl.when(n_groups > 1)
    def _():
        start_group(parity, bh, 1, wslot(1))
    carry0 = (l0, acc0) if fixed_max else (m0, l0, acc0)
    carry = compute_group(0, 2, carry0)

    @pl.when(n_groups > 2)
    def _():
        start_group(parity, bh, 2, wslot(2))

    # With our group 0 consumed and the next row's list in SMEM, issue the
    # next row's group 0 into slot 2 — it rides behind this row's remaining
    # group DMAs and is ready when the next grid step starts.
    @pl.when(step + 1 < total)
    def _():
        idx_dma(step + 1, 1 - parity).wait()
        next_bh = (step + 1) // nqb
        start_group(1 - parity, next_bh, 0, 2)

    def body(j, carry):
        @pl.when(j + 2 < n_groups)
        def _():
            start_group(parity, bh, j + 2, wslot(j + 2))

        return compute_group(j, wslot(j), carry)

    out = jax.lax.fori_loop(1, n_groups, body, carry)
    l, acc = out[-2:]
    l_safe = jnp.where(l[:, :1] == 0.0, 1.0, l[:, :1])
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "text_amp", "text_start_block",
                     "block_n", "group", "interpret", "fixed_max"))
def block_sparse_attention(
    q: jax.Array,            # [B, H, S, D], S a multiple of 128
    k: jax.Array,            # [B, H, Skv, D]
    v: jax.Array,
    block_lists: jax.Array,  # [B, H, S//bm, packed_row_size(Skv//bn)] int32
    *,
    sm_scale: float | None = None,
    text_amp: float = 0.0,
    text_start_block: int = 0,
    block_n: int = DEFAULT_BLOCK,
    group: int | None = None,
    interpret: bool | None = None,
    fixed_max: bool = True,
) -> jax.Array:
    """Block-sparse flash attention. Returns [B, H, S, D] in q.dtype.

    ``block_lists`` is the packed layout from
    ``jenga_tpu.sparse.planner.pack_block_lists``: per (batch, head,
    query-block) row, slot 0 holds the selected-block count, slot 1 the
    per-sample valid KV length (keys past it are masked — padded text
    tokens and the 128-pad tail), and slots 2.. the ascending block ids,
    padded to a 1024-aligned row.

    ``fixed_max``: softmax against the per-row Cauchy-Schwarz logit bound
    instead of a streaming running max — drops the per-group max
    reduction and alpha rescale (measured 13%% kernel time at production
    density, tools/epilogue_probe.py) at a ~2e-4 output deviation.
    ``False`` restores the classic flash-attention recurrence.
    """
    if interpret is None:
        # Mosaic only targets TPU; emulate on CPU (tests, tiny local runs).
        interpret = jax.default_backend() == "cpu"
    if group is None:
        # device-keyed default (utils/device.py, PROJECTION.md): 16 at
        # d=128 on v5e (with the 2-deep prefetch, 16/24/32 measured
        # 552/557/566 ms at the HY-720p shape), 24 projected on v5p where
        # the per-row kernel sits near the roofline ridge; scaled down for
        # fatter heads so the 4-slot packed-KV scratch stays under VMEM.
        group = gather_group_width(q.shape[-1])
    b, h, s, d = q.shape
    skv = k.shape[2]
    block_m = DEFAULT_BLOCK
    if s % block_m or skv % block_n:
        raise ValueError(f"sequence lengths must be block multiples, got "
                         f"{s=} {skv=}")
    if sm_scale is None:
        sm_scale = d ** -0.5
    if d % 128:
        # Mosaic tiles the minor dimension in 128 lanes; smaller head dims
        # (the reference Triton kernel supports {16,32,64,128},
        # `/root/reference/hyvideo/modules/attention_block_triton_diffres.py:
        # 160-196`) are zero-padded to 128. Zero q/k pad lanes leave the
        # logits unchanged; zero v pad lanes are sliced off the output.
        # sm_scale above is already fixed from the true head dim.
        d_pad = -(-d // 128) * 128 - d
        padcfg = ((0, 0), (0, 0), (0, 0), (0, d_pad))
        out = block_sparse_attention(
            jnp.pad(q, padcfg), jnp.pad(k, padcfg), jnp.pad(v, padcfg),
            block_lists, sm_scale=sm_scale, text_amp=text_amp,
            text_start_block=text_start_block,
            block_n=block_n, group=group, interpret=interpret,
            fixed_max=fixed_max)
        return out[..., :d]
    nqb = s // block_m
    row_size = block_lists.shape[-1]
    if row_size % 1024:
        raise ValueError(f"packed row size must be 1024-aligned, got {row_size}")

    bh = b * h
    qf = q.reshape(bh, s, d)
    # pack K and V along the lane dim: one DMA per selected block instead
    # of two (measured: fewer, larger transfers help the HBM-bound gather)
    kvf = jnp.concatenate([k.reshape(bh, skv, d), v.reshape(bh, skv, d)],
                          axis=-1)
    lists_flat = block_lists.reshape(bh * nqb * row_size)
    maxk = _max_key_norms(k, bh)

    kernel = functools.partial(
        _kernel,
        sm_scale=float(sm_scale), text_amp=float(text_amp),
        text_start_block=int(text_start_block),
        block_m=block_m, block_n=block_n, row_size=row_size,
        group=int(group), fixed_max=bool(fixed_max))

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        grid=(bh, nqb),
        in_specs=[
            pl.BlockSpec((1, block_m, d), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (bh, 1) whole-array
        ],
        out_specs=pl.BlockSpec((1, block_m, d), lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((2 * row_size,), jnp.int32),
            pltpu.VMEM((4, group * block_n, 2 * d), k.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((4, group)),
        ],
        # both dims "arbitrary": the cross-row prefetch pipeline (SMEM/VMEM
        # scratch carried between grid steps) requires sequential order.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kvf, lists_flat, maxk)
    return out.reshape(b, h, s, d)


def _max_key_norms(k: jax.Array, bh: int) -> jax.Array:
    """[bh, 1] f32 max key L2 norm per batch-head — the fixed-max
    epilogue's Cauchy-Schwarz bound input. One fused HBM pass over K
    (~1 ms at the 115k-token production shape, vs the ~57 ms/layer the
    bound saves in-kernel)."""
    kf = k.astype(jnp.float32)
    return jnp.sqrt(jnp.max(jnp.sum(kf * kf, axis=-1), axis=-1)) \
        .reshape(bh, 1)


# ------------------------------------------------------- shared-gather mode

def _kernel_grouped(
    q_ref,          # VMEM (1, q_rows*block_m, d)
    kv_hbm,         # ANY  (bh, skv, 2*d) packed K|V
    lists_hbm,      # ANY  (bh*ngr*2*row,) int32 grouped rows
    maxk_smem,      # SMEM (bh, 1) f32 — max key L2 norm per bh row
    o_ref,          # VMEM (1, q_rows*block_m, d)
    idx_smem,       # SMEM (2 * 2*row,) int32 — double-buffered rows
    kv_buf,         # VMEM (4, group*block_n, 2*d)
    list_sems,      # DMA sems (2,)
    kv_sems,        # DMA sems (4, group)
    *,
    sm_scale: float,
    text_amp: float,
    text_start_block: int,
    block_m: int,
    block_n: int,
    row_size: int,          # ids-half stride; full row = 2*row_size
    group: int,
    q_rows: int,
    all_member: bool,
    fixed_max: bool,
):
    """Shared-gather variant: ``q_rows`` query blocks per grid step share
    one union block list (see planner.pack_block_lists_grouped); each
    row masks non-member columns to -inf, so outputs are bit-comparable
    with the per-row kernel. DMA pipeline mirrors `_kernel` (2-deep
    within-row rotation over slots {0,1,3}, cross-step group-0 in slot
    2), with the list DMA amortized over ``q_rows`` outputs.

    ``all_member=True`` is the joint-selection fast path (planner
    ``sel_group``): every row of the group attends every listed block, so
    the list carries no membership half (plain ``pack_block_lists``
    layout, stride = row_size) and the kernel skips the per-row member
    mask entirely.

    All ``q_rows`` query blocks are processed as ONE ``(q_rows*block_m,
    group*block_n)`` matmul + masked streaming softmax — the row axis is
    vectorized, not a python loop: per-row ``(128, gn)`` matmuls ran the
    MXU at small-tile efficiency and unrolled the softmax epilogue
    ``q_rows`` times (the q_rows=8 unroll crashed Mosaic; the vectorized
    form compiles and runs it)."""
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    ngr = pl.num_programs(1)
    total = pl.num_programs(0) * ngr
    d = q_ref.shape[-1]
    gn = group * block_n
    rr = q_rows * block_m
    stride = row_size if all_member else 2 * row_size
    step = bh * ngr + qi
    parity = jax.lax.rem(step, 2)

    def idx_dma(row_step, slot):
        return pltpu.make_async_copy(
            lists_hbm.at[pl.ds(row_step * stride, stride)],
            idx_smem.at[pl.ds(slot * stride, stride)],
            list_sems.at[slot])

    def blk_of(islot, j, g):
        base = islot * stride
        n_ = idx_smem[base]
        pos = j * group + g
        return idx_smem[base + 2 + jnp.where(pos < n_, pos, 0)]

    def memb_of(islot, j, g):
        base = islot * stride
        n_ = idx_smem[base]
        pos = j * group + g
        return idx_smem[base + row_size + 2
                        + jnp.where(pos < n_, pos, 0)]

    def group_copies(islot, bh_, j, slot):
        return [
            pltpu.make_async_copy(
                kv_hbm.at[bh_, pl.ds(blk_of(islot, j, g) * block_n,
                                     block_n)],
                kv_buf.at[slot, pl.ds(g * block_n, block_n)],
                kv_sems.at[slot, g])
            for g in range(group)
        ]

    def _guard(islot, j, g, fn):
        base = islot * stride
        n_ = idx_smem[base]

        @pl.when(j * group + g < n_)
        def _():
            fn()

    def start_group(islot, bh_, j, slot):
        for g, c in enumerate(group_copies(islot, bh_, j, slot)):
            _guard(islot, j, g, c.start)

    def wait_group(islot, bh_, j, slot):
        for g, c in enumerate(group_copies(islot, bh_, j, slot)):
            _guard(islot, j, g, c.wait)

    @pl.when(step == 0)
    def _():
        kv_buf[...] = jnp.zeros(kv_buf.shape, kv_buf.dtype)
        idx_dma(0, 0).start()
        idx_dma(0, 0).wait()
        start_group(0, bh, 0, 2)

    n = idx_smem[parity * stride]
    seqlen = idx_smem[parity * stride + 1]
    n_groups = (n + group - 1) // group

    @pl.when(step + 1 < total)
    def _():
        idx_dma(step + 1, 1 - parity).start()

    q_f32 = q_ref[0].astype(jnp.float32)
    q_all = (q_f32 * (sm_scale * _LOG2E)).astype(kv_buf.dtype)

    neg_inf = jnp.float32(-1e30)
    if fixed_max:
        # Per-row Cauchy-Schwarz logit bound replacing the running max —
        # see `_kernel` for the numerics argument. Measured 434 -> 377
        # ms/layer at the HY-720p joint q4g8 shape (tools/epilogue_probe).
        qn = jnp.sqrt(jnp.sum(q_f32 * q_f32, axis=-1, keepdims=True))
        m_fix = (qn * (sm_scale * _LOG2E) * maxk_smem[bh, 0]
                 + max(text_amp, 0.0) - 63.0)               # (rr, 1)
    m0 = jnp.full((rr, 128), neg_inf, jnp.float32)
    l0 = jnp.zeros((rr, 128), jnp.float32)
    acc0 = jnp.zeros((rr, d), jnp.float32)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, gn), 1)
    lane = jax.lax.rem(col, block_n)
    # query-block row index within the group: rows r*block_m..(r+1)*block_m
    # belong to query block qi*q_rows + r
    row_of = jax.lax.broadcasted_iota(jnp.int32, (rr, 1), 0) // block_m

    def _col_bias(j):
        """(1, gn) additive column biases for a KV group: ``bias`` is
        -1e30 on invalid columns (list overhang / per-sample seqlen tail)
        and 0 elsewhere; ``camp`` is ``text_amp`` on text columns (added
        to qk only for video query rows via ``row_video``)."""
        blk_ids = [blk_of(parity, j, g) for g in range(group)]
        seg = col // block_n
        blk_col = jnp.zeros((1, gn), jnp.int32)
        for g in range(group):
            blk_col = jnp.where(seg == g, blk_ids[g], blk_col)
        in_list = (j * group + seg) < n
        in_seq = blk_col * block_n + lane < seqlen
        valid = jnp.logical_and(in_list, in_seq)       # (1, gn)
        bias = jnp.where(valid, 0.0, neg_inf)
        camp = jnp.where(blk_col >= text_start_block,
                         jnp.float32(text_amp), 0.0)
        return bias, camp, blk_col

    if text_amp != 0.0:
        # 1.0 for video query rows (text amplitude applies), 0.0 for text
        # query rows — (rr, 1), broadcasts against the (1, gn) camp column
        row_video = jnp.where(qi * q_rows + row_of < text_start_block,
                              jnp.float32(1.0), 0.0)

    def _mask_qk(qk, j):
        """Full masking path: list overhang, per-sample seqlen tail,
        (non-joint) membership, text amplitude."""
        bias, camp, blk_col = _col_bias(j)
        if not all_member:
            memb_ids = [memb_of(parity, j, g) for g in range(group)]
            seg = col // block_n
            memb_col = jnp.zeros((1, gn), jnp.int32)
            for g in range(group):
                memb_col = jnp.where(seg == g, memb_ids[g], memb_col)
            member = ((memb_col >> row_of) & 1) == 1   # (rr, gn)
            bias = jnp.where(member, bias, neg_inf)
        qk = qk + bias
        if text_amp != 0.0:
            qk = qk + row_video * camp
        return qk

    def compute_group(j, slot, carry):
        wait_group(parity, bh, j, slot)

        kb = kv_buf[slot, :, :d]
        vb = kv_buf[slot, :, d:]
        qk = jax.lax.dot_general(
            q_all, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # (rr, gn)
        if all_member:
            # Joint-selection fast path: a group needs masking only when
            # it holds the row's list overhang, crosses the per-sample
            # seqlen boundary, or (amp) contains text blocks — scalars
            # decidable from the ascending id list. For interior groups
            # (the vast majority at production density) the index/mask
            # construction is skipped. The cond carries only the (1, gn)
            # column biases (16KB), NOT the (rr, gn) logits: a qk-valued
            # cond put ~23MB of branch state on the scoped-VMEM stack and
            # failed to compile at the 115k-token production shape.
            last_id = blk_of(parity, j, group - 1)
            safe = jnp.logical_and(
                (j + 1) * group <= n,
                (last_id + 1) * block_n <= seqlen)
            if text_amp != 0.0:
                safe = jnp.logical_and(safe, last_id < text_start_block)
            zero_b = jnp.zeros((1, gn), jnp.float32)
            bias, camp = jax.lax.cond(
                safe, lambda: (zero_b, zero_b),
                lambda: _col_bias(j)[:2])
            qk = qk + bias
            if text_amp != 0.0:
                qk = qk + row_video * camp
        else:
            qk = _mask_qk(qk, j)
        if fixed_max:
            l_prev, acc = carry
            p = jnp.exp2(qk - m_fix)
            l_next = l_prev + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc + jax.lax.dot_general(
                p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return l_next, acc
        m_prev, l_prev, acc = carry
        m_cur = jnp.max(qk, axis=-1, keepdims=True)     # (rr, 1)
        m_next = jnp.maximum(m_prev, m_cur)             # (rr, 128)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(qk - m_next[:, :1])
        l_next = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha[:, :1] + jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_next, l_next, acc

    def wslot(j):
        m_ = jax.lax.rem(j - 1, 3)
        return m_ + jnp.where(m_ == 2, 1, 0)

    @pl.when(n_groups > 1)
    def _():
        start_group(parity, bh, 1, wslot(1))
    carry0 = (l0, acc0) if fixed_max else (m0, l0, acc0)
    carry = compute_group(0, 2, carry0)

    @pl.when(n_groups > 2)
    def _():
        start_group(parity, bh, 2, wslot(2))

    @pl.when(step + 1 < total)
    def _():
        idx_dma(step + 1, 1 - parity).wait()
        next_bh = (step + 1) // ngr
        start_group(1 - parity, next_bh, 0, 2)

    def pair_body(it, carry):
        # 2-group software pipeline: processing groups (j, j+1) in one
        # iteration lets Mosaic overlap group j+1's qk matmul (MXU) with
        # group j's softmax epilogue (VPU) — the sequential fori_loop
        # body serialized them. Group order (and thus the streaming
        # softmax sequence) is unchanged. When n_groups is even, the
        # final iteration's second group is a phantom (j+1 == n_groups):
        # its DMA starts/waits are already guarded by the list length and
        # every column masks to -inf via the overhang path, so it
        # contributes exactly nothing.
        j = 1 + 2 * it

        @pl.when(j + 2 < n_groups)
        def _():
            # reuses wslot(j-1): consumed by the previous iteration
            start_group(parity, bh, j + 2, wslot(j + 2))

        carry = compute_group(j, wslot(j), carry)

        @pl.when(j + 3 < n_groups)
        def _():
            # reuses wslot(j): group j was fully consumed just above
            start_group(parity, bh, j + 3, wslot(j + 3))

        return compute_group(j + 1, wslot(j + 1), carry)

    out = jax.lax.fori_loop(0, n_groups // 2, pair_body, carry)
    l, acc = out[-2:]
    l_safe = jnp.where(l[:, :1] == 0.0, 1.0, l[:, :1])
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("q_rows", "sm_scale", "text_amp", "text_start_block",
                     "block_n", "group", "interpret", "all_member",
                     "fixed_max"))
def block_sparse_attention_grouped(
    q: jax.Array,            # [B, H, S, D], S a multiple of q_rows*128
    k: jax.Array,
    v: jax.Array,
    block_lists: jax.Array,  # [B, H, S//(q_rows*128), 2*row] grouped layout
                             # (all_member=True: [B, H, ngr, row], no memb)
    *,
    q_rows: int,
    sm_scale: float | None = None,
    text_amp: float = 0.0,
    text_start_block: int = 0,
    block_n: int = DEFAULT_BLOCK,
    group: int | None = None,
    interpret: bool | None = None,
    all_member: bool = False,
    fixed_max: bool = True,
) -> jax.Array:
    """Shared-gather block-sparse attention: ``q_rows`` query blocks per
    grid step share one union block list (planner
    ``pack_block_lists_grouped``). Exact same outputs as the per-row
    kernel; the win is HBM traffic when adjacent rows' selections
    overlap (production-local attention).

    ``all_member=True``: joint-selection lists (``pack_block_lists`` of a
    group-level mask) where every row attends every listed block — the
    membership half and its per-row mask are skipped."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    # membership words hold at most 8 rows; the joint all-member path
    # carries no membership and supports wider groups (gather bytes drop
    # another 2x at q_rows=16)
    max_rows = 16 if all_member else 8
    if not 1 <= q_rows <= max_rows:
        raise ValueError(f"q_rows must be in [1, {max_rows}] for "
                         f"all_member={all_member}, got {q_rows}")
    if group is None:
        # shape- and device-keyed pick (utils/device.py gather_group_pick,
        # measured table in tools/smallshape_sweep.py): the VMEM-safety
        # scaling lives there too — the (q_rows*128, group*128) f32
        # logits + probs must fit VMEM (~16MB/core) next to the 4-slot
        # KV scratch, so the width halves past q_rows=4 (quarters past
        # 8) and again for >2-byte KV dtypes.
        group = gather_group_pick(
            q.shape[-1], q_rows, all_member,
            jnp.dtype(k.dtype).itemsize, k.shape[2] // block_n)
    b, h, s, d = q.shape
    skv = k.shape[2]
    block_m = DEFAULT_BLOCK
    if s % (block_m * q_rows) or skv % block_n:
        raise ValueError(f"seq must divide q_rows*block ({q_rows}*128), "
                         f"got {s=} {skv=}")
    if sm_scale is None:
        sm_scale = d ** -0.5
    if d % 128:
        d_pad = -(-d // 128) * 128 - d
        padcfg = ((0, 0), (0, 0), (0, 0), (0, d_pad))
        out = block_sparse_attention_grouped(
            jnp.pad(q, padcfg), jnp.pad(k, padcfg), jnp.pad(v, padcfg),
            block_lists, q_rows=q_rows, sm_scale=sm_scale,
            text_amp=text_amp, text_start_block=text_start_block,
            block_n=block_n, group=group, interpret=interpret,
            all_member=all_member, fixed_max=fixed_max)
        return out[..., :d]
    ngr = s // (block_m * q_rows)
    stride = block_lists.shape[-1]
    row_size = stride if all_member else stride // 2
    if row_size % 1024:
        raise ValueError(f"packed row half must be 1024-aligned, got "
                         f"{row_size}")

    bh = b * h
    qf = q.reshape(bh, s, d)
    kvf = jnp.concatenate([k.reshape(bh, skv, d), v.reshape(bh, skv, d)],
                          axis=-1)
    lists_flat = block_lists.reshape(bh * ngr * stride)
    maxk = _max_key_norms(k, bh)

    kernel = functools.partial(
        _kernel_grouped,
        sm_scale=float(sm_scale), text_amp=float(text_amp),
        text_start_block=int(text_start_block),
        block_m=block_m, block_n=block_n, row_size=row_size,
        group=int(group), q_rows=int(q_rows), all_member=bool(all_member),
        fixed_max=bool(fixed_max))

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        grid=(bh, ngr),
        in_specs=[
            pl.BlockSpec((1, q_rows * block_m, d),
                         lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (bh, 1) whole-array
        ],
        out_specs=pl.BlockSpec((1, q_rows * block_m, d),
                               lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((2 * stride,), jnp.int32),
            pltpu.VMEM((4, group * block_n, 2 * d), k.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((4, group)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kvf, lists_flat, maxk)
    return out.reshape(b, h, s, d)


def grouped_attention_from_mask(qt, kt, vt, mask, *, q_rows: int,
                                seqlens=None, text_start_block: int = 0,
                                text_amp: float = 0.0, joint: bool = False):
    """Model-side helper for the shared-gather mode: ceil-pad the query
    rows of ``mask``/``qt`` to a ``q_rows`` multiple (empty rows give
    zero outputs, sliced off), pack the grouped union lists, run the
    grouped kernel, and slice back to the original length. One home for
    the pad/pack/call/slice sequence so the HY and Wan callers cannot
    drift.

    ``joint=True``: the mask came from joint group selection (planner
    ``sel_group == q_rows``) — every row of a group attends the group's
    union, so the lists are packed WITHOUT membership words and the
    kernel runs its all-member fast path. Any row whose group's union
    exceeds its own mask row (a video/text boundary group, or padded
    rows) attends the union — a superset, by construction of joint
    selection only at those boundaries."""
    from ..sparse.planner import (mask_to_block_lists, pack_block_lists,
                                  pack_block_lists_grouped)

    s = qt.shape[2]
    nqb = mask.shape[2]
    nb_pad = -(-nqb // q_rows) * q_rows
    if nb_pad != nqb:
        mask = jnp.pad(mask, ((0, 0), (0, 0), (0, nb_pad - nqb), (0, 0)))
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, (nb_pad - nqb) * 128),
                          (0, 0)))
    if joint:
        b_, h_, nb_, nkb = mask.shape
        union = jnp.any(
            mask.reshape(b_, h_, nb_ // q_rows, q_rows, nkb), axis=3)
        glists = pack_block_lists(*mask_to_block_lists(union),
                                  seqlens=seqlens)
    else:
        glists = pack_block_lists_grouped(mask, q_rows, seqlens=seqlens)
    out = block_sparse_attention_grouped(
        qt, kt, vt, glists, q_rows=q_rows,
        text_start_block=text_start_block, text_amp=text_amp,
        all_member=joint)
    return out[:, :, :s]
