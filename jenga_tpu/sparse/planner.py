"""Attention carving planner: data-dependent block selection, fully in jnp.

Per attention layer and denoise step, this module estimates which 128-token
key blocks each 128-token query block should attend to:

  1. mean-pool Q and K per block,
  2. pooled-QK block-score matrix (one batched matmul on the MXU),
  3. softmax over *video* key blocks, sort descending, cumulative-probability
     top-p with a top-k floor,
  4. OR in the precomputed 26-neighborhood block adjacency,
  5. force text (condition) blocks always-on, and optionally make the
     first-frame blocks mutually visible (Wan),
  6. emit both the one-hot mask and a TPU-friendly padded index-list
     encoding (selected block ids first, ascending) that the Pallas
     block-sparse kernel consumes via scalar DMA.

Semantics mirror the reference mask builder
(`/root/reference/hyvideo/modules/attention_block_triton_diffres.py:198-295`
and the Wan first-frame variant
`/root/reference/wan/modules/attention_block_triton_diffres.py:306-412`) but
are expressed as pure shape-static jnp so the whole planner fuses into the
surrounding jit program — the selection is data-dependent in *values* only,
never in shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["build_block_mask", "mask_to_block_lists", "pack_block_lists",
           "packed_row_size", "plan_block_sparsity"]


def build_block_mask(
    q: jax.Array,               # [B, H, Sq, D] video queries (Sq = nqb*block)
    k: jax.Array,               # [B, H, Skv, D] full padded keys
    *,
    top_k: int,
    p_remain: float,
    text_start_block: int,
    text_blocks: int,
    block_neighbors: jax.Array | None,  # [nb, nb] bool (video blocks)
    block_size: int = 128,
    first_frame_blocks: int = 0,
    sel_group: int = 1,
) -> jax.Array:
    """One-hot selection mask ``[B, H, num_q_blocks, num_kv_blocks]`` (bool).

    ``top_k`` is the selection floor (the reference's ``select_block_num``,
    derived from the drop rate); ``p_remain`` the cumulative-probability
    threshold. Key blocks beyond ``text_start_block`` are condition/text
    blocks: excluded from the probability competition and forced on at the
    end.

    ``sel_group > 1`` enables **joint group selection**, the TPU-tuned
    carving granularity: queries are pooled over ``sel_group`` consecutive
    128-token blocks and one selection is made per group, so every row in a
    group shares an identical block set. This makes the shared-gather
    kernel's union equal the per-row density — gather bytes drop by
    ``sel_group``x at unchanged attention FLOPs. The reference always
    selects per 128-token row (`attention_block_triton_diffres.py:198-295`);
    group selection is a coarser-granularity variant of the same pooled-QK
    estimator (adjacency and first-frame forcing become group-level unions,
    i.e. supersets of the per-row guarantees). Fidelity vs per-row
    selection is measured in tools/fidelity_run.py.
    """
    b, h, sq, d = q.shape
    nqb = sq // block_size
    nkb = k.shape[2] // block_size

    # Pooling: for bf16 inputs, mean-as-matmul (ones/block vector on the
    # MXU, f32 accumulation). A ``lax.reduce_window`` f32 pool wins the
    # isolated microbench at the Wan 32k shape (tools/pool_probe.py:
    # +0.32 ms over the q/k read floor vs +1.20 ms for this matmul) but
    # LOSES in the compiled model at the HY 115k/24-head shape — bench.py
    # A/B with identical dense arms (4.04 s both): carved75 1.66 s vs
    # 1.57 s, carved85 1.34 s vs 1.29 s, i.e. a ~6% step regression
    # (the f32 cast of q/k materializes ahead of the window reduction;
    # the matmul form reads bf16 and keeps the transpose/pool inside one
    # fusion). In-model Wan cost of this choice is bounded by the whole
    # planner term measured in tools/wan_trunk_ablate.py (carved vs
    # fixed-lists). f32 inputs keep the exact elementwise mean so the
    # selection stays bit-identical to the reference builder (torch
    # ``.mean``) in the parity tests.
    if q.dtype == jnp.bfloat16:
        ones_b = jnp.full((block_size,), 1.0 / block_size, jnp.bfloat16)
        pool = lambda x, nb_: jax.lax.dot_general(
            x.reshape(b, h, nb_, block_size, d), ones_b,
            (((3,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        q_pool = pool(q, nqb)
        k_pool = pool(k.astype(jnp.bfloat16), nkb)
    else:
        q_pool = q.reshape(b, h, nqb, block_size, d).astype(jnp.float32) \
            .mean(axis=3)
        k_pool = k.reshape(b, h, nkb, block_size, d).astype(jnp.float32) \
            .mean(axis=3)

    g = max(1, int(sel_group))
    ngq = -(-nqb // g)
    if g > 1:
        # group-pool the per-row pooled queries; a ragged tail group
        # averages only its real rows.
        pad = ngq * g - nqb
        qp = jnp.pad(q_pool, ((0, 0), (0, 0), (0, pad), (0, 0)))
        cnt = jnp.clip(nqb - jnp.arange(ngq) * g, 1, g).astype(jnp.float32)
        q_pool = qp.reshape(b, h, ngq, g, d).sum(axis=3) / cnt[:, None]

    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q_pool, k_pool,
        preferred_element_type=jnp.float32) * (d ** -0.5)

    # Top-p over video key blocks only. One value-sort per row; membership
    # is then a threshold compare against the needed-th largest prob (the
    # reference double-argsorts to ranks; exact f32 prob ties — vanishingly
    # rare — may select a block more here, never fewer).
    video_scores = scores[..., :text_start_block]
    probs = jax.nn.softmax(video_scores, axis=-1)
    sorted_probs = jnp.sort(probs, axis=-1, descending=True)
    cumsum = jnp.cumsum(sorted_probs, axis=-1)
    needed = jnp.sum(cumsum <= p_remain, axis=-1) + 1
    needed = jnp.maximum(needed, top_k)
    needed = jnp.minimum(needed, text_start_block)
    kth = jnp.take_along_axis(sorted_probs, needed[..., None] - 1, axis=-1)
    video_mask = probs >= kth

    if block_neighbors is not None:
        neighbor = jnp.asarray(
            block_neighbors)[:nqb, :text_start_block].astype(bool)
        if g > 1:
            # group-level adjacency: the union of the member rows' 26-
            # neighborhoods (a superset of each row's own guarantee), so
            # rows within a group stay identical.
            neighbor = jnp.pad(neighbor, ((0, ngq * g - nqb), (0, 0)))
            neighbor = jnp.any(neighbor.reshape(ngq, g, -1), axis=1)
        video_mask = video_mask | neighbor[None, None]

    if first_frame_blocks > 0 and g > 1:
        # First-frame forcing at group granularity: every group that
        # contains a first-frame query row sees all first-frame blocks
        # (superset of reference J17; keeps group rows identical).
        ff_rows = -(-first_frame_blocks // g)
        video_mask = video_mask.at[
            :, :, :ff_rows, :first_frame_blocks].set(True)

    if g > 1:
        video_mask = jnp.repeat(video_mask, g, axis=2)[:, :, :nqb]

    mask = jnp.zeros((b, h, nqb, nkb), dtype=bool)
    mask = mask.at[..., :text_start_block].set(video_mask)

    if first_frame_blocks > 0 and g == 1:
        # First-frame query blocks always see every first-frame key block
        # (fixes the Wan first-frame artifact, reference J17).
        mask = mask.at[:, :, :first_frame_blocks, :first_frame_blocks].set(True)

    if text_blocks > 0:
        hi = min(text_start_block + text_blocks, nkb)
        mask = mask.at[..., text_start_block:hi].set(True)

    return mask


def mask_to_block_lists(mask: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Convert a one-hot mask to (indices, counts) padded index lists.

    ``indices[b, h, q, :counts[b, h, q]]`` are the selected key-block ids in
    ascending order; the tail is padded with arbitrary valid ids (never read
    by the kernel). Index lists are the TPU-friendly encoding: the kernel
    runs a dynamic-length DMA loop over exactly ``counts`` blocks instead of
    branching over every block like the reference one-hot Triton kernel.
    """
    # One int sort instead of a scatter: selected columns keep their id,
    # unselected ones are offset by nkb so an ascending sort compacts the
    # selected ids to the front (TPU scatters serialize; a 256-wide bitonic
    # sort is fully vectorized and ~6x faster here, measured on v5e).
    nkb = mask.shape[-1]
    cols = jnp.arange(nkb, dtype=jnp.int32)
    keys = jnp.where(mask, cols, cols + nkb)
    order = jnp.sort(keys, axis=-1)
    # pad tail entries (>= nkb) map back to their own column id — valid
    # block ids the kernel never reads past ``counts``.
    indices = jnp.where(order < nkb, order, order - nkb)
    counts = jnp.sum(mask, axis=-1, dtype=jnp.int32)
    return indices, counts


def packed_row_size(num_kv_blocks: int) -> int:
    """Row stride of the packed list layout: count + seqlen slots + ids,
    tile-aligned.

    The kernel DMAs rows out of a flattened 1-D int32 array; Mosaic tiles
    1-D int32 HBM buffers in 1024-element tiles (8 sublanes x 128 lanes),
    so both the row stride and every row offset must be 1024-aligned.
    """
    return -(-(num_kv_blocks + 2) // 1024) * 1024


def pack_block_lists(indices: jax.Array, counts: jax.Array,
                     seqlens=None, block_size: int = 128) -> jax.Array:
    """Pack (indices, counts) into the kernel's DMA-aligned row layout.

    Returns int32 ``[B, H, Qb, packed_row_size(nkb)]`` where slot 0 holds
    the count, slot 1 the per-sample valid KV length (keys at positions
    >= seqlen are masked — how the reference masks padded text tokens,
    `/root/reference/hyvideo/modules/attention_block_triton_diffres.py:
    327-329`; the reference broadcasts sample 0's length, here each
    sample gets its own), and slots 2.. the selected block ids. The
    kernel DMAs one flattened row per query block straight into SMEM.

    ``seqlens``: scalar or [B] array of real token counts; None = all
    ``nkb * block_size`` keys valid.
    """
    *lead, nkb = indices.shape
    row = packed_row_size(nkb)
    if seqlens is None:
        sl = jnp.full(tuple(lead), nkb * block_size, jnp.int32)
    else:
        sl = jnp.asarray(seqlens, jnp.int32)
        if sl.ndim == 0:
            sl = jnp.broadcast_to(sl, tuple(lead))
        else:   # [B] -> broadcast over heads / query blocks
            sl = jnp.broadcast_to(sl.reshape(-1, *([1] * (len(lead) - 1))),
                                  tuple(lead))
    # concatenation, not .at[].set scatters — keeps the whole pack as cheap
    # pad/concat ops in XLA.
    return jnp.concatenate(
        [counts[..., None].astype(jnp.int32), sl[..., None], indices,
         jnp.zeros((*lead, row - 2 - nkb), jnp.int32)], axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("top_k", "p_remain", "text_start_block", "text_blocks",
                     "block_size", "first_frame_blocks"))
def plan_block_sparsity(
    q: jax.Array,
    k: jax.Array,
    block_neighbors: jax.Array | None,
    *,
    top_k: int,
    p_remain: float,
    text_start_block: int,
    text_blocks: int,
    block_size: int = 128,
    first_frame_blocks: int = 0,
    seqlens=None,
):
    """Fused mask build + packed-list conversion. Returns (mask, packed)."""
    mask = build_block_mask(
        q, k,
        top_k=top_k, p_remain=p_remain,
        text_start_block=text_start_block, text_blocks=text_blocks,
        block_neighbors=block_neighbors, block_size=block_size,
        first_frame_blocks=first_frame_blocks)
    indices, counts = mask_to_block_lists(mask)
    return mask, pack_block_lists(indices, counts, seqlens=seqlens,
                                  block_size=block_size)


def pack_block_lists_grouped(mask: jax.Array, group_q: int,
                             seqlens=None, block_size: int = 128):
    """Shared-gather encoding: one block list per GROUP of ``group_q``
    query rows, plus per-block membership bitmasks.

    Production checkpoints have spatio-temporally local attention, so
    adjacent hilbert-ordered query rows select heavily overlapping block
    sets; gathering the UNION once per group cuts the kernel's HBM
    traffic by up to ``group_q``x (the uniform-random regime of the
    synthetic benches shows little overlap and does not reward this —
    see tools/grouped_kernel_bench.py for the local-selection numbers).

    Returns int32 ``[B, H, Qb/group_q, 2*packed_row_size(nkb)]``: the
    first half is the standard row layout (count, seqlen, ascending
    union block ids); the second half carries, at the same offsets as
    the ids, a ``group_q``-bit membership word per id (bit g set = query
    row g of the group selected that block). Exact semantics are
    preserved: the kernel masks non-member columns per row to -inf.
    """
    b, h, nqb, nkb = mask.shape
    if nqb % group_q:
        raise ValueError(f"query blocks ({nqb}) must divide into groups "
                         f"of {group_q}")
    if group_q > 8:
        raise ValueError("membership words hold at most 8 rows per group")
    g = mask.reshape(b, h, nqb // group_q, group_q, nkb)
    union = jnp.any(g, axis=3)
    weights = (1 << jnp.arange(group_q, dtype=jnp.int32))[None, None, None,
                                                          :, None]
    memb = jnp.sum(g.astype(jnp.int32) * weights, axis=3)   # [..., nkb]

    # One composite-key sort instead of argsort + two gathers: the sort
    # key (column id, offset by nkb when unselected so selected ids
    # compact to the front) rides in the high bits, the <=8-bit
    # membership word in the low bits (ids are unique, so membership
    # never affects the order). TPU gathers serialize; bit ops are free.
    cols = jnp.arange(nkb, dtype=jnp.int32)
    keys = jnp.where(union, cols, cols + nkb)
    packed = jnp.sort((keys << 8) | memb, axis=-1)
    sorted_keys = packed >> 8
    membs = packed & 0xFF
    ids = jnp.where(sorted_keys < nkb, sorted_keys, sorted_keys - nkb)
    counts = jnp.sum(union, axis=-1, dtype=jnp.int32)

    ids_packed = pack_block_lists(ids, counts, seqlens=seqlens,
                                  block_size=block_size)
    row = ids_packed.shape[-1]
    memb_packed = jnp.concatenate(
        [jnp.zeros((*membs.shape[:-1], 2), jnp.int32), membs,
         jnp.zeros((*membs.shape[:-1], row - 2 - nkb), jnp.int32)],
        axis=-1)
    return jnp.concatenate([ids_packed, memb_packed], axis=-1)
