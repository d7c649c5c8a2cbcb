"""Ulysses sequence parallelism: all-to-all head/sequence resharding.

TPU-native counterpart of the reference's xfuser/yunchang Ulysses stack
(`/root/reference/hyvideo/modules/xdit_ring_atten.py:22-222`,
`/root/reference/wan/distributed/xdit_context_parallel.py:66-146`): instead
of NCCL ``SeqAllToAll4D`` wrappers, a ``shard_map`` island whose collectives
are XLA ``all_to_all`` over the mesh's ``sp`` axis (riding ICI on real
slices).

Layout contract: outside the island activations are token-sharded
``[B, S/sp, H, hd]``; inside, each device holds the **full sequence** for
``H/sp`` heads (the Ulysses invariant), so the carving planner and the
block-sparse kernel run unchanged per device on their local heads —
block selection is per-head, exactly like single-chip. RoPE is applied
inside the island (after the gather) with full-sequence tables, avoiding
the reference's per-rank table slicing (``pad_freqs``).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.block_sparse_attention import (block_sparse_attention,
                                          grouped_attention_from_mask)
from ..ops.flash_attention import dense_attention
from ..sparse.planner import build_block_mask, mask_to_block_lists, \
    pack_block_lists
from ..models.layers import apply_rope

__all__ = ["ulysses_self_attention"]


def ulysses_self_attention(
    q, k, v,                    # [B, S_local, H, hd] token-sharded
    rope_cos, rope_sin,         # [S_global, hd//2] full-sequence tables,
                                # or None when RoPE was already applied
                                # outside (HY applies it pre-concat)
    mesh: Mesh,
    *,
    axis: str = "sp",
    sparse: bool = True,
    block_neighbors=None,
    top_k=None,
    p_remain: float = 1.0,
    seqlen: int | None = None,
    text_start_block: int | None = None,
    text_blocks: int = 0,
    text_amp: float = 0.0,
    first_frame_blocks: int = 0,
    q_rows: int = 1,
    joint_sel: bool = False,
):
    """Sequence-parallel (carved) self-attention.

    Returns [B, S_local, H, hd] with the same token sharding as the inputs.
    Works on a 1-device mesh (collectives become no-ops), so the same code
    path serves single-chip and multi-chip.
    """
    n_sp = mesh.shape[axis]

    def inner(q, k, v, top_k_arr, seqlens):
        # [B, S/sp, H, hd] -> [B, S, H/sp, hd]: scatter heads, gather tokens
        def a2a_fwd(x):
            return jax.lax.all_to_all(x, axis, split_axis=2, concat_axis=1,
                                      tiled=True)

        def a2a_bwd(x):
            return jax.lax.all_to_all(x, axis, split_axis=1, concat_axis=2,
                                      tiled=True)

        q_, k_, v_ = a2a_fwd(q), a2a_fwd(k), a2a_fwd(v)
        if rope_cos is not None:
            q_ = apply_rope(q_, rope_cos, rope_sin)
            k_ = apply_rope(k_, rope_cos, rope_sin)

        qt = q_.transpose(0, 2, 1, 3)  # [B, H/sp, S, hd]
        kt = k_.transpose(0, 2, 1, 3)
        vt = v_.transpose(0, 2, 1, 3)

        if sparse:
            s = qt.shape[2]
            nkb = s // 128
            tsb = text_start_block if text_start_block is not None else nkb
            nqb_video = tsb
            joint = q_rows > 1 and joint_sel
            mask = build_block_mask(
                qt[:, :, :nqb_video * 128], kt,
                top_k=top_k_arr, p_remain=p_remain,
                text_start_block=tsb, text_blocks=text_blocks,
                block_neighbors=block_neighbors,
                first_frame_blocks=first_frame_blocks,
                sel_group=q_rows if joint else 1)
            if tsb < nkb:
                # text query rows attend densely: full index lists
                full = jnp.ones((*mask.shape[:2], nkb - tsb, nkb), bool)
                mask = jnp.concatenate([mask, full], axis=2)
            if q_rows > 1:
                # shared-gather mode works unchanged per device: each
                # shard holds the full sequence for its local heads
                out = grouped_attention_from_mask(
                    qt, kt, vt, mask, q_rows=q_rows, seqlens=seqlens,
                    text_start_block=tsb, text_amp=text_amp, joint=joint)
            else:
                lists = pack_block_lists(*mask_to_block_lists(mask),
                                         seqlens=seqlens)
                out = block_sparse_attention(
                    qt, kt, vt, lists,
                    text_start_block=tsb, text_amp=text_amp)
        else:
            out = dense_attention(qt, kt, vt)

        out = out.transpose(0, 2, 1, 3)  # [B, S, H/sp, hd]
        return a2a_bwd(out)

    if top_k is None:
        top_k = jnp.int32(1)
    top_k = jnp.asarray(top_k, jnp.int32)
    # per-sample valid KV lengths (padded text/tail masking); replicated
    if seqlen is None:
        seqlen = q.shape[1] * n_sp
    seqlens = jnp.broadcast_to(jnp.asarray(seqlen, jnp.int32),
                               (q.shape[0],))

    fn = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(P(None, axis, None, None), P(None, axis, None, None),
                  P(None, axis, None, None), P(), P()),
        out_specs=P(None, axis, None, None),
        check_vma=False,
    )
    return fn(q, k, v, top_k, seqlens)
