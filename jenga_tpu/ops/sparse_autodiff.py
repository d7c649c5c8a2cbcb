"""Differentiable dispatch for the block-sparse attention kernels.

The Pallas kernels (``block_sparse_attention.py``) are forward-only —
Mosaic defines no VJP — so a ``carve``-bearing forward under ``jax.grad``
(LoRA fine-tuning on a carved trajectory) used to die with an opaque
Mosaic/AD error. This wrapper keeps the kernels on the forward pass and
implements the backward by *recomputation* through the dense jnp oracle
masked by the same selection (``ops/attention_ref.py``), the standard
recompute-style flash-attention backward:

- gradients are exact for the masked-softmax attention the kernels
  compute (the fixed-max epilogue's ~2e-4 forward deviation is treated
  as noise, exactly like any recompute-based FA backward that re-derives
  the softmax statistics);
- the oracle materializes one head's logits at a time (``lax.map`` over
  batch x head slices), bounding backward memory to O(S * Skv) per head
  rather than per batch — combine with ``jax.checkpoint`` on the block
  (``wan_trunk(remat=True)``) for video-length sequences;
- selection is piecewise-constant in (q, k): no gradient flows through
  the planner's mask, matching the reference, where the topk/scatter
  mask build has no useful gradient path either
  (`/root/reference/hyvideo/modules/attention_block_triton_diffres.py:
  198-295` — comparisons and scatters of detached scores).

Joint group selection (``joint=True``, planner ``sel_group == q_rows``)
runs every row of a group against the group's union list; the backward
differentiates against that same union-expanded mask, so forward and
backward see identical attention patterns.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from .attention_ref import block_sparse_attention_reference
from .block_sparse_attention import (block_sparse_attention,
                                     grouped_attention_from_mask)

__all__ = ["sparse_attention_from_mask"]


def sparse_attention_from_mask(qt, kt, vt, mask, *, seqlens=None,
                               text_start_block: int = 0,
                               text_amp: float = 0.0,
                               q_rows: int = 1, joint: bool = False):
    """Block-sparse attention from a one-hot block mask, differentiable
    wrt q/k/v. ``[B, H, S, D]`` operands, ``[B, H, S//128, Skv//128]``
    bool mask; dispatches to the per-row kernel (``q_rows == 1``) or the
    shared-gather/joint grouped kernel, exactly like the model call
    sites it replaces (models/wan.py, models/hyvideo.py)."""
    b = qt.shape[0]
    skv = kt.shape[2]
    if seqlens is None:
        sl = jnp.full((b,), skv, jnp.int32)
    else:
        sl = jnp.broadcast_to(jnp.asarray(seqlens, jnp.int32).reshape(-1),
                              (b,))
    static = (int(text_start_block), float(text_amp), int(q_rows),
              bool(joint))
    return _sparse_attn(static, qt, kt, vt, mask, sl)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _sparse_attn(static, q, k, v, mask, seqlens):
    tsb, amp, q_rows, joint = static
    if q_rows > 1:
        return grouped_attention_from_mask(
            q, k, v, mask, q_rows=q_rows, seqlens=seqlens,
            text_start_block=tsb, text_amp=amp, joint=joint)
    from ..sparse.planner import mask_to_block_lists, pack_block_lists
    lists = pack_block_lists(*mask_to_block_lists(mask), seqlens=seqlens)
    return block_sparse_attention(q, k, v, lists, text_start_block=tsb,
                                  text_amp=amp)


def _effective_mask(mask, q_rows: int, joint: bool):
    """The attention pattern the kernel actually realizes: joint mode
    expands each group's union back over its member rows (incl. the
    video/text boundary-group superset documented in
    ``grouped_attention_from_mask``); every other mode is exact."""
    if not (joint and q_rows > 1):
        return mask
    b, h, nqb, nkb = mask.shape
    nb_pad = -(-nqb // q_rows) * q_rows
    m = mask
    if nb_pad != nqb:
        m = jnp.pad(mask, ((0, 0), (0, 0), (0, nb_pad - nqb), (0, 0)))
    union = jnp.any(m.reshape(b, h, nb_pad // q_rows, q_rows, nkb), axis=3)
    eff = jnp.broadcast_to(
        union[:, :, :, None, :],
        (b, h, nb_pad // q_rows, q_rows, nkb)).reshape(b, h, nb_pad, nkb)
    return eff[:, :, :nqb]


def _sparse_attn_fwd(static, q, k, v, mask, seqlens):
    return _sparse_attn(static, q, k, v, mask, seqlens), \
        (q, k, v, mask, seqlens)


def _sparse_attn_bwd(static, res, g):
    tsb, amp, q_rows, joint = static
    q, k, v, mask, seqlens = res
    b, h, s, d = q.shape
    skv = k.shape[2]
    eff = _effective_mask(mask, q_rows, joint)
    nqb, nkb = eff.shape[2], eff.shape[3]

    qf = q.reshape(b * h, s, d)
    kf = k.reshape(b * h, skv, d)
    vf = v.reshape(b * h, skv, d)
    mf = eff.reshape(b * h, nqb, nkb)
    gf = g.reshape(b * h, s, d)
    slf = jnp.repeat(seqlens, h)

    def per_bh(args):
        q1, k1, v1, m1, g1, sl1 = args

        def f(q2, k2, v2):
            return block_sparse_attention_reference(
                q2[None, None], k2[None, None], v2[None, None],
                m1[None, None], text_amp=amp, text_start_block=tsb,
                seqlen=sl1[None])[0, 0]

        _, vjp = jax.vjp(f, q1, k1, v1)
        return vjp(g1.astype(q1.dtype))

    dq, dk, dv = jax.lax.map(per_bh, (qf, kf, vf, mf, gf, slf))
    return (dq.reshape(q.shape).astype(q.dtype),
            dk.reshape(k.shape).astype(k.dtype),
            dv.reshape(v.shape).astype(v.dtype),
            np.zeros(mask.shape, dtype=jax.dtypes.float0),
            np.zeros(seqlens.shape, dtype=jax.dtypes.float0))


_sparse_attn.defvjp(_sparse_attn_fwd, _sparse_attn_bwd)
