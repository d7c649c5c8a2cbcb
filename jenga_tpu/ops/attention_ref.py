"""Dense jnp reference for block-sparse attention (tests + tiny CPU runs).

Materializes the full logits matrix, so only usable at test scales; the
Pallas kernel in ``block_sparse_attention.py`` is the production path. The
math mirrors the reference Triton kernel
(`/root/reference/hyvideo/modules/attention_block_triton_diffres.py:38-136`):
logits are computed in exp2 space (``qk * sm_scale * log2(e)``), the text
amplitude bias is added to those base-2 logits of text key blocks for video
query rows, and keys past ``seqlen`` are masked to -inf.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LOG2E = 1.4426950408889634

__all__ = ["block_sparse_attention_reference"]


def block_sparse_attention_reference(
    q: jax.Array,           # [B, H, S, D] (S padded to a block multiple)
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,        # [B, H, S//bm, S//bn] bool one-hot selection
    *,
    sm_scale: float | None = None,
    text_amp: float = 0.0,
    text_start_block: int | None = None,
    seqlen=None,
    block_m: int = 128,
    block_n: int = 128,
) -> jax.Array:
    b, h, s, d = q.shape
    skv = k.shape[2]
    if sm_scale is None:
        sm_scale = d ** -0.5
    if seqlen is None:
        seqlen = skv
    # scalar or per-sample [B] valid KV lengths
    seqlen = jnp.broadcast_to(jnp.asarray(seqlen, jnp.int32), (b,))
    nqb, nkb = s // block_m, skv // block_n

    # Base-2 logits, matching the kernel's exp2 streaming-softmax trick.
    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * (sm_scale * _LOG2E)

    if text_amp != 0.0 and text_start_block is not None:
        qblk = jnp.arange(s) // block_m
        kblk = jnp.arange(skv) // block_n
        amp = ((qblk[:, None] < text_start_block)
               & (kblk[None, :] >= text_start_block))
        logits = logits + jnp.where(amp, text_amp, 0.0)

    token_mask = jnp.repeat(jnp.repeat(mask, block_m, axis=2), block_n, axis=3)
    token_mask = token_mask & (jnp.arange(skv)[None, None, None, :]
                               < seqlen[:, None, None, None])
    logits = jnp.where(token_mask, logits, -jnp.inf)

    # softmax base 2 == softmax of (logits * ln 2)
    p = jax.nn.softmax(logits * 0.6931471805599453, axis=-1)
    p = jnp.where(jnp.isnan(p), 0.0, p)  # rows with no selected block
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)
