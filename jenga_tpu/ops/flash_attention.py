"""Dense attention dispatch: Pallas flash attention with jnp fallbacks.

Counterpart of the reference's dense-attention layer
(`/root/reference/hyvideo/modules/attenion.py:34-157`,
`/root/reference/wan/modules/attention.py:24-131`), which dispatches between
flash-attn v2/v3, torch SDPA and a vanilla path. Here the fast path is the
stock JAX Pallas TPU flash-attention kernel (already MXU-tuned; no reason to
hand-roll a dense kernel when the carving kernel is the novel one), and the
fallback is chunked jnp attention that works on any backend (CPU tests) and
for short sequences where kernel launch overhead dominates.

Uses:
  * dense DiT baselines (the "speed-of-light we must beat" bench arm),
  * the Wan dense-attention fallback when ``sa_drop_rate <= 0.25``
    (`/root/reference/wan/modules/model_mul.py:153-159`),
  * Wan cross-attention over short text sequences,
  * dense paths of the Ulysses wrapper.

``kv_len`` gives per-sample valid key counts — the reference's cu_seqlens
semantics (`/root/reference/hyvideo/modules/attenion.py:34-57`): keys at
positions >= kv_len[b] (padded text tokens) are masked out of the softmax.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["dense_attention", "attention_bshd"]

_FLASH_MIN_SEQ = 1024  # below this, XLA-fused jnp attention wins


def _masked_softmax(logits):
    """Softmax that returns all-zero weights (not NaN) for rows whose every
    logit is masked to -inf — a sample with ``kv_len == 0`` would otherwise
    poison the output (same guard as ``ring._partial_attn``)."""
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - jnp.where(jnp.isfinite(m), m, 0.0))
    return p / jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)


def _jnp_attention(q, k, v, sm_scale, kv_len=None, q_chunk=4096):
    """Chunked dense attention in plain jnp (any backend, any seq length)."""
    b, h, sq, d = q.shape
    skv = k.shape[2]
    kmask = None
    if kv_len is not None:
        kmask = (jnp.arange(skv)[None] < kv_len[:, None])[:, None, None]

    def chunk(qc):
        logits = jnp.einsum("bhqd,bhkd->bhqk", qc.astype(jnp.float32),
                            k.astype(jnp.float32)) * sm_scale
        if kmask is not None:
            logits = jnp.where(kmask, logits, -jnp.inf)
        p = _masked_softmax(logits)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))

    if sq <= q_chunk:
        return chunk(q).astype(q.dtype)
    n = -(-sq // q_chunk)
    pad = n * q_chunk - sq
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    qs = qp.reshape(b, h, n, q_chunk, d).transpose(2, 0, 1, 3, 4)
    out = jax.lax.map(chunk, qs)  # sequential over chunks: bounded memory
    out = out.transpose(1, 2, 0, 3, 4).reshape(b, h, n * q_chunk, d)
    return out[:, :, :sq].astype(q.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "causal"))
def dense_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    *, sm_scale: float | None = None,
                    causal: bool = False,
                    kv_len: jax.Array | None = None) -> jax.Array:
    """Dense multi-head attention over [B, H, S, D] tensors.

    Dispatches to the Pallas TPU flash-attention kernel when running on TPU
    with long-enough sequences, else to chunked jnp (which XLA fuses well on
    every backend). ``kv_len``: optional [B] int array of valid key counts;
    keys past it are excluded from the softmax.
    """
    b, h, sq, d = q.shape
    if sm_scale is None:
        sm_scale = d ** -0.5
    if kv_len is not None:
        kv_len = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (b,))

    on_tpu = jax.default_backend() in ("tpu", "axon")
    if on_tpu and sq >= _FLASH_MIN_SEQ and d % 128 == 0 and not causal:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, SegmentIds, flash_attention as pl_flash)
        skv = k.shape[2]
        sq_p = -(-sq // 128) * 128
        skv_p = -(-skv // 128) * 128
        # The stock kernel's default tile sizes are badly off for DiT
        # shapes (measured v5e, 32k tokens: dense self-attention 800ms ->
        # 126ms with 1024-tiles, 16.5 -> 105 TFLOP/s; cross-attention over
        # 512 text keys 13.8ms -> 3.9ms with bq=2048, bk=skv).
        def pick_tile(size_p, want):
            # tiles must divide the padded length: pad up to the tile grid
            # (masked via SegmentIds) when the waste is <1/16 — e.g. HY-720p
            # kv 115456 -> 115712 for the 1024 tile — else shrink to the
            # largest 128-multiple divisor.
            t = min(want, size_p)
            padded = -(-size_p // t) * t
            if padded - size_p <= size_p // 16:
                return t, padded
            while size_p % t:
                t -= 128
            return t, size_p

        if skv_p <= 2048:
            bq, sq_p = pick_tile(sq_p, 2048)
            bk = skv_p
        else:
            bq, sq_p = pick_tile(sq_p, 1024)
            bk, skv_p = pick_tile(skv_p, 1024)
        flash_kw = {"block_sizes": BlockSizes(
            block_q=bq, block_k_major=bk, block_k=bk, block_b=1)}
        if sq_p != sq or skv_p != skv or kv_len is not None:
            qp = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
            kp = jnp.pad(k, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
            vp = jnp.pad(v, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
            # segment 0 = valid, 1 = padded; valid q rows then never attend
            # padded/invalid keys, and (all-padded-key) q pad rows are
            # sliced off below.
            seg_q = jnp.broadcast_to(
                (jnp.arange(sq_p) >= sq).astype(jnp.int32)[None], (b, sq_p))
            kvalid = jnp.full((b,), skv, jnp.int32)
            if kv_len is not None:
                kvalid = jnp.minimum(kvalid, kv_len)
            seg_kv = (jnp.arange(skv_p)[None]
                      >= kvalid[:, None]).astype(jnp.int32)
            seg = SegmentIds(q=seg_q, kv=seg_kv)
            out = pl_flash(qp, kp, vp, segment_ids=seg, causal=False,
                           sm_scale=sm_scale, **flash_kw)
            return out[:, :, :sq]
        return pl_flash(q, k, v, causal=False, sm_scale=sm_scale,
                        **flash_kw)
    if causal:
        logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * sm_scale
        mask = jnp.tril(jnp.ones((sq, k.shape[2]), bool))[None, None]
        if kv_len is not None:
            mask = mask & (jnp.arange(k.shape[2])[None]
                           < kv_len[:, None])[:, None, None]
        logits = jnp.where(mask, logits, -jnp.inf)
        p = _masked_softmax(logits)
        return jnp.einsum("bhqk,bhkd->bhqd", p,
                          v.astype(jnp.float32)).astype(q.dtype)
    return _jnp_attention(q, k, v, sm_scale, kv_len=kv_len)


def attention_bshd(q, k, v, **kwargs):
    """Dense attention over [B, S, H, D] layout (the model-side layout)."""
    out = dense_attention(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                          v.transpose(0, 2, 1, 3), **kwargs)
    return out.transpose(0, 2, 1, 3)
