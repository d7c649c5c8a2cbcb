"""Ring attention over the sequence-parallel mesh axis.

Counterpart of the reference's ring path
(`/root/reference/hyvideo/modules/xdit_ring_atten.py:226-429`:
``RingComm.send_recv`` KV rotation + ``update_out_and_lse`` merges). The
TPU-native formulation: a ``shard_map`` island where each device holds its
Q/K/V sequence shard, KV shards rotate around the ring with
``lax.ppermute`` (riding ICI neighbor links), and partial attention
results merge with streaming log-sum-exp — expressed as a ``lax.scan`` so
XLA can overlap the permute with compute. Joint (text) KV, replicated on
every device, is folded in as a final local chunk, mirroring the
reference's last-step joint handling (`xdit_ring_atten.py:333-360`).

The reference ships ring mainly as plumbing ("we only require a multi-gpu
attention", `xdit_ring_atten.py:56`); Ulysses is the first-choice SP mode
here too, but ring is the right tool when heads < devices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["ring_attention", "ring_ulysses_attention"]


def _partial_attn(q, k, v, scale, kv_len=None):
    """Returns (out_unnormalized, lse) for one KV chunk.

    q [B,H,Sq,D], k/v [B,H,Sk,D] -> out [B,H,Sq,D] (sum of exp-weighted v,
    normalized by exp(lse)), lse [B,H,Sq]. ``kv_len``: optional [B] valid
    key counts; keys past it are masked (padded text tokens)."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    if kv_len is not None:
        kmask = (jnp.arange(k.shape[2])[None] < kv_len[:, None])
        logits = jnp.where(kmask[:, None, None], logits, -jnp.inf)
    m = jnp.max(logits, axis=-1)
    # a fully-masked chunk (kv_len == 0: e.g. an all-padding text mask)
    # must contribute zero weight, not NaN: exp(-inf - -inf) would be NaN,
    # so shift by a finite max and emit lse = -inf for the merge.
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.exp(logits - m_safe[..., None])
    l = jnp.sum(p, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    l_safe = jnp.where(l == 0.0, 1.0, l)
    lse = jnp.where(l == 0.0, -jnp.inf, m_safe + jnp.log(l_safe))
    return out / l_safe[..., None], lse


def _merge(o1, lse1, o2, lse2):
    """Merge two normalized partials via their log-sum-exps."""
    m = jnp.maximum(lse1, lse2)
    w1 = jnp.exp(lse1 - m)
    w2 = jnp.exp(lse2 - m)
    denom = w1 + w2
    out = (o1 * (w1 / denom)[..., None] + o2 * (w2 / denom)[..., None])
    return out, m + jnp.log(denom)


def ring_attention(q, k, v, mesh: Mesh, *, axis: str = "sp",
                   joint_k=None, joint_v=None, sm_scale=None,
                   joint_kv_len=None):
    """Sequence-sharded dense attention via KV ring rotation.

    q/k/v: [B, S_local, H, D] token-sharded over ``axis``;
    joint_k/joint_v: optional replicated [B, S_txt, H, D] text KV appended
    for every query; joint_kv_len: optional [B] valid joint-key counts
    (padded text tokens masked, the reference's cu_seqlens semantics).
    Returns [B, S_local, H, D] with input sharding.
    """
    n = mesh.shape[axis]
    d = q.shape[-1]
    scale = sm_scale if sm_scale is not None else d ** -0.5

    def inner(q, k, v, jk, jv, jlen):
        qt = q.transpose(0, 2, 1, 3)
        kt = k.transpose(0, 2, 1, 3)
        vt = v.transpose(0, 2, 1, 3)

        out0, lse0 = _partial_attn(qt, kt, vt, scale)

        def step(carry, _):
            out, lse, kc, vc = carry
            perm = [(i, (i + 1) % n) for i in range(n)]
            kc = jax.lax.ppermute(kc, axis, perm)
            vc = jax.lax.ppermute(vc, axis, perm)
            o2, l2 = _partial_attn(qt, kc, vc, scale)
            out, lse = _merge(out, lse, o2, l2)
            return (out, lse, kc, vc), None

        (out, lse, _, _), _ = jax.lax.scan(
            step, (out0, lse0, kt, vt), None, length=n - 1)

        if jk is not None:
            o2, l2 = _partial_attn(qt, jk.transpose(0, 2, 1, 3),
                                   jv.transpose(0, 2, 1, 3), scale,
                                   kv_len=jlen)
            out, lse = _merge(out, lse, o2, l2)
        return out.transpose(0, 2, 1, 3).astype(q.dtype)

    has_joint = joint_k is not None
    if joint_kv_len is not None:
        joint_kv_len = jnp.broadcast_to(
            jnp.asarray(joint_kv_len, jnp.int32).reshape(-1), (q.shape[0],))
    has_jlen = joint_kv_len is not None
    specs = [P(None, axis, None, None)] * 3 + [P(), P(), P()]
    if not has_joint:
        joint_k = joint_v = jnp.zeros((0,), q.dtype)
    if not has_jlen:
        joint_kv_len = jnp.zeros((0,), jnp.int32)

    def inner_opt(q, k, v, jk, jv, jlen):
        return inner(q, k, v, jk if has_joint else None,
                     jv if has_joint else None,
                     jlen if has_jlen else None)

    fn = jax.shard_map(inner_opt, mesh=mesh, in_specs=tuple(specs),
                       out_specs=P(None, axis, None, None),
                       check_vma=False)
    return fn(q, k, v, joint_k, joint_v, joint_kv_len)


def ring_ulysses_attention(q, k, v, mesh: Mesh, *, ring_axis: str = "ring",
                           ulysses_axis: str = "sp", joint_k=None,
                           joint_v=None, sm_scale=None, joint_kv_len=None):
    """Explicit 2-D sequence parallelism: ``world == ring x ulysses``
    (the reference's composition contract,
    `/root/reference/hyvideo/config.py:451-468`).

    Tokens are sharded over BOTH mesh axes (ring-major). Inside one
    shard_map island: ``all_to_all`` over the ulysses axis trades the
    ulysses token shard for a head shard (each device then holds S/ring
    tokens of H/ulysses heads), KV rotates around the ring axis with
    ``ppermute`` exactly like :func:`ring_attention`, and replicated joint
    (text) KV is folded in as a final local chunk after slicing the
    device's local heads (the reference's per-rank txt KV head slice,
    `xdit_ring_atten.py:156-177`). Dense attention — the reference ring
    path is dense flash as well (`xdit_ring_atten.py:302-327`).

    q/k/v: [B, S_local, H, D] where S_local = S/(ring*ulysses); returns
    the same sharding. H must divide the ulysses axis size.
    """
    nr = mesh.shape[ring_axis]
    nu = mesh.shape[ulysses_axis]
    b, _, h, d = q.shape
    if h % nu:
        raise ValueError(f"heads ({h}) must divide the ulysses axis ({nu})")
    scale = sm_scale if sm_scale is not None else d ** -0.5

    def inner(q, k, v, jk, jv, jlen):
        def a2a_fwd(x):
            return jax.lax.all_to_all(x, ulysses_axis, split_axis=2,
                                      concat_axis=1, tiled=True)

        def a2a_bwd(x):
            return jax.lax.all_to_all(x, ulysses_axis, split_axis=1,
                                      concat_axis=2, tiled=True)

        qt = a2a_fwd(q).transpose(0, 2, 1, 3)   # [B, H/u, S/r, D]
        kt = a2a_fwd(k).transpose(0, 2, 1, 3)
        vt = a2a_fwd(v).transpose(0, 2, 1, 3)

        out, lse = _partial_attn(qt, kt, vt, scale)

        def step(carry, _):
            o, l, kc, vc = carry
            perm = [(i, (i + 1) % nr) for i in range(nr)]
            kc = jax.lax.ppermute(kc, ring_axis, perm)
            vc = jax.lax.ppermute(vc, ring_axis, perm)
            o2, l2 = _partial_attn(qt, kc, vc, scale)
            o, l = _merge(o, l, o2, l2)
            return (o, l, kc, vc), None

        (out, lse, _, _), _ = jax.lax.scan(
            step, (out, lse, kt, vt), None, length=nr - 1)

        if jk is not None:
            u = jax.lax.axis_index(ulysses_axis)
            hloc = h // nu
            jk_l = jax.lax.dynamic_slice_in_dim(jk, u * hloc, hloc, axis=2)
            jv_l = jax.lax.dynamic_slice_in_dim(jv, u * hloc, hloc, axis=2)
            o2, l2 = _partial_attn(qt, jk_l.transpose(0, 2, 1, 3),
                                   jv_l.transpose(0, 2, 1, 3), scale,
                                   kv_len=jlen)
            out, lse = _merge(out, lse, o2, l2)
        return a2a_bwd(out.transpose(0, 2, 1, 3)).astype(q.dtype)

    has_joint = joint_k is not None
    if joint_kv_len is not None:
        joint_kv_len = jnp.broadcast_to(
            jnp.asarray(joint_kv_len, jnp.int32).reshape(-1), (q.shape[0],))
    has_jlen = joint_kv_len is not None
    tok = P(None, (ring_axis, ulysses_axis), None, None)
    specs = [tok] * 3 + [P(), P(), P()]
    if not has_joint:
        joint_k = joint_v = jnp.zeros((0,), q.dtype)
    if not has_jlen:
        joint_kv_len = jnp.zeros((0,), jnp.int32)

    def inner_opt(q, k, v, jk, jv, jlen):
        return inner(q, k, v, jk if has_joint else None,
                     jv if has_joint else None,
                     jlen if has_jlen else None)

    fn = jax.shard_map(inner_opt, mesh=mesh, in_specs=tuple(specs),
                       out_specs=tok, check_vma=False)
    return fn(q, k, v, joint_k, joint_v, joint_kv_len)
