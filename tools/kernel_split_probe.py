"""Split the gather kernel's time into DMA vs compute.

Builds two degenerate variants of the production kernel at the HY 720p
shape/density:
  dma-only   — gathers exactly the same blocks, skips all matmul/softmax
  compute-only — same matmul/softmax work on resident VMEM garbage,
                 gathers each group only once per row-slot (reuses data)
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jenga_tpu.curves.blocks import build_curve_plan
from jenga_tpu.ops.block_sparse_attention import block_sparse_attention
from jenga_tpu.sparse import planner as P

_LOG2E = 1.4426950408889634


def _kernel(q_ref, kv_hbm, lists_hbm, o_ref, idx_smem, kv_buf, list_sems,
            kv_sems, *, sm_scale, block_m, block_n, row_size, group,
            do_dma, do_compute):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    nqb = pl.num_programs(1)
    total = pl.num_programs(0) * nqb
    d = q_ref.shape[-1]
    gn = group * block_n
    step = bh * nqb + qi
    parity = jax.lax.rem(step, 2)

    def idx_dma(row_step, slot):
        return pltpu.make_async_copy(
            lists_hbm.at[pl.ds(row_step * row_size, row_size)],
            idx_smem.at[pl.ds(slot * row_size, row_size)],
            list_sems.at[slot])

    def blk_of(islot, j, g):
        base = islot * row_size
        n_ = idx_smem[base]
        pos = j * group + g
        return idx_smem[base + 2 + jnp.where(pos < n_, pos, 0)]

    def group_copies(islot, bh_, j, slot):
        return [
            pltpu.make_async_copy(
                kv_hbm.at[bh_, pl.ds(blk_of(islot, j, g) * block_n,
                                     block_n)],
                kv_buf.at[slot, pl.ds(g * block_n, block_n)],
                kv_sems.at[slot, g])
            for g in range(group)
        ]

    def start_group(islot, bh_, j, slot):
        if not do_dma:
            return
        for c in group_copies(islot, bh_, j, slot):
            c.start()

    def wait_group(islot, bh_, j, slot):
        if not do_dma:
            return
        for c in group_copies(islot, bh_, j, slot):
            c.wait()

    @pl.when(step == 0)
    def _():
        idx_dma(0, 0).start()
        idx_dma(0, 0).wait()
        start_group(0, bh, 0, 2)

    n = idx_smem[parity * row_size]
    n_groups = (n + group - 1) // group

    @pl.when(step + 1 < total)
    def _():
        idx_dma(step + 1, 1 - parity).start()

    q = q_ref[0].astype(jnp.float32) * (sm_scale * _LOG2E)
    q = q.astype(kv_buf.dtype)

    neg_inf = jnp.float32(-1e30)
    m0 = jnp.full((block_m, 128), neg_inf, jnp.float32)
    l0 = jnp.zeros((block_m, 128), jnp.float32)
    acc0 = jnp.zeros((block_m, d), jnp.float32)

    def compute_group(j, slot, carry):
        m_prev, l_prev, acc = carry
        wait_group(parity, bh, j, slot)
        if not do_compute:
            return m_prev, l_prev, acc
        kb = kv_buf[slot, :, :d]
        qk = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_cur = jnp.max(qk, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(qk - m_next[:, :1])
        l_next = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        vb = kv_buf[slot, :, d:]
        acc = acc * alpha[:, :1] + jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_next, l_next, acc

    @pl.when(n_groups > 1)
    def _():
        start_group(parity, bh, 1, 1)
    carry = compute_group(0, 2, (m0, l0, acc0))

    @pl.when(step + 1 < total)
    def _():
        idx_dma(step + 1, 1 - parity).wait()
        next_bh = (step + 1) // nqb
        start_group(1 - parity, next_bh, 0, 2)

    def body(j, carry):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_groups)
        def _():
            start_group(parity, bh, j + 1, 1 - slot)

        return compute_group(j, slot, carry)

    m, l, acc = jax.lax.fori_loop(1, n_groups, body, carry)
    l_safe = jnp.where(l[:, :1] == 0.0, 1.0, l[:, :1])
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)


def variant(q, k, v, block_lists, *, do_dma, do_compute, group=16):
    b, h, s, d = q.shape
    skv = k.shape[2]
    block_m = block_n = 128
    nqb = s // block_m
    row_size = block_lists.shape[-1]
    bh = b * h
    qf = q.reshape(bh, s, d)
    kvf = jnp.concatenate([k.reshape(bh, skv, d), v.reshape(bh, skv, d)],
                          axis=-1)
    lists_flat = block_lists.reshape(bh * nqb * row_size)
    kernel = functools.partial(
        _kernel, sm_scale=d ** -0.5, block_m=block_m, block_n=block_n,
        row_size=row_size, group=group, do_dma=do_dma,
        do_compute=do_compute)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        grid=(bh, nqb),
        in_specs=[
            pl.BlockSpec((1, block_m, d), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, block_m, d), lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((2 * row_size,), jnp.int32),
            pltpu.VMEM((3, group * block_n, 2 * d), k.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((3, group)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(qf, kvf, lists_flat)


b, h, d = 1, 24, 128
plan = build_curve_plan((32, 45, 80), "gilbert", 128)
s = -(-(plan.seq_len + 256) // 128) * 128
nb = s // 128
tsb = nb - 2
key = jax.random.PRNGKey(0)
kq, kk, kv = jax.random.split(key, 3)
q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
v = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)


@jax.jit
def make_lists(q, k):
    m = P.build_block_mask(q[:, :, :tsb * 128], k, top_k=225, p_remain=0.05,
                           text_start_block=tsb, text_blocks=2,
                           block_neighbors=jnp.asarray(plan.block_neighbors))
    full = jnp.ones((b, h, nb - tsb, nb), bool)
    return P.pack_block_lists(
        *P.mask_to_block_lists(jnp.concatenate([m, full], 2)))


lists = jax.block_until_ready(make_lists(q, k))


def sync(o):
    return float(jnp.sum(jnp.nan_to_num(o[..., ::257]).astype(jnp.float32)))


def timeit(fn, iters=3):
    sync(fn())
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn())
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


full_j = jax.jit(lambda q, k, v, l: block_sparse_attention(
    q, k, v, l, text_start_block=tsb))
var_j = jax.jit(variant, static_argnames=("do_dma", "do_compute", "group"))

for g in (8, 16, 32, 48):
    print(f"dma-only group {g:2d}  "
          f"{timeit(lambda: var_j(q, k, v, lists, do_dma=True, do_compute=False, group=g)):8.1f} ms",
          flush=True)
    print(f"comp-only group {g:2d} "
          f"{timeit(lambda: var_j(q, k, v, lists, do_dma=False, do_compute=True, group=g)):8.1f} ms",
          flush=True)
print(f"production kernel "
      f"{timeit(lambda: full_j(q, k, v, lists)):8.1f} ms", flush=True)
print(f"probe both        "
      f"{timeit(lambda: var_j(q, k, v, lists, do_dma=True, do_compute=True)):8.1f} ms",
      flush=True)
print(f"dma-only          "
      f"{timeit(lambda: var_j(q, k, v, lists, do_dma=True, do_compute=False)):8.1f} ms",
      flush=True)
print(f"compute-only      "
      f"{timeit(lambda: var_j(q, k, v, lists, do_dma=False, do_compute=True)):8.1f} ms",
      flush=True)
