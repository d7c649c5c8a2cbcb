"""Locate the joint (all_member) shared-gather kernel's epilogue cost.

The paired-pipeline kernel at HY-720p/q4g8 runs ~423 ms/layer against a
~283 ms pure-FLOP floor (density * dense-flash time): is the gap the VPU
softmax epilogue, the safe-path zero-bias adds, or the running-max
bookkeeping?  Variants of the production kernel (same DMA pipeline, same
group order), timed at the HY joint-selection shape:

  base    — the production epilogue (safe-group cond returns (1, gn)
            biases; qk + bias and qk + row_video*camp run even when the
            biases are all zero)
  condqk  — the adds move INSIDE the unsafe branch: lax.cond carries the
            (rr, gn) f32 qk (2 MB) and safe groups skip the adds entirely
            (this was assumed to overflow scoped VMEM; measure it)
  oracle  — no masking at all (wrong at list overhang / text columns;
            timing floor for "what if masking were free")
  nomax   — oracle + constant running max (no m update, no alpha rescale;
            floor for the max/rescale bookkeeping)

RESULT (v5e, HY-720p joint shape, ms/layer): base 434 / condqk 559 /
fixedmax 377 / oracle 396 / nomax 349.  The max/rescale bookkeeping was
the gap, not the zero-bias adds (condqk's VMEM-carried cond is a
regression).  Landed as the ``fixed_max`` epilogue in
``ops/block_sparse_attention.py`` (Cauchy-Schwarz logit bound per
batch-head, no recurrence), which also un-blocked the vectorized
q_rows=8 form: 327 ms/layer, now the production default (bench.py,
BENCH_QROWS=8).  q_rows=16 is structurally off the table on v5e: the
(q_rows*128, group*128) f32 logits+probs already force the KV group
width down past q_rows=4 to fit scoped VMEM (see the group autotune in
``block_sparse_attention_grouped``), and halving group again costs more
than the extra amortization buys; it would also double the selection
granularity past the fidelity-checked q8 (FIDELITY.json).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from jenga_tpu.utils.compile_cache import enable_repo_cache

enable_repo_cache(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jenga_tpu.sparse.planner import mask_to_block_lists, pack_block_lists

_LOG2E = 1.4426950408889634


def _kernel_variant(q_ref, kv_hbm, lists_hbm, o_ref, idx_smem, kv_buf,
                    list_sems, kv_sems, *, sm_scale, text_amp,
                    text_start_block, block_m, block_n, row_size, group,
                    q_rows, variant):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    ngr = pl.num_programs(1)
    total = pl.num_programs(0) * ngr
    d = q_ref.shape[-1]
    gn = group * block_n
    rr = q_rows * block_m
    stride = row_size
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

    q_all = q_ref[0].astype(jnp.float32) * (sm_scale * _LOG2E)
    q_all = q_all.astype(kv_buf.dtype)

    neg_inf = jnp.float32(-1e30)
    m0 = jnp.full((rr, 128),
                  20.0 if variant in ("nomax", "fixedmax") else neg_inf,
                  jnp.float32)
    l0 = jnp.zeros((rr, 128), jnp.float32)
    acc0 = jnp.zeros((rr, d), jnp.float32)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, gn), 1)
    lane = jax.lax.rem(col, block_n)
    row_of = jax.lax.broadcasted_iota(jnp.int32, (rr, 1), 0) // block_m

    def _col_bias(j):
        blk_ids = [blk_of(parity, j, g) for g in range(group)]
        seg = col // block_n
        blk_col = jnp.zeros((1, gn), jnp.int32)
        for g in range(group):
            blk_col = jnp.where(seg == g, blk_ids[g], blk_col)
        in_list = (j * group + seg) < n
        in_seq = blk_col * block_n + lane < seqlen
        valid = jnp.logical_and(in_list, in_seq)
        bias = jnp.where(valid, 0.0, neg_inf)
        camp = jnp.where(blk_col >= text_start_block,
                         jnp.float32(text_amp), 0.0)
        return bias, camp

    row_video = jnp.where(qi * q_rows + row_of < text_start_block,
                          jnp.float32(1.0), 0.0)

    def compute_group(j, slot, carry):
        m_prev, l_prev, acc = carry
        wait_group(parity, bh, j, slot)

        kb = kv_buf[slot, :, :d]
        vb = kv_buf[slot, :, d:]
        qk = jax.lax.dot_general(
            q_all, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        last_id = blk_of(parity, j, group - 1)
        safe = jnp.logical_and(
            (j + 1) * group <= n,
            (last_id + 1) * block_n <= seqlen)
        if text_amp != 0.0:
            safe = jnp.logical_and(safe, last_id < text_start_block)
        if variant in ("base", "fixedmax"):
            zero_b = jnp.zeros((1, gn), jnp.float32)
            bias, camp = jax.lax.cond(
                safe, lambda: (zero_b, zero_b), lambda: _col_bias(j))
            qk = qk + bias
            if text_amp != 0.0:
                qk = qk + row_video * camp
        elif variant == "condqk":
            def _unsafe(qk_):
                bias, camp = _col_bias(j)
                out = qk_ + bias
                if text_amp != 0.0:
                    out = out + row_video * camp
                return out
            qk = jax.lax.cond(safe, lambda qk_: qk_, _unsafe, qk)
        # oracle/nomax: no masking at all
        if variant in ("fixedmax", "nomax"):
            # NO running max: m stays at the f32-safe upper bound (probe:
            # constant 20; production: per-row Cauchy-Schwarz bound
            # scale*log2e*||q_i||*max||k||). p values are uniformly small
            # but f32/bf16 are scale-free in relative precision, so acc/l
            # is as accurate as the rescaling path. fixedmax keeps full
            # masking (above); nomax also dropped it.
            m_next = m_prev
            p = jnp.exp2(qk - m_next[:, :1])
            l_next = l_prev + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc + jax.lax.dot_general(
                p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return m_next, l_next, acc
        m_cur = jnp.max(qk, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
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
    carry = compute_group(0, 2, (m0, l0, acc0))

    @pl.when(n_groups > 2)
    def _():
        start_group(parity, bh, 2, wslot(2))

    @pl.when(step + 1 < total)
    def _():
        idx_dma(step + 1, 1 - parity).wait()
        next_bh = (step + 1) // ngr
        start_group(1 - parity, next_bh, 0, 2)

    def pair_body(it, carry):
        j = 1 + 2 * it

        @pl.when(j + 2 < n_groups)
        def _():
            start_group(parity, bh, j + 2, wslot(j + 2))

        carry = compute_group(j, wslot(j), carry)

        @pl.when(j + 3 < n_groups)
        def _():
            start_group(parity, bh, j + 3, wslot(j + 3))

        return compute_group(j + 1, wslot(j + 1), carry)

    m, l, acc = jax.lax.fori_loop(0, n_groups // 2, pair_body, carry)
    l_safe = jnp.where(l[:, :1] == 0.0, 1.0, l[:, :1])
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("q_rows", "group", "variant",
                                             "text_amp"))
def run_variant(q, k, v, block_lists, *, q_rows, group, variant,
                text_amp=1.0):
    b, h, s, d = q.shape
    skv = k.shape[2]
    block_m = block_n = 128
    ngr = s // (block_m * q_rows)
    stride = block_lists.shape[-1]
    tsb = skv // 128 - 2
    bh = b * h
    qf = q.reshape(bh, s, d)
    kvf = jnp.concatenate([k.reshape(bh, skv, d), v.reshape(bh, skv, d)],
                          axis=-1)
    lists_flat = block_lists.reshape(bh * ngr * stride)
    kernel = functools.partial(
        _kernel_variant, sm_scale=d ** -0.5, text_amp=float(text_amp),
        text_start_block=tsb, block_m=block_m, block_n=block_n,
        row_size=stride, group=group, q_rows=q_rows, variant=variant)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        grid=(bh, ngr),
        in_specs=[
            pl.BlockSpec((1, q_rows * block_m, d), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
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
            dimension_semantics=("arbitrary", "arbitrary")),
    )(qf, kvf, lists_flat)
    return out.reshape(b, h, s, d)


def main():
    b, h, d = 1, 24, 128
    nb = 904
    s = nb * 128
    tsb = nb - 2
    density = 0.27
    win = int(density * nb)
    qr, grp = 4, 8

    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)

    rows = jnp.arange(nb)[:, None]
    cols = jnp.arange(nb)[None, :]
    center = jnp.clip(rows, win // 2, tsb - win // 2)
    local = (jnp.abs(cols - center) <= win // 2)
    local = jnp.broadcast_to(local[None, None], (b, h, nb, nb))
    local = local.at[..., tsb:].set(True)
    local = local.at[:, :, tsb:].set(True)

    gmask = jnp.any(local.reshape(b, h, nb // qr, qr, nb), axis=3)
    gl = jax.block_until_ready(pack_block_lists(*mask_to_block_lists(gmask)))
    dens = float(gl[..., 0].astype(jnp.float32).mean()) / nb

    def sync(o):
        return float(jnp.sum(o[..., ::257].astype(jnp.float32)))

    def timeit(fn, *a, iters=4):
        sync(fn(*a))
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            sync(fn(*a))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    base_out = None
    print(f"q_rows={qr} group={grp} density {dens:.3f}", flush=True)
    for variant in ("base", "condqk", "fixedmax", "oracle", "nomax"):
        try:
            f = functools.partial(run_variant, q_rows=qr, group=grp,
                                  variant=variant)
            t = timeit(f, q, k, v, gl)
            out = f(q, k, v, gl)
            if variant == "base":
                base_out = out
                err = 0.0
            elif base_out is None:
                err = float("nan")
            else:
                err = float(jnp.max(jnp.abs(out - base_out)))
            print(f"  {variant:7s} {t:7.1f} ms  (max dev vs base {err:.2e})",
                  flush=True)
        except Exception as e:
            print(f"  {variant:7s} FAIL {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
