"""Probe the two overhead levers found by wan_prof at the Wan-1.3B bench
shape (b=2, h=12, 32768 tokens, nb=256):

  1. planner stages under joint 4-row group selection (chained 8x inside
     one jit so the relay dispatch floor is amortized),
  2. cross-attention (512 text keys) vs flash block_q tile size.
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from jenga_tpu.utils.compile_cache import enable_repo_cache

enable_repo_cache(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import jax.numpy as jnp

from jenga_tpu.curves.blocks import build_curve_plan
from jenga_tpu.sparse import planner as P

plan = build_curve_plan((21, 30, 52), "sliced", 128)
s = -(-plan.seq_len // 128) * 128
b, h, d, nb = 2, 12, 128, s // 128
g = 4
ngq = nb // g
kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
neighbors = jnp.asarray(plan.block_neighbors)[:nb, :nb].astype(bool)
top_k = int(0.25 * nb)
seqlen = jnp.full((b,), plan.seq_len, jnp.int32)
N = 8


def timeit(fn, *a, iters=5):
    float(fn(*a))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / N


def chained(once):
    @jax.jit
    def f(q, k):
        def body(i, c):
            scale = (1.0 + 0.05 * i.astype(jnp.float32)).astype(q.dtype)
            out = once(q * scale, k)
            return c + jnp.sum(out[..., ::13].astype(jnp.float32))
        return jax.lax.fori_loop(0, N, body, 0.0)
    return f


def stage(upto):
    def f(q, k):
        ones_b = jnp.full((128,), 1.0 / 128, jnp.bfloat16)
        pool = lambda x: jax.lax.dot_general(
            x.reshape(b, h, nb, 128, d), ones_b,
            (((3,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        qp, kp = pool(q), pool(k)
        qp = qp.reshape(b, h, ngq, g, d).mean(3)
        if upto == "pool":
            return qp
        sc = jnp.einsum("bhqd,bhkd->bhqk", qp, kp,
                        preferred_element_type=jnp.float32) * d ** -0.5
        if upto == "scores":
            return sc
        pr = jax.nn.softmax(sc, -1)
        sp = jnp.sort(pr, -1, descending=True)
        cs = jnp.cumsum(sp, -1)
        needed = jnp.clip(jnp.sum(cs <= 0.15, -1) + 1, top_k, nb)
        kth = jnp.take_along_axis(sp, needed[..., None] - 1, axis=-1)
        vm = pr >= kth
        if upto == "topp":
            return vm.astype(jnp.float32)
        nbr = jnp.any(neighbors.reshape(ngq, g, nb), axis=1)
        vm = vm | nbr[None, None]
        vm = vm.at[:, :, :1, :13].set(True)
        if upto == "adj":
            return vm.astype(jnp.float32)
        # current production path: repeat to per-row then re-union
        mask = jnp.repeat(vm, g, axis=2)[:, :, :nb]
        union = jnp.any(mask.reshape(b, h, ngq, g, nb), axis=3)
        lists = P.pack_block_lists(*P.mask_to_block_lists(union),
                                   seqlens=seqlen)
        if upto == "lists":
            return lists.astype(jnp.float32)
        raise ValueError(upto)
    return f


def direct_lists(q, k):
    """Skip the repeat->union roundtrip: pack straight from the group mask."""
    f = stage("adj")
    # rebuild: same as stage('adj') but returning bool
    ones_b = jnp.full((128,), 1.0 / 128, jnp.bfloat16)
    pool = lambda x: jax.lax.dot_general(
        x.reshape(b, h, nb, 128, d), ones_b,
        (((3,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    qp, kp = pool(q), pool(k)
    qp = qp.reshape(b, h, ngq, g, d).mean(3)
    sc = jnp.einsum("bhqd,bhkd->bhqk", qp, kp,
                    preferred_element_type=jnp.float32) * d ** -0.5
    pr = jax.nn.softmax(sc, -1)
    sp = jnp.sort(pr, -1, descending=True)
    cs = jnp.cumsum(sp, -1)
    needed = jnp.clip(jnp.sum(cs <= 0.15, -1) + 1, top_k, nb)
    kth = jnp.take_along_axis(sp, needed[..., None] - 1, axis=-1)
    vm = pr >= kth
    nbr = jnp.any(neighbors.reshape(ngq, g, nb), axis=1)
    vm = vm | nbr[None, None]
    vm = vm.at[:, :, :1, :13].set(True)
    return P.pack_block_lists(*P.mask_to_block_lists(vm),
                              seqlens=seqlen).astype(jnp.float32)


prev = 0.0
for name in ("pool", "scores", "topp", "adj", "lists"):
    t = timeit(chained(stage(name)), q, k)
    print(f"planner..{name:7s} {t:6.2f} ms (+{t - prev:5.2f})", flush=True)
    prev = t
t = timeit(chained(direct_lists), q, k)
print(f"planner direct-lists {t:6.2f} ms", flush=True)

# ---- cross attention tile sweep
from jax.experimental.pallas.ops.tpu.flash_attention import (
    BlockSizes, flash_attention as pl_flash)

kx = jax.random.normal(kk, (b, h, 512, d), jnp.bfloat16)
vx = jax.random.normal(kv, (b, h, 512, d), jnp.bfloat16)

for bq in (1024, 2048, 4096, 8192):
    try:
        def cross(q, k, bq=bq):
            return pl_flash(q, kx, vx, causal=False, sm_scale=d ** -0.5,
                            block_sizes=BlockSizes(block_q=bq,
                                                   block_k_major=512,
                                                   block_k=512, block_b=1))
        t = timeit(chained(cross), q, k)
        print(f"cross bq={bq:5d} {t:6.2f} ms", flush=True)
    except Exception as e:
        print(f"cross bq={bq:5d} FAILED: {str(e)[:120]}", flush=True)

# jnp fused variant for reference
def cross_jnp(q, k):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, kx,
                        preferred_element_type=jnp.float32) * d ** -0.5
    p = jax.nn.softmax(logits, -1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(jnp.bfloat16), vx)

t = timeit(chained(cross_jnp), q, k)
print(f"cross jnp       {t:6.2f} ms", flush=True)
