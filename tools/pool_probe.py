"""Isolate the planner's POOLING cost at the Wan-1.3B stage-1 shape
(b=2, h=12, s=32768, d=128).

Earlier probes (wan_overhead_probe*.py) timed stages behind a chained
harness whose anti-DCE reduction was a lane-strided sum over the stage
OUTPUT — cheap for the planner's small outputs but multi-ms when a stage
returned q itself, so the probe1 "pool 4.63 ms" and probe2 "floor
4.85 ms" numbers are not comparable. Here every variant reduces to a
small [b,h,d]-ish array with plain sums, and a read-only baseline
(sum over the token axis) pins the pure HBM-read floor for q+k
(~400 MB => ~0.55 ms at v5e's ~740 GB/s sustained).

Measured 2026-08-20 (v5e): read floor 4.21 ms; net over floor —
dot(ones) +1.20 ms, reshape+sum +2.37 ms, reduce_window +0.32 ms,
pallas c32 +0.15 ms. CAUTION: this isolated ranking did NOT transfer
to the compiled model — switching the planner to reduce_window
regressed the HY 115k-token bench ~6% per carved step (dense arms
identical), because in-model the matmul pool fuses with surrounding
ops while the f32 cast ahead of reduce_window materializes. In-model
A/B (bench.py / wan_trunk_ablate.py) is the deciding measurement;
the planner keeps dot(ones). See sparse/planner.py for the numbers.
"""
import functools
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from jenga_tpu.utils.compile_cache import enable_repo_cache

enable_repo_cache(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jenga_tpu.curves.blocks import build_curve_plan
from jenga_tpu.sparse import planner as P

b, h, d = 2, 12, 128
plan = build_curve_plan((21, 30, 52), "sliced", 128)
s = -(-plan.seq_len // 128) * 128
nb = s // 128
g = 8
ngq = nb // g
kq, kk = jax.random.split(jax.random.PRNGKey(0))
q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
neighbors = jnp.asarray(plan.block_neighbors)[:nb, :nb].astype(bool)
top_k = int(0.15 * nb)
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
    """N dependent iterations in one jit; the perturbation (q * scale)
    fuses into the first consumer pass, and the anti-DCE reduction is a
    plain full sum of the (small) stage output."""
    @jax.jit
    def f(q, k):
        def body(i, c):
            scale = (1.0 + 0.05 * i.astype(jnp.float32)).astype(q.dtype)
            out = once(q * scale, k)
            return c + jnp.sum(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, N, body, 0.0)
    return f


# ---- read floor: one clean full pass over q and k, tiny output
t_read = timeit(chained(
    lambda q, k: jnp.sum(q, axis=2, dtype=jnp.float32)
    + jnp.sum(k, axis=2, dtype=jnp.float32)), q, k)
print(f"read floor (sum axis=2)     {t_read:6.2f} ms", flush=True)

ones_b = jnp.full((128,), 1.0 / 128, jnp.bfloat16)


def pool_dot(x):
    return jax.lax.dot_general(
        x.reshape(b, h, nb, 128, d), ones_b,
        (((3,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def pool_sum(x):
    return x.reshape(b, h, nb, 128, d).sum(3, dtype=jnp.float32) / 128.0


def pool_rw(x):
    r = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add,
        (1, 1, 128, 1), (1, 1, 128, 1), "VALID")
    return r / 128.0


def _pool_kernel(x_ref, o_ref):
    xb = x_ref[0].astype(jnp.float32)            # [chunk*128, d]
    o_ref[0] = xb.reshape(-1, 128, d).sum(1) * (1.0 / 128.0)


@functools.partial(jax.jit, static_argnames=("chunk",))
def pool_pallas(x, chunk=16):
    xf = x.reshape(b * h, s, d)
    out = pl.pallas_call(
        _pool_kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, nb, d), jnp.float32),
        grid=(b * h, nb // chunk),
        in_specs=[pl.BlockSpec((1, chunk * 128, d), lambda bi, ci: (bi, ci, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, chunk, d), lambda bi, ci: (bi, ci, 0),
                               memory_space=pltpu.VMEM),
    )(xf)
    return out.reshape(b, h, nb, d)


for name, fn in [("dot(ones)", pool_dot), ("reshape sum", pool_sum),
                 ("reduce_window", pool_rw),
                 ("pallas c8", lambda x: pool_pallas(x, chunk=8)),
                 ("pallas c16", lambda x: pool_pallas(x, chunk=16)),
                 ("pallas c32", lambda x: pool_pallas(x, chunk=32))]:
    try:
        t = timeit(chained(lambda q, k, fn=fn: fn(q) + fn(k)), q, k)
        print(f"pool {name:14s} {t:6.2f} ms (net over read {t - t_read:5.2f})",
              flush=True)
    except Exception as e:
        print(f"pool {name:14s} FAILED: {str(e)[:110]}", flush=True)

# numerics: pallas pool vs f32 mean
ref = q.reshape(b, h, nb, 128, d).astype(jnp.float32).mean(3)
err = float(jnp.max(jnp.abs(pool_pallas(q) - ref)))
print(f"pallas pool max err vs f32 mean: {err:.6f}", flush=True)


# ---- full planner (group-8 joint, production config) on each pool impl
def planner_with(pool):
    def f(q, k):
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
    return f


for name, fn in [("dot(ones)", pool_dot), ("pallas c16",
                                           lambda x: pool_pallas(x, 16))]:
    t = timeit(chained(planner_with(fn)), q, k)
    print(f"planner[{name:10s}] {t:6.2f} ms (net over read {t - t_read:5.2f})",
          flush=True)
