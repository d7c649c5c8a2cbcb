"""Prefix-chain timing of the planner stages on TPU (scalar-sync, robust
to the relay backend's early block_until_ready)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from jenga_tpu.curves.blocks import build_curve_plan
from jenga_tpu.sparse import planner as P

plan = build_curve_plan((21, 30, 52), "sliced", 128)
s = -(-plan.seq_len // 128) * 128
b, h, d, nb = 2, 12, 128, s // 128
kq, kk = jax.random.split(jax.random.PRNGKey(0))
q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
neighbors = jnp.asarray(plan.block_neighbors)[:nb, :nb].astype(bool)
top_k = int(0.25 * nb)

def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))

def timeit(fn, *a, iters=10):
    out = fn(*a); sync(out)
    best = float("inf")
    for i in range(iters):
        t0 = time.perf_counter(); out = fn(*a); sync(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3

def stage(upto):
    def f(q, k):
        qp = q.reshape(b, h, nb, 128, d).mean(3)
        kp = k.reshape(b, h, nb, 128, d).mean(3)
        if upto == "pool": return qp
        sc = jnp.einsum("bhqd,bhkd->bhqk", qp, kp,
                        preferred_element_type=jnp.float32) * d**-0.5
        pr = jax.nn.softmax(sc, -1)
        sp = jnp.sort(pr, -1, descending=True)
        cs = jnp.cumsum(sp, -1)
        needed = jnp.clip(jnp.sum(cs <= 0.15, -1) + 1, top_k, nb)
        kth = jnp.take_along_axis(sp, needed[..., None] - 1, axis=-1)
        vm = pr >= kth
        if upto == "select": return vm
        m = vm | neighbors[None, None]
        if upto == "neighbor": return m
        idx, cnt = P.mask_to_block_lists(m)
        if upto == "lists": return (idx, cnt)
        return P.pack_block_lists(idx, cnt)
    return jax.jit(f)

prev = 0.0
for name in ["pool", "select", "neighbor", "lists", "pack"]:
    t = timeit(stage(name), q, k)
    print(f"{name:10s} cumulative {t:7.2f} ms   delta {t-prev:+7.2f} ms")
    prev = t
