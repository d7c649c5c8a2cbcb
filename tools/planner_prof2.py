"""RTT-floor check + 30x-chained stage timing (amortizes relay latency)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from jenga_tpu.curves.blocks import build_curve_plan
from jenga_tpu.sparse import planner as P
from jenga_tpu.ops.block_sparse_attention import block_sparse_attention

plan = build_curve_plan((21, 30, 52), "sliced", 128)
s = -(-plan.seq_len // 128) * 128
b, h, d, nb = 2, 12, 128, s // 128
kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
v = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)
neighbors = jnp.asarray(plan.block_neighbors)[:nb, :nb].astype(bool)
top_k = int(0.25 * nb)

def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))

def timeit(fn, *a, iters=6):
    out = fn(*a); sync(out)
    best = float("inf")
    for i in range(iters):
        t0 = time.perf_counter(); out = fn(*a); sync(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3

tiny = jnp.ones((8, 128), jnp.float32)
print(f"RTT floor (tiny add): {timeit(jax.jit(lambda x: x + 1), tiny):6.2f} ms")

N = 30
def planner_once(q, k):
    _, lists = P.plan_block_sparsity(
        q, k, neighbors, top_k=top_k, p_remain=0.15,
        text_start_block=nb, text_blocks=0)
    return lists

@jax.jit
def planner_n(q, k):
    def body(i, c):
        lists = planner_once(q * (1 + 0.001 * i.astype(jnp.bfloat16)), k)
        return c + jnp.sum(lists[..., 0])
    return jax.lax.fori_loop(0, N, body, jnp.int32(0))

t = timeit(planner_n, q, k)
print(f"planner x{N} chained: {t:7.1f} ms -> {t/N:6.2f} ms/layer")

_, lists = jax.jit(lambda q, k: P.plan_block_sparsity(
    q, k, neighbors, top_k=top_k, p_remain=0.15,
    text_start_block=nb, text_blocks=0))(q, k)

@jax.jit
def kernel_n(q, k, v, lists):
    def body(i, acc):
        o = block_sparse_attention(
            q * (1 + 0.001 * i.astype(jnp.bfloat16)), k, v, lists)
        return acc + jnp.sum(o[:, :, ::1024].astype(jnp.float32))
    return jax.lax.fori_loop(0, N, body, jnp.float32(0))

t = timeit(kernel_n, q, k, v, lists, iters=3)
print(f"kernel  x{N} chained: {t:7.1f} ms -> {t/N:6.2f} ms/layer (29% density)")
