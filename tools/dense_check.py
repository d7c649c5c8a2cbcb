"""Direct single-call timing of dense attention paths at (2,12,32768,128)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from jax.experimental.pallas.ops.tpu.flash_attention import (
    BlockSizes, flash_attention as pl_flash)
from jenga_tpu.ops.block_sparse_attention import block_sparse_attention
from jenga_tpu.sparse import planner as P

b, h, s, d = 2, 12, 32768, 128
key = jax.random.PRNGKey(0)
kq, kk, kv = jax.random.split(key, 3)
q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
v = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)
sm = d ** -0.5
FL = 4 * b * h * s * s * d

def timeit(fn, iters=4):
    out = fn(q, k, v); float(jnp.sum(out[:, :, ::1024].astype(jnp.float32)))
    best = float("inf")
    for i in range(iters):
        t0 = time.perf_counter()
        out = fn(q * (1 + 0.001 * i), k, v)
        float(jnp.sum(out[:, :, ::1024].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best

t = timeit(jax.jit(lambda q, k, v: pl_flash(q, k, v, causal=False,
                                            sm_scale=sm)))
print(f"pl_flash default:   {t*1e3:8.1f} ms  {FL/t/1e12:6.1f} TFLOP/s")

for bq, bk in ((1024, 1024), (2048, 512), (512, 1024)):
    bs = BlockSizes(block_q=bq, block_k_major=bk, block_k=bk, block_b=1)
    try:
        t = timeit(jax.jit(lambda q, k, v, bs=bs: pl_flash(
            q, k, v, causal=False, sm_scale=sm, block_sizes=bs)))
        print(f"pl_flash bq={bq} bk={bk}: {t*1e3:8.1f} ms  "
              f"{FL/t/1e12:6.1f} TFLOP/s")
    except Exception as e:
        print(f"pl_flash bq={bq} bk={bk}: FAILED {type(e).__name__}")

nb = s // 128
@jax.jit
def full_lists(q, k):
    return P.plan_block_sparsity(q, k, None, top_k=nb, p_remain=1.0,
                                 text_start_block=nb, text_blocks=0)[1]
lists = full_lists(q, k)
t = timeit(jax.jit(lambda q, k, v: block_sparse_attention(q, k, v, lists)))
print(f"gather kernel full: {t*1e3:8.1f} ms  {FL/t/1e12:6.1f} TFLOP/s")
