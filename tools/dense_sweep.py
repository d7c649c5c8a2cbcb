import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from jax.experimental.pallas.ops.tpu.flash_attention import (
    BlockSizes, flash_attention as pl_flash)

b, h, s, d = 2, 12, 32768, 128
key = jax.random.PRNGKey(0)
kq, kk, kv = jax.random.split(key, 3)
q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
v = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)
sm = d ** -0.5
N = 4

def chain(bs):
    @jax.jit
    def g(q, k, v):
        def body(i, acc):
            out = pl_flash(q * (1 + 0.0005 * i.astype(q.dtype)), k, v,
                           causal=False, sm_scale=sm, block_sizes=bs)
            return acc + jnp.sum(out[:, :, ::1024].astype(jnp.float32))
        return jax.lax.fori_loop(0, N, body, jnp.float32(0))
    float(g(q, k, v))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(g(q, k, v))
        best = min(best, time.perf_counter() - t0)
    return best / N * 1e3

@jax.jit
def gdef(q, k, v):
    def body(i, acc):
        out = pl_flash(q * (1 + 0.0005 * i.astype(q.dtype)), k, v,
                       causal=False, sm_scale=sm)
        return acc + jnp.sum(out[:, :, ::1024].astype(jnp.float32))
    return jax.lax.fori_loop(0, N, body, jnp.float32(0))
float(gdef(q, k, v)); best = float("inf")
for _ in range(3):
    t0 = time.perf_counter(); float(gdef(q, k, v))
    best = min(best, time.perf_counter() - t0)
print(f"default:              {best/N*1e3:8.2f} ms")

for bq, bk in ((512, 512), (1024, 1024), (2048, 1024), (1024, 2048),
               (2048, 2048)):
    bs = BlockSizes(block_q=bq, block_k_major=bk, block_k=bk, block_b=1)
    print(f"bq={bq:4d} bk={bk:4d}:    {chain(bs):8.2f} ms")
