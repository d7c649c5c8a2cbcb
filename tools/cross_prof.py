"""Cross-attention variants at skv=512 + rope-apply check on TPU."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental.pallas.ops.tpu.flash_attention import (
    BlockSizes, flash_attention as pl_flash)
from jenga_tpu.models import layers as L

b, h, s, skv, d = 2, 12, 32768, 512, 128
key = jax.random.PRNGKey(0)
kq, kk, kv = jax.random.split(key, 3)
q = jax.random.normal(kq, (b, s, h, d), jnp.bfloat16)
k = jax.random.normal(kk, (b, skv, h, d), jnp.bfloat16)
v = jax.random.normal(kv, (b, skv, h, d), jnp.bfloat16)
sm = d ** -0.5
N = 20

def chain(f, *args):
    @jax.jit
    def g(*args):
        def body(i, acc):
            out = f(args[0] * (1 + 0.0005 * i.astype(args[0].dtype)),
                    *args[1:])
            return acc + jnp.sum(out[:, ::1024].astype(jnp.float32))
        return jax.lax.fori_loop(0, N, body, jnp.float32(0))
    float(g(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(g(*args))
        best = min(best, time.perf_counter() - t0)
    return best / N * 1e3

def flash_def(q, k, v):
    return pl_flash(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                    v.transpose(0, 2, 1, 3), causal=False,
                    sm_scale=sm).transpose(0, 2, 1, 3)
print(f"flash default:        {chain(flash_def, q, k, v):7.2f} ms")

for bq in (512, 1024, 2048):
    bs = BlockSizes(block_q=bq, block_k_major=512, block_k=512, block_b=1)
    def flash_t(q, k, v, bs=bs):
        return pl_flash(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                        v.transpose(0, 2, 1, 3), causal=False, sm_scale=sm,
                        block_sizes=bs).transpose(0, 2, 1, 3)
    print(f"flash bq={bq:4d} bk=512: {chain(flash_t, q, k, v):7.2f} ms")

def jnp_bshd(q, k, v):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * sm
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32)
                      ).astype(q.dtype)
print(f"jnp bshd f32:         {chain(jnp_bshd, q, k, v):7.2f} ms")

def jnp_bshd_bf16mm(q, k, v):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * sm
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p.astype(jnp.bfloat16), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
print(f"jnp bshd bf16 mm:     {chain(jnp_bshd_bf16mm, q, k, v):7.2f} ms")

# rope after the matmul-swap rewrite
cos, sin = L.rope_table_1d(np.arange(s), d)
cos, sin = jnp.asarray(cos), jnp.asarray(sin)
def rope(x):
    return L.apply_rope(x, cos, sin)
print(f"rope apply (new):     {chain(rope, q):7.2f} ms")

# numerics check vs naive
def naive(x):
    xf = x.astype(jnp.float32)
    xr, xi = xf[..., 0::2], xf[..., 1::2]
    c, sn = cos[:, None, :], sin[:, None, :]
    y = jnp.stack([xr * c - xi * sn, xr * sn + xi * c], -1).reshape(x.shape)
    return y.astype(x.dtype)
err = float(jnp.max(jnp.abs(L.apply_rope(q, cos, sin).astype(jnp.float32)
                            - naive(q).astype(jnp.float32))))
print(f"rope numerics vs naive: {err:.6f}")
