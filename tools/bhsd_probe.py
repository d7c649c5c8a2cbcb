"""Can the per-layer BSHD->BHSD operand transposes be absorbed into the
q/k/v projections? Wan stage-1 shape: b=2, s=32768, d_model=1536, 12
heads x 128.

The carved path currently computes q = rope(rms(linear(x))) in
[B,S,H,D] and transposes q,k,v to [B,H,S,D] for the planner+kernel
(models/wan.py:299-301) — ~600 MB of pure layout traffic per layer.
Variants:

  current    linear -> [b,s,h,k] -> rms/rope -> transpose
  bhsk       einsum('bsd,dhk->bhsk') with cross-head rms stats and
             BHSD rope (the transpose rides the matmul epilogue if XLA
             cooperates)
  bshk+T     same einsum to 'bshk' then explicit transpose (control)

Each variant computes all three operands (q rms+rope, k rms+rope, v
plain) and reduces with a full f32 sum (equal cost across variants).

Measured 2026-08-20 (v5e): current 14.37 ms, bhsk einsum 14.49 ms,
bshk+T 14.23 ms — NEUTRAL. XLA already folds the BSHD->BHSD transposes
into the rms/rope elementwise epilogues; restructuring the projections
buys nothing. Keep the readable BSHD formulation in models/wan.py.
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from jenga_tpu.utils.compile_cache import enable_repo_cache

enable_repo_cache(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import jax.numpy as jnp

b, s, dm, h, hd = 2, 32768, 1536, 12, 128
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
x = jax.random.normal(ks[0], (b, s, dm), jnp.bfloat16)
Wq = jax.random.normal(ks[1], (dm, dm), jnp.bfloat16) * 0.02
Wk = jax.random.normal(ks[2], (dm, dm), jnp.bfloat16) * 0.02
Wv = jax.random.normal(ks[3], (dm, dm), jnp.bfloat16) * 0.02
gq = jax.random.normal(ks[4], (dm,), jnp.float32) * 0.1 + 1.0
gk = jax.random.normal(ks[5], (dm,), jnp.float32) * 0.1 + 1.0
cos = jax.random.normal(ks[6], (s, hd), jnp.float32)
sin = jax.random.normal(ks[7], (s, hd), jnp.float32)
N = 8
eps = 1e-6


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
    def f(x):
        def body(i, c):
            scale = (1.0 + 0.05 * i.astype(jnp.float32)).astype(x.dtype)
            q, k, v = once(x * scale)
            return (c + jnp.sum(q, dtype=jnp.float32)
                    + jnp.sum(k, dtype=jnp.float32)
                    + jnp.sum(v, dtype=jnp.float32))
        return jax.lax.fori_loop(0, N, body, 0.0)
    return f


def rms_flat(y, g):
    yf = y.astype(jnp.float32)
    r = jax.lax.rsqrt(jnp.mean(yf * yf, axis=-1, keepdims=True) + eps)
    return (yf * r * g).astype(y.dtype)


def rope_bshd(t):                      # [b,s,h,hd]
    c = cos[None, :, None, :]
    sn = sin[None, :, None, :]
    t1, t2 = jnp.split(t.astype(jnp.float32), 2, axis=-1)
    rot = jnp.concatenate([-t2, t1], axis=-1)
    return (t.astype(jnp.float32) * c + rot * sn).astype(t.dtype)


def rope_bhsd(t):                      # [b,h,s,hd]
    c = cos[None, None, :, :]
    sn = sin[None, None, :, :]
    t1, t2 = jnp.split(t.astype(jnp.float32), 2, axis=-1)
    rot = jnp.concatenate([-t2, t1], axis=-1)
    return (t.astype(jnp.float32) * c + rot * sn).astype(t.dtype)


def current(x):
    q = rms_flat(x @ Wq, gq).reshape(b, s, h, hd)
    k = rms_flat(x @ Wk, gk).reshape(b, s, h, hd)
    v = (x @ Wv).reshape(b, s, h, hd)
    q = rope_bshd(q).transpose(0, 2, 1, 3)
    k = rope_bshd(k).transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    return q, k, v


Wq4 = Wq.reshape(dm, h, hd)
Wk4 = Wk.reshape(dm, h, hd)
Wv4 = Wv.reshape(dm, h, hd)
gq4 = gq.reshape(h, hd)
gk4 = gk.reshape(h, hd)


def rms_bhsd(y, g4):                   # stats span ALL heads (h, hd)
    yf = y.astype(jnp.float32)
    m = jnp.mean(yf * yf, axis=(1, 3), keepdims=True)
    return (yf * jax.lax.rsqrt(m + eps) * g4[None, :, None, :]) \
        .astype(y.dtype)


def bhsk(x):
    q = rms_bhsd(jnp.einsum("bsd,dhk->bhsk", x, Wq4), gq4)
    k = rms_bhsd(jnp.einsum("bsd,dhk->bhsk", x, Wk4), gk4)
    v = jnp.einsum("bsd,dhk->bhsk", x, Wv4)
    return rope_bhsd(q), rope_bhsd(k), v


def bshk_T(x):
    q = rms_flat(jnp.einsum("bsd,dhk->bshk", x, Wq4).reshape(b, s, dm),
                 gq).reshape(b, s, h, hd)
    k = rms_flat(jnp.einsum("bsd,dhk->bshk", x, Wk4).reshape(b, s, dm),
                 gk).reshape(b, s, h, hd)
    v = jnp.einsum("bsd,dhk->bshk", x, Wv4)
    return (rope_bshd(q).transpose(0, 2, 1, 3),
            rope_bshd(k).transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3))


for name, fn in [("current (T)", current), ("bhsk einsum", bhsk),
                 ("bshk + T", bshk_T)]:
    t = timeit(chained(fn), x)
    print(f"{name:12s} {t:6.2f} ms", flush=True)

# numerics: bhsk vs current
qa, ka, va = current(x)
qb, kb, vb = bhsk(x)
for nm, a_, b_ in (("q", qa, qb), ("k", ka, kb), ("v", va, vb)):
    err = float(jnp.max(jnp.abs(a_.astype(jnp.float32)
                                - b_.astype(jnp.float32))))
    print(f"max |{nm}_bhsk - {nm}_current| = {err:.6f}", flush=True)
