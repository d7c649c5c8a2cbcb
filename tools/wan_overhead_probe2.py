"""Follow-up probe: (A) block-pooling implementations (the planner's cost
is ~all pooling per wan_overhead_probe), (B) the chained-harness q*scale
floor, (C) a resident-KV Pallas cross-attention kernel vs stock flash at
512 text keys. Wan bench shape: b=2, h=12, s=32768, d=128."""
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

b, h, d = 2, 12, 128
s = 32768
nb = s // 128
kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
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


# -- harness floor: q*scale + strided sum only
t0 = timeit(chained(lambda q, k: q), q, k)
print(f"harness floor      {t0:6.2f} ms", flush=True)

# -- A: pooling variants (pool BOTH q and k, as the planner does)
ones_b = jnp.full((128,), 1.0 / 128, jnp.bfloat16)


def pool_dot(x):
    return jax.lax.dot_general(
        x.reshape(b, h, nb, 128, d), ones_b,
        (((3,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def pool_sum(x):
    return x.reshape(b, h, nb, 128, d).astype(jnp.float32).mean(3)


def pool_sum_bf16_tree(x):
    r = x.reshape(b, h, nb, 2, 64, d)
    r = r.astype(jnp.float32).sum(3)
    return r.sum(3) / 128.0


def pool_batched_dot(x):
    # batched matmul: (b,h,nb) batch, M=1, K=128, N=d
    o = jnp.broadcast_to(ones_b, (b, h, nb, 1, 128))
    return jax.lax.dot_general(
        o, x.reshape(b, h, nb, 128, d),
        (((4,), (3,)), ((0, 1, 2), (0, 1, 2))),
        preferred_element_type=jnp.float32)[..., 0, :]


def pool_reduce_window(x):
    r = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add,
        (1, 1, 128, 1), (1, 1, 128, 1), "VALID")
    return r / 128.0


for name, fn in [("dot(ones)", pool_dot), ("f32 mean", pool_sum),
                 ("tree sum", pool_sum_bf16_tree),
                 ("batched dot", pool_batched_dot),
                 ("reduce_window", pool_reduce_window)]:
    try:
        t = timeit(chained(lambda q, k, fn=fn: fn(q) + fn(k)), q, k)
        print(f"pool {name:14s} {t:6.2f} ms (net {t - t0:5.2f})", flush=True)
    except Exception as e:
        print(f"pool {name:14s} FAILED: {str(e)[:100]}", flush=True)

# -- C: cross attention, resident-KV single-pass kernel
kx = jax.random.normal(kk, (b, h, 512, d), jnp.bfloat16)
vx = jax.random.normal(kv, (b, h, 512, d), jnp.bfloat16)
kvx = jnp.concatenate([kx, vx], axis=-1).reshape(b * h, 512, 2 * d)


def _xkernel(q_ref, kv_ref, o_ref, *, sm_scale):
    qb = q_ref[0].astype(jnp.float32) * (sm_scale * 1.4426950408889634)
    kb = kv_ref[0, :, :d]
    vb = kv_ref[0, :, d:]
    logits = jax.lax.dot_general(
        qb.astype(kb.dtype), kb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp2(logits - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bq",))
def cross_resident(q, kvx, bq=2048):
    qf = q.reshape(b * h, s, d)
    out = pl.pallas_call(
        functools.partial(_xkernel, sm_scale=d ** -0.5),
        out_shape=jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
        grid=(b * h, s // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 512, 2 * d), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
    )(qf, kvx)
    return out.reshape(b, h, s, d)


for bq in (1024, 2048, 4096):
    try:
        t = timeit(chained(lambda q, k, bq=bq: cross_resident(q, kvx, bq=bq)),
                   q, k)
        print(f"cross resident bq={bq:5d} {t:6.2f} ms (net {t - t0:5.2f})",
              flush=True)
    except Exception as e:
        print(f"cross resident bq={bq:5d} FAILED: {str(e)[:100]}", flush=True)

# numerics check vs jnp
ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(
    jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
               kx.astype(jnp.float32)) * d ** -0.5, -1),
    vx.astype(jnp.float32))
out = cross_resident(q, kvx)
err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
print(f"cross resident max err {err:.5f}", flush=True)
