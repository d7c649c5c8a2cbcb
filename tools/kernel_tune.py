"""On-TPU kernel validation + group-size sweep after mask/planner edits."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from jenga_tpu.curves.blocks import build_curve_plan
from jenga_tpu.ops.attention_ref import block_sparse_attention_reference
from jenga_tpu.ops.block_sparse_attention import block_sparse_attention
from jenga_tpu.sparse import planner as P

# numerics at a text_amp + validity-masked shape
key = jax.random.PRNGKey(7)
b, h, s, d = 1, 2, 2048, 128
nb = s // 128
kq, kk, kv, km = jax.random.split(key, 4)
q = jax.random.normal(kq, (b, h, s, d), jnp.float32)
k = jax.random.normal(kk, (b, h, s, d), jnp.float32)
v = jax.random.normal(kv, (b, h, s, d), jnp.float32)
mask = jax.random.uniform(km, (b, h, nb, nb)) < 0.4
mask = mask.at[:, :, jnp.arange(nb), jnp.arange(nb)].set(True)
mask = mask.at[..., nb - 2:].set(True)  # text blocks always on
lists = P.pack_block_lists(*P.mask_to_block_lists(mask), seqlens=s - 37)
out = block_sparse_attention(q, k, v, lists, text_amp=1.25,
                             text_start_block=nb - 2)
ref = block_sparse_attention_reference(
    q, k, v, mask, text_amp=1.25, text_start_block=nb - 2,
    seqlen=jnp.array([s - 37]))
err = float(jnp.max(jnp.abs(out - ref)))
print(f"numerics (text_amp+seqlen): max err {err:.5f}")
assert err < 5e-2

# group sweep at the bench shape / density
plan = build_curve_plan((21, 30, 52), "sliced", 128)
s = -(-plan.seq_len // 128) * 128
b, h, nb = 2, 12, s // 128
kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
v = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)
neighbors = jnp.asarray(plan.block_neighbors)[:nb, :nb].astype(bool)
_, lists = jax.jit(lambda q, k: P.plan_block_sparsity(
    q, k, neighbors, top_k=int(0.25 * nb), p_remain=0.15,
    text_start_block=nb, text_blocks=0))(q, k)

def sync(x): return float(jnp.sum(x[:, :, ::512].astype(jnp.float32)))

N = 20
for grp in (8, 16, 24, 32):
    @jax.jit
    def kn(q, k, v, lists):
        def body(i, acc):
            o = block_sparse_attention(
                q * (1 + 0.001 * i.astype(jnp.bfloat16)), k, v, lists,
                group=grp)
            return acc + jnp.sum(o[:, :, ::1024].astype(jnp.float32))
        return jax.lax.fori_loop(0, N, body, jnp.float32(0))
    float(kn(q, k, v, lists)); best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(kn(q, k, v, lists))
        best = min(best, time.perf_counter() - t0)
    print(f"group={grp:2d}: {best/N*1e3:7.2f} ms/layer (29% density)")

# planner chained after sort-based rewrite
top_k = int(0.25 * nb)
@jax.jit
def pn(q, k):
    def body(i, c):
        _, lists = P.plan_block_sparsity(
            q * (1 + 0.001 * i.astype(jnp.bfloat16)), k, neighbors,
            top_k=top_k, p_remain=0.15, text_start_block=nb, text_blocks=0)
        return c + jnp.sum(lists[..., 0])
    return jax.lax.fori_loop(0, N, body, jnp.int32(0))
float(pn(q, k)); best = float("inf")
for _ in range(4):
    t0 = time.perf_counter(); float(pn(q, k))
    best = min(best, time.perf_counter() - t0)
print(f"planner:  {best/N*1e3:7.2f} ms/layer (sort-based)")
