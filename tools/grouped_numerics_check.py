import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jenga_tpu.ops.attention_ref import block_sparse_attention_reference
from jenga_tpu.ops.block_sparse_attention import (
    block_sparse_attention_grouped)
from jenga_tpu.sparse.planner import pack_block_lists_grouped
key = jax.random.PRNGKey(3)
b, h, s, d = 1, 2, 4096, 128
nb = s // 128
tsb = nb - 2
kq, kk, kv, km = jax.random.split(key, 4)
q = jax.random.normal(kq, (b, h, s, d), jnp.float32)
k = jax.random.normal(kk, (b, h, s, d), jnp.float32)
v = jax.random.normal(kv, (b, h, s, d), jnp.float32)
mask = jax.random.uniform(km, (b, h, nb, nb)) < 0.4
mask = mask.at[:, :, jnp.arange(nb), jnp.arange(nb)].set(True)
mask = mask.at[..., tsb:].set(True)
mask = mask.at[:, :, tsb:].set(True)
for qr in (2, 4, 8):
    gl = pack_block_lists_grouped(mask, qr, seqlens=s - 37)
    out = block_sparse_attention_grouped(
        q, k, v, gl, q_rows=qr, text_amp=1.25, text_start_block=tsb)
    ref = block_sparse_attention_reference(
        q, k, v, mask, text_amp=1.25, text_start_block=tsb,
        seqlen=jnp.array([s - 37]))
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"q_rows={qr} max_err={err:.2e}")
    assert err < 5e-2
print("OK")
