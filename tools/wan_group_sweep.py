"""KV-group width / q_rows sweep for the joint kernel at the Wan bench
shape (b=2, h=12, 256 blocks) and both stage densities — checks whether
the HY-tuned defaults (q_rows=4, group=8) hold at the smaller shape.

SWEEP_GRID / SWEEP_DROPS / SWEEP_QROWS override the geometry, e.g. the
Wan-1.3B Turbo stage-0 shape (18k tokens, 141 blocks, drop 0.75):
  SWEEP_GRID=21,22,39 SWEEP_DROPS=0.75 python tools/wan_group_sweep.py
and the 14B Turbo stage-0 shape (41.6k tokens, 325 blocks, drop 0.5):
  SWEEP_GRID=21,33,60 SWEEP_DROPS=0.5 python tools/wan_group_sweep.py"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from jenga_tpu.utils.compile_cache import enable_repo_cache

enable_repo_cache(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import jax.numpy as jnp

from jenga_tpu.curves.blocks import build_curve_plan
from jenga_tpu.ops.block_sparse_attention import (
    block_sparse_attention_grouped)
from jenga_tpu.sparse.planner import (build_block_mask, mask_to_block_lists,
                                      pack_block_lists)

b, h, d = 2, 12, 128
_grid = tuple(int(x) for x in
              os.environ.get("SWEEP_GRID", "21,30,52").split(","))
_drops = tuple(float(x) for x in
               os.environ.get("SWEEP_DROPS", "0.75,0.85").split(","))
_qrows = tuple(int(x) for x in
               os.environ.get("SWEEP_QROWS", "4,8").split(","))
plan = build_curve_plan(_grid, "sliced", 128)
s = -(-plan.seq_len // 128) * 128
nb = s // 128
key = jax.random.PRNGKey(0)
kq, kk, kv = jax.random.split(key, 3)
q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
v = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)
neighbors = jnp.asarray(plan.block_neighbors)
seqlen = jnp.full((b,), plan.seq_len, jnp.int32)
N = 8


def timeit(fn, *a, iters=4):
    float(fn(*a))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / N


print(f"grid {_grid} -> {plan.seq_len} tokens, {nb} blocks", flush=True)
for drop in _drops:
    tk = int(nb * (1.0 - drop))
    for qr in _qrows:
        m = build_block_mask(q, k, top_k=tk, p_remain=0.15,
                             text_start_block=nb, text_blocks=0,
                             block_neighbors=neighbors, sel_group=qr)
        # ceil-pad the query rows to a q_rows multiple exactly as the
        # production path (ops.grouped_attention_from_mask) does
        nb_pad = -(-nb // qr) * qr
        mp = jnp.pad(m, ((0, 0), (0, 0), (0, nb_pad - nb), (0, 0)))
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, (nb_pad - nb) * 128), (0, 0)))
        u = jnp.any(mp.reshape(b, h, nb_pad // qr, qr, nb), axis=3)
        gl = jax.block_until_ready(
            pack_block_lists(*mask_to_block_lists(u), seqlens=seqlen))
        dens = float(gl[..., 0].astype(jnp.float32).mean()) / nb
        line = f"drop {drop} q_rows={qr} (density {dens:.3f}):"
        for grp in (4, 6, 8, 12, 16):
            try:
                @jax.jit
                def f(qp, gl, qr=qr, grp=grp):
                    def body(i, c):
                        scale = (1.0 + 0.05 * i.astype(jnp.float32)) \
                            .astype(qp.dtype)
                        out = block_sparse_attention_grouped(
                            qp * scale, k, v, gl, q_rows=qr, group=grp,
                            text_start_block=nb, all_member=True)
                        return c + jnp.sum(
                            out[..., ::13].astype(jnp.float32))
                    return jax.lax.fori_loop(0, N, body, 0.0)
                tg = timeit(f, qp, gl)
                line += f"  g{grp}: {tg:6.2f} ms"
            except Exception as e:
                line += f"  g{grp}: FAIL({type(e).__name__})"
        print(line, flush=True)
