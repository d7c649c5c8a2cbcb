"""q_rows=16 vs 8 for the joint (all_member) shared-gather kernel.

In joint mode the gathered KV bytes per step are
``(nqb / q_rows) * union_len * 64KB`` — doubling the group width halves
the gather traffic at unchanged attention FLOPs, IF the union doesn't
inflate (joint selection holds union == density by construction away
from boundaries). This sweep times q_rows 8 vs 16 across KV-group
widths on a synthetic LOCAL selection (banded mask at production
density — the regime real checkpoints produce; uniform-random
selections show no row overlap and don't reward sharing).

Shapes: HY-720p-like (nb=896, h=24) and the Wan Turbo stages
(nb=256 / 144, h=12, CFG batch 2).

Measured 2026-08-20 (v5e, group-native equal-density masks):
  hy 115k:  q8g8 310.8 ms  vs q16g4 306.4 ms  (-1.4%)
  wan s1:   q8g8  48.7 ms  vs q16g4  46.8 ms  (-3.9%)
  wan s0:   q8g8  37.9 ms  vs q16g4  37.9 ms  (0%)
Verdict: the joint kernel is compute-bound (PROJECTION.md AI ~1023), so
halving the already-hidden gather bytes buys 0-4% — NOT enough to pay
the 2x coarser selection granularity (2048-token groups) whose fidelity
cost is unmeasured. q_rows=8 stays the production default; 16 remains a
supported, tested mode (tests/test_sparse_attention.py::TestGroupedQ16)
for bandwidth-poorer parts. g8/g16 at q16/q8 RESOURCE_EXHAUST VMEM as
expected (the auto-pick quarters the group width past q_rows=8).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from jenga_tpu.utils.compile_cache import enable_repo_cache

enable_repo_cache(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import jax.numpy as jnp

from jenga_tpu.ops.block_sparse_attention import block_sparse_attention_grouped
from jenga_tpu.sparse.planner import mask_to_block_lists, pack_block_lists

d = 128

CASES = [
    # label, b, h, nb, density
    ("hy 115k", 1, 24, 896, 0.27),
    ("wan s1 32k", 2, 12, 256, 0.21),
    ("wan s0 18k", 2, 12, 144, 0.31),
]


def sync(o):
    return float(jnp.sum(o[..., ::257].astype(jnp.float32)))


def timeit(fn, *a, iters=4):
    sync(fn(*a))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


for label, b, h, nb, density in CASES:
    s = nb * 128
    tsb = nb - 2
    win = int(density * nb)
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)

    for qr, groups in ((8, (8, 16)), (16, (2, 4))):
        # GROUP-NATIVE local mask: joint selection picks blocks at group
        # granularity, so union == per-row density by construction — a
        # per-row banded mask unioned over the group would overstate the
        # q16 density by ~(qr/nb) and bias the comparison (first sweep
        # revision did exactly that).
        ngr = nb // qr
        rows = jnp.arange(ngr)[:, None] * qr + qr // 2
        cols = jnp.arange(nb)[None, :]
        center = jnp.clip(rows, win // 2, tsb - win // 2)
        gmask = (jnp.abs(cols - center) <= win // 2)
        gmask = jnp.broadcast_to(gmask[None, None], (b, h, ngr, nb))
        gmask = gmask.at[..., tsb:].set(True)
        gl = jax.block_until_ready(
            pack_block_lists(*mask_to_block_lists(gmask)))
        dens = float(gl[..., 0].astype(jnp.float32).mean()) / nb
        line = f"{label} q_rows={qr} (union density {dens:.3f}):"
        for grp in groups:
            try:
                tg = timeit(jax.jit(lambda q, k, v, l, qr=qr, grp=grp:
                                    block_sparse_attention_grouped(
                                        q, k, v, l, q_rows=qr, group=grp,
                                        text_start_block=tsb,
                                        all_member=True)), q, k, v, gl)
                line += f"  g{grp}: {tg:6.1f} ms"
            except Exception as e:
                line += f"  g{grp}: FAIL({type(e).__name__})"
        print(line, flush=True)
