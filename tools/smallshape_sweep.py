"""Joint-kernel (q_rows, KV-group) sweep at the SMALL stage shapes.

VERDICT r4 weak-4: the gather-group auto-pick keys off head dim, q_rows
and dtype but never off the sequence/blocks shape, so the small ProRes
stages (Wan Turbo stage 0 nb=144, HY 3Stage stage 0 nkb=222) inherit the
flagship (nb~898) tuning — and the Wan Turbo artifact's measured
``kernel_vs_ideal_s`` gap (8.5% of the stage-0 step) lives exactly
there. This sweep times the production joint all-member kernel across
q_rows x group at each affected shape with a group-native banded mask at
the realized density (same construction as tools/q16_sweep.py — joint
selection holds union == density by construction, so a per-row mask
unioned over the group would bias wide-q_rows arms).

Shapes (b, h from the production benches; densities from the committed
artifacts):
  wan s0   nb=144, CFG b=2, h=12, density 0.30  (BENCH_WAN_TURBO.json)
  wan s1   nb=256, CFG b=2, h=12, density 0.21
  hy3s s0  nkb=222, b=1, h=24, density ~0.30, text_amp, 2 text blocks
           (BENCH_PRORES.json 3stage s0: rate 0.5 -> 28160 img tokens)
  hy3s s1  nkb=497, b=1, h=24, density ~0.22   (rate 0.75)
  hy full  nkb=898, b=1, h=24, density 0.27    (flagship sanity row)

Verdict feeds utils/device.py's shape-aware pick; the in-model
confirmation runs through tools/wan_trunk_ablate.py / bench_prores.py
with JENGA_GATHER_GROUP before any artifact is regenerated.

Measured 2026-08-20 (v5e, min of 5, ms; RE = RESOURCE_EXHAUSTED VMEM,
expected at wide q_rows x group; hy densities vary per q_rows because
text-row groups go full — compare within a row only):
  wan s0 144   q4:  g4 34.1  g8 35.5  g16 37.4
               q8:  g2 35.2  g4 32.5  g8 34.4  g16 RE
               q16: g2 36.1  g4 33.6  g8 RE
  wan s1 256   q4:  g4 53.9  g8 50.9  g16 57.6
               q8:  g2 48.6  g4 46.3  g8 43.6  g16 RE
               q16: g2 54.8  g4 50.3  g8 RE
  hy3s s0 222  q4:  g4 58.6  g8 53.8  g16 57.8
               q8:  g2 60.1  g4 52.9  g8 54.1  g16 RE
               q16: g2 55.7  g4 51.9  g8 RE
  hy3s s1 497  q4:  g4 120.0 g8 114.8 g16 113.0
               q8:  g2 140.5 g4 117.2 g8 119.3  g16 RE
               q16: g2 134.6 g4 121.7 g8 RE
  hy full 898  q4:  g4 357.6 g8 337.1 g16 376.2
               q8:  g2 401.9 g4 330.9 g8 315.0  g16 RE
               q16: g2 375.4 g4 327.9 g8 RE

VERDICT on the harness numbers: they did NOT survive in-model A/B. The
apparent g4 win at nb=144 (-5.5% here) measured NEUTRAL inside the real
model (tools/wan_trunk_ablate.py with JENGA_GATHER_GROUP=4 vs 8: carved
step 1006.1 vs 1010.0 ms, within shared-chip noise). Two harness
artifacts explain it: (1) the banded synthetic mask gathers CONTIGUOUS
HBM blocks, rewarding narrow groups in a way real scattered selections
don't; (2) this harness's per-call sync pays the remote-relay round
trip, inflating absolute times ~3x (33 ms/call here vs ~11 ms/layer
in-model) and distorting small deltas. The production pick therefore
stays shape-independent (utils/device.py gather_group_pick, which
documents both measurements), the flagship g8 is confirmed optimal at
its own shape, and the residual small-shape kernel-vs-ideal gap (~5% of
the Wan stage-0 step) is a measured floor: none of the 10 swept
(q_rows, group) combinations per shape recovers it. Same lesson as
ARCHITECTURE.md's round-4 methodology note — trust whole-model A/B,
not microbenches.
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
    # label, b, h, nkb, text_blocks, density, text_amp
    ("wan s0 144", 2, 12, 144, 0, 0.30, 0.0),
    ("wan s1 256", 2, 12, 256, 0, 0.21, 0.0),
    ("hy3s s0 222", 1, 24, 222, 2, 0.30, 1.0),
    ("hy3s s1 497", 1, 24, 497, 2, 0.22, 0.0),
    ("hy full 898", 1, 24, 898, 2, 0.27, 0.0),
]

SWEEP = [(4, (4, 8, 16)), (8, (2, 4, 8, 16)), (16, (2, 4, 8))]


def sync(o):
    return float(jnp.sum(o[..., ::257].astype(jnp.float32)))


def timeit(fn, *a, iters=5):
    sync(fn(*a))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    only = os.environ.get("SWEEP_ONLY")
    for label, b, h, nb, tb, density, amp in CASES:
        if only and only not in label:
            continue
        s = nb * 128
        tsb = nb - tb
        win = int(density * nb)
        key = jax.random.PRNGKey(0)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
        v = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)

        for qr, groups in SWEEP:
            # group-native banded mask: one selection per q_rows-group so
            # union == density (see module docstring / q16_sweep.py).
            # nqb pads up to a q_rows multiple exactly like
            # grouped_attention_from_mask (the HY shapes aren't divisible);
            # padded query rows get a 1-block selection.
            nb_pad = -(-nb // qr) * qr
            ngr = nb_pad // qr
            qp = q if nb_pad == nb else jnp.pad(
                q, ((0, 0), (0, 0), (0, (nb_pad - nb) * 128), (0, 0)))
            rows = jnp.arange(ngr)[:, None] * qr + qr // 2
            cols = jnp.arange(nb)[None, :]
            center = jnp.clip(rows, win // 2, max(tsb - win // 2, 0))
            gmask = (jnp.abs(cols - center) <= win // 2)
            gmask = jnp.broadcast_to(gmask[None, None],
                                     (b, h, ngr, nb)).copy()
            if tb:
                # every group selects the text blocks; groups containing
                # text ROWS select everything (all_member union semantics:
                # text rows attend all blocks in-model)
                gmask = gmask.at[..., tsb:].set(True)
                gmask = gmask.at[:, :, tsb // qr:, :].set(True)
            if nb_pad != nb:     # all-pad groups: minimal valid selection
                full_groups = -(-nb // qr)
                gmask = gmask.at[:, :, full_groups:, :].set(False)
                gmask = gmask.at[:, :, full_groups:, 0].set(True)
            gl = jax.block_until_ready(
                pack_block_lists(*mask_to_block_lists(gmask)))
            dens = float(gl[..., 0].astype(jnp.float32).mean()) / nb
            line = f"{label} q{qr} (density {dens:.3f}):"
            for grp in groups:
                try:
                    tg = timeit(jax.jit(
                        lambda q, k, v, l, qr=qr, grp=grp:
                        block_sparse_attention_grouped(
                            q, k, v, l, q_rows=qr, group=grp,
                            text_amp=amp, text_start_block=tsb,
                            all_member=True)), qp, k, v, gl)
                    line += f"  g{grp}: {tg:6.1f}"
                except Exception as e:
                    line += f"  g{grp}: FAIL({type(e).__name__})"
            print(line, flush=True)


if __name__ == "__main__":
    main()
