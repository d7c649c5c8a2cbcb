"""Planner cost at the HY-720p bench shape (24 heads, 902 blocks), with
per-stage deltas and both packings (per-row lists vs grouped q4 union).
Chained iterations inside one jit amortize the relay RTT."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from jenga_tpu.curves.blocks import build_curve_plan
from jenga_tpu.sparse import planner as P

plan = build_curve_plan((32, 45, 80), "gilbert", 128)
s_img = plan.seq_len            # 115200
nqb = s_img // 128              # 900 video query blocks
nkb = nqb + 2                   # + 2 text blocks
s = nkb * 128
b, h, d = 1, 24, 128
kq, kk = jax.random.split(jax.random.PRNGKey(0))
q = jax.random.normal(kq, (b, h, s_img, d), jnp.bfloat16)
k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
neighbors = jnp.asarray(plan.block_neighbors).astype(bool)
top_k = int(0.25 * nqb)


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def timeit(fn, *a, iters=5):
    out = fn(*a)
    sync(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*a)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


N = 10


def chained(stage):
    def once(q, k):
        qp = q.reshape(b, h, nqb, 128, d).mean(3)
        kp = k.reshape(b, h, nkb, 128, d).mean(3)
        if stage == "pool":
            return qp
        sc = jnp.einsum("bhqd,bhkd->bhqk", qp, kp,
                        preferred_element_type=jnp.float32) * d ** -0.5
        if stage == "scores":
            return sc
        video = sc[..., :nqb]
        pr = jax.nn.softmax(video, -1)
        sp = jnp.sort(pr, -1, descending=True)
        if stage == "sort":
            return sp
        cs = jnp.cumsum(sp, -1)
        needed = jnp.clip(jnp.sum(cs <= 0.05, -1) + 1, top_k, nqb)
        kth = jnp.take_along_axis(sp, needed[..., None] - 1, axis=-1)
        vm = pr >= kth
        m = vm | neighbors[None, None]
        mask = jnp.zeros((b, h, nqb, nkb), bool).at[..., :nqb].set(m)
        mask = mask.at[..., nqb:].set(True)
        if stage == "mask":
            return mask
        if stage == "pack":
            return P.pack_block_lists(*P.mask_to_block_lists(mask),
                                      seqlens=s)
        if stage == "gpack":
            # 900 video rows divide 4 exactly; the real path ceil-pads
            return P.pack_block_lists_grouped(mask, 4, seqlens=s)
        raise ValueError(stage)

    def once_joint(q, k, g=4):
        # the joint-selection planner: selection at group granularity
        # (nqb/g rows) + plain pack of the group mask — the production
        # q_rows=4 path
        m = P.build_block_mask(
            q, k, top_k=top_k, p_remain=0.05, text_start_block=nqb,
            text_blocks=2, block_neighbors=neighbors, sel_group=g)
        full = jnp.ones((b, h, 2, nkb), bool)
        m = jnp.concatenate([m, full], axis=2)
        mp = jnp.pad(m, ((0, 0), (0, 0), (0, 2), (0, 0)))
        union = jnp.any(mp.reshape(b, h, (nqb + 4) // g, g, nkb), axis=3)
        return P.pack_block_lists(*P.mask_to_block_lists(union), seqlens=s)

    @jax.jit
    def f(q, k):
        fn = once_joint if stage == "jointsel" else once

        def body(i, c):
            # 1 + 0.05*i survives bf16 rounding (a 0.001 step rounds to
            # exactly 1.0 -> XLA hoists the body as loop-invariant)
            scale = (1.0 + 0.05 * i.astype(jnp.float32)).astype(q.dtype)
            out = fn(q * scale, k)
            # strided (not col-0) reduction: col-0-only let XLA dead-code
            # eliminate the id sort in the pack stages entirely
            return c + jnp.sum(out[..., ::13].astype(jnp.float32))
        return jax.lax.fori_loop(0, N, body, jnp.float32(0))

    return f


prev = 0.0
for st in ["pool", "scores", "sort", "mask", "pack", "gpack", "jointsel"]:
    t = timeit(chained(st), q, k) / N
    d_ = t - prev if st != "gpack" else t - prev
    print(f"{st:8s} {t:8.2f} ms/layer  (delta {t - prev:+7.2f})", flush=True)
    if st != "pack":
        prev = t
