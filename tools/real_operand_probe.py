"""Feed the direct kernel the model's REAL operands (values + fresh
allocation). Distinguishes value-dependent slowdown from buffer-placement
effects: the model program measured 969ms for the same kernel that runs
567ms standalone on random operands."""
import os
import sys
import time
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from jenga_tpu.curves.blocks import build_curve_plan
from jenga_tpu.models import hyvideo as hy
from jenga_tpu.models import layers as L
from jenga_tpu.ops.block_sparse_attention import block_sparse_attention
from jenga_tpu.sparse import planner as P

cfg = dataclasses.replace(hy.HUNYUAN_VIDEO_T2V, double_blocks=1,
                          single_blocks=0)
params = hy.init_hyvideo_params(jax.random.PRNGKey(0), cfg)
plan = build_curve_plan((32, 45, 80), "gilbert", 128)
carve = hy.make_hy_carve(cfg, plan, sa_drop_rate=0.75, p_remain=0.05)
key = jax.random.PRNGKey(1)
x = jax.random.normal(key, (1, cfg.in_channels, 32, 90, 160), jnp.float32)
t = jnp.full((1,), 600.0, jnp.float32)
txt = jax.random.normal(key, (1, 256, cfg.text_states_dim), jnp.float32)
tmask = jnp.ones((1, 256), jnp.int32)
txt2 = jax.random.normal(key, (1, cfg.text_states_dim_2), jnp.float32)

b, h, d = 1, 24, 128
nb, tsb = 902, 900
s = nb * 128


@jax.jit
def model_ops(params, carve, x):
    """Reproduce exactly what the double block feeds the kernel."""
    img, txth, aux = hy.hyvideo_embed(params, cfg, x, t, txt, tmask, txt2,
                                      carve)
    p = params["double_blocks"][0]
    bb, si, dd = img.shape
    st = txth.shape[1]
    n = cfg.heads_num
    vec = aux["vec"]
    imod = L.linear(p["img_mod"], L.silu(vec)).astype(jnp.float32)[:, None]
    tmod = L.linear(p["txt_mod"], L.silu(vec)).astype(jnp.float32)[:, None]
    im = [imod[..., i * dd:(i + 1) * dd] for i in range(6)]
    tm = [tmod[..., i * dd:(i + 1) * dd] for i in range(6)]
    img_mod = L.modulate(L.layer_norm(img), shift=im[0], scale=im[1])
    qkv = L.linear(p["img_qkv"], img_mod).reshape(bb, si, 3, n, -1)
    iq = L.rms_norm(qkv[:, :, 0], p["img_q_norm"])
    ik = L.rms_norm(qkv[:, :, 1], p["img_k_norm"])
    iv = qkv[:, :, 2]
    iq = L.apply_rope(iq, aux["rope_cos"], aux["rope_sin"])
    ik = L.apply_rope(ik, aux["rope_cos"], aux["rope_sin"])
    txt_mod = L.modulate(L.layer_norm(txth), shift=tm[0], scale=tm[1])
    tqkv = L.linear(p["txt_qkv"], txt_mod).reshape(bb, st, 3, n, -1)
    tq = L.rms_norm(tqkv[:, :, 0], p["txt_q_norm"])
    tk = L.rms_norm(tqkv[:, :, 1], p["txt_k_norm"])
    tv = tqkv[:, :, 2]
    q = jnp.concatenate([iq, tq], axis=1).transpose(0, 2, 1, 3)
    k = jnp.concatenate([ik, tk], axis=1).transpose(0, 2, 1, 3)
    v = jnp.concatenate([iv, tv], axis=1).transpose(0, 2, 1, 3)
    mask = P.build_block_mask(
        q[:, :, :tsb * 128], k, top_k=225, p_remain=carve.p_remain,
        text_start_block=tsb, text_blocks=2,
        block_neighbors=jnp.asarray(carve.block_neighbors))
    full = jnp.ones((bb, n, nb - tsb, nb), bool)
    lists = P.pack_block_lists(
        *P.mask_to_block_lists(jnp.concatenate([mask, full], 2)),
        seqlens=aux["seqlens"])
    return q, k, v, lists


print("compiling model_ops (slow, full embed)...", flush=True)
qm, km, vm, lists_m = jax.block_until_ready(model_ops(params, carve, x))
print("counts:", float(lists_m[..., 0].mean()), flush=True)

# fresh copies -> fresh allocations, same values
import numpy as np
qn = jnp.asarray(np.asarray(qm))
kn = jnp.asarray(np.asarray(km))
vn = jnp.asarray(np.asarray(vm))
ln = jnp.asarray(np.asarray(lists_m))


@jax.jit
def direct(q, k, v, lists):
    return block_sparse_attention(q, k, v, lists, text_start_block=tsb)


def sync(o):
    return float(jnp.sum(o[..., ::257].astype(jnp.float32)))


def timeit(fn, *a, iters=3):
    sync(fn(*a))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


print(f"direct, model buffers {timeit(direct, qm, km, vm, lists_m):8.1f} ms",
      flush=True)
print(f"direct, fresh buffers {timeit(direct, qn, kn, vn, ln):8.1f} ms",
      flush=True)
rnd = jax.random.normal(jax.random.PRNGKey(9), qm.shape, jnp.bfloat16)
print(f"direct, rand values / model lists "
      f"{timeit(direct, rnd, rnd, rnd, ln):8.1f} ms", flush=True)
