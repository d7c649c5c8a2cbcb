"""Prefix-chain timing of the carved HY double block at the 720p shape.

Each stage variant runs the real `_double_block` code up to a cut point;
stage-to-stage deltas attribute on-chip time without device->host transfer
artifacts (N iterations inside one jit, scalar output).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp

from jenga_tpu.curves.blocks import build_curve_plan
from jenga_tpu.models import layers as L
from jenga_tpu.models import hyvideo as hy

cfg = hy.HUNYUAN_VIDEO_T2V
cfg1 = dataclasses.replace(cfg, double_blocks=1, single_blocks=1)
params = hy.init_hyvideo_params(jax.random.PRNGKey(0), cfg1)
p = params["double_blocks"][0]

s = 115200
txt_len = 256
key = jax.random.PRNGKey(1)
img0 = jax.random.normal(key, (1, s, cfg.hidden_size), jnp.bfloat16)
txt0 = jax.random.normal(jax.random.fold_in(key, 1),
                         (1, txt_len, cfg.hidden_size), jnp.bfloat16)
vec = jax.random.normal(jax.random.fold_in(key, 2),
                        (1, cfg.hidden_size), jnp.float32)
plan = build_curve_plan((32, 45, 80), "gilbert", 128)
carve = hy.make_hy_carve(cfg, plan, sa_drop_rate=0.75, p_remain=0.05)
rope_cos = jnp.asarray(carve.rope_cos)
rope_sin = jnp.asarray(carve.rope_sin)
seqlen = jnp.full((1,), s + txt_len, jnp.int32)

N = 8


def stage_fn(upto):
    n, hd = cfg.heads_num, cfg.head_dim

    def run(p, img, txt, rope_cos, rope_sin):
        b, si, d = img.shape
        st = txt.shape[1]
        imod = L.linear(p["img_mod"], L.silu(vec)).astype(
            jnp.float32)[:, None]
        tmod = L.linear(p["txt_mod"], L.silu(vec)).astype(
            jnp.float32)[:, None]
        im = [imod[..., i * d:(i + 1) * d] for i in range(6)]
        tm = [tmod[..., i * d:(i + 1) * d] for i in range(6)]
        img_mod = L.modulate(L.layer_norm(img), shift=im[0], scale=im[1])
        if upto == "mod1":
            return img_mod
        img_qkv = L.linear(p["img_qkv"], img_mod).reshape(b, si, 3, n, hd)
        img_q = L.rms_norm(img_qkv[:, :, 0], p["img_q_norm"])
        img_k = L.rms_norm(img_qkv[:, :, 1], p["img_k_norm"])
        img_v = img_qkv[:, :, 2]
        if upto == "qkvnorm":
            return img_q + img_k + img_v
        img_q = L.apply_rope(img_q, rope_cos, rope_sin)
        img_k = L.apply_rope(img_k, rope_cos, rope_sin)
        if upto == "rope":
            return img_q + img_k + img_v
        txt_mod = L.modulate(L.layer_norm(txt), shift=tm[0], scale=tm[1])
        txt_qkv = L.linear(p["txt_qkv"], txt_mod).reshape(b, st, 3, n, hd)
        txt_q = L.rms_norm(txt_qkv[:, :, 0], p["txt_q_norm"])
        txt_k = L.rms_norm(txt_qkv[:, :, 1], p["txt_k_norm"])
        txt_v = txt_qkv[:, :, 2]
        q = jnp.concatenate([img_q, txt_q], axis=1)
        k = jnp.concatenate([img_k, txt_k], axis=1)
        v = jnp.concatenate([img_v, txt_v], axis=1)
        if upto == "concat":
            return q + k + v
        if upto in ("attn_mask", "attn_lists", "attn_kernel"):
            from jenga_tpu.ops.block_sparse_attention import (
                block_sparse_attention)
            from jenga_tpu.sparse.planner import (
                build_block_mask, mask_to_block_lists, pack_block_lists)
            s_pad = -(-(si + st) // 128) * 128
            pad = s_pad - (si + st)
            qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
            kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
            vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
            nbk = s_pad // 128
            tsb = nbk - carve.txt_block_num
            topk = int((1.0 - carve.sa_drop_rate) * (si // 128))
            qt = qp.transpose(0, 2, 1, 3)
            kt = kp.transpose(0, 2, 1, 3)
            vt = vp.transpose(0, 2, 1, 3)
            mask = build_block_mask(
                qt[:, :, :tsb * 128], kt, top_k=topk,
                p_remain=carve.p_remain, text_start_block=tsb,
                text_blocks=carve.txt_block_num,
                block_neighbors=jnp.asarray(carve.block_neighbors))
            if upto == "attn_mask":
                return mask.astype(jnp.bfloat16).sum(2)
            full = jnp.ones((b, n, nbk - tsb, nbk), bool)
            mask = jnp.concatenate([mask, full], axis=2)
            lists = pack_block_lists(*mask_to_block_lists(mask),
                                     seqlens=seqlen)
            if upto == "attn_lists":
                return lists.astype(jnp.bfloat16)[..., :128]
            out = block_sparse_attention(qt, kt, vt, lists,
                                         text_start_block=tsb)
            return out.transpose(0, 2, 1, 3)[:, :si + st].reshape(
                b, si + st, n * hd)
        attn = hy._joint_attention(q, k, v, cfg, carve, si, seqlen)
        if upto == "attn":
            return attn
        img_o = img + (L.linear(p["img_proj"], attn[:, :si]).astype(
            jnp.float32) * im[2]).astype(img.dtype)
        if upto == "proj":
            return img_o
        y = L.modulate(L.layer_norm(img_o), shift=im[3], scale=im[4])
        y = L.linear(p["img_mlp"]["fc2"], L.gelu_tanh(
            L.linear(p["img_mlp"]["fc1"], y)))
        img_o = img_o + (y.astype(jnp.float32) * im[5]).astype(img.dtype)
        if upto == "mlp":
            return img_o
        txt_o = txt + (L.linear(p["txt_proj"], attn[:, si:]).astype(
            jnp.float32) * tm[2]).astype(txt.dtype)
        y = L.modulate(L.layer_norm(txt_o), shift=tm[3], scale=tm[4])
        y = L.linear(p["txt_mlp"]["fc2"], L.gelu_tanh(
            L.linear(p["txt_mlp"]["fc1"], y)))
        txt_o = txt_o + (y.astype(jnp.float32) * tm[5]).astype(txt.dtype)
        return img_o + jnp.pad(txt_o, ((0, 0), (0, si - st), (0, 0)))

    @jax.jit
    def chain(p, img, txt, rope_cos, rope_sin):
        def body(i, acc):
            out = run(p, img * (1 + 1e-4 * i.astype(jnp.bfloat16)), txt,
                      rope_cos, rope_sin)
            return acc + jnp.sum(out[:, ::997].astype(jnp.float32))
        return jax.lax.fori_loop(0, N, body, jnp.float32(0))

    return chain


def timeit(fn, iters=3):
    float(fn(p, img0, txt0, rope_cos, rope_sin))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(p, img0, txt0, rope_cos, rope_sin))
        best = min(best, time.perf_counter() - t0)
    return best / N * 1e3


import sys as _sys
stages = (_sys.argv[1].split(",") if len(_sys.argv) > 1 else
          ["concat", "attn_mask", "attn_lists", "attn_kernel", "attn"])
prev = 0.0
for st_name in stages:
    t = timeit(stage_fn(st_name))
    print(f"{st_name:8s} {t:8.1f} ms  (+{t - prev:7.1f})")
    prev = t
