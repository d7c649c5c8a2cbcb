"""Decompose one carved Wan block's on-chip time into its pieces."""
import os, sys, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from jenga_tpu.curves.blocks import build_curve_plan
from jenga_tpu.models import layers as L
from jenga_tpu.models.wan import (
    WAN_T2V_1_3B, init_wan_params, make_wan_carve, wan_rope_tables,
    _block, _self_attention, _cross_attention)

cfg = dataclasses.replace(WAN_T2V_1_3B, num_layers=1)
plan = build_curve_plan((21, 30, 52), "sliced", 128)
s = -(-plan.seq_len // 128) * 128
b, d = 2, cfg.dim
params = init_wan_params(jax.random.PRNGKey(0), cfg)
p = params["blocks"][0]
key = jax.random.PRNGKey(1)
x = jax.random.normal(key, (b, s, d), jnp.bfloat16)
e6 = jax.random.normal(key, (b, 6, d), jnp.float32)
ctx = jax.random.normal(key, (b, cfg.text_len, d), jnp.bfloat16)
carve = make_wan_carve(cfg, plan, sa_drop_rate=0.75, p_remain=0.15)
rope_cos = jnp.asarray(carve.rope_cos)
rope_sin = jnp.asarray(carve.rope_sin)

N = 20
def chain(f, *args):
    @jax.jit
    def g(*args):
        def body(i, acc):
            out = f(args[0] * (1 + 0.0005 * i.astype(args[0].dtype)),
                    *args[1:])
            return acc + jnp.sum(out[:, ::1024].astype(jnp.float32))
        return jax.lax.fori_loop(0, N, body, jnp.float32(0))
    float(g(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(g(*args))
        best = min(best, time.perf_counter() - t0)
    return best / N * 1e3

t_blk = chain(lambda x: _block(p, x, e6, ctx, cfg, carve, rope_cos,
                               rope_sin, 0), x)
print(f"full block:           {t_blk:7.2f} ms")

t_sa = chain(lambda x: _self_attention(p["self_attn"], x, cfg, carve,
                                       rope_cos, rope_sin, None, None), x)
print(f"self-attn (qkvo+rope+planner+kernel): {t_sa:7.2f} ms")

t_ca = chain(lambda x: _cross_attention(p["cross_attn"], x, ctx, cfg, 0), x)
print(f"cross-attn:           {t_ca:7.2f} ms")

def ffn(x):
    return L.linear(p["ffn"]["fc2"], L.gelu_tanh(L.linear(p["ffn"]["fc1"], x)))
print(f"ffn:                  {chain(ffn, x):7.2f} ms")

def mods(x):
    e = (p["modulation"][None].astype(jnp.float32) + e6)
    e0, e1, e2, e3, e4, e5 = [e[:, i:i+1] for i in range(6)]
    y = L.modulate(L.layer_norm(x, eps=cfg.eps), shift=e0, scale=e1)
    x = (x.astype(jnp.float32) + y.astype(jnp.float32)
         * e2.astype(jnp.float32)).astype(x.dtype)
    y = L.layer_norm(x, p["norm3"]["w"], p["norm3"]["b"], cfg.eps)
    y = L.modulate(L.layer_norm(y, eps=cfg.eps), shift=e3, scale=e4)
    return (x.astype(jnp.float32) + y.astype(jnp.float32)
            * e5.astype(jnp.float32)).astype(x.dtype)
print(f"norms+modulation:     {chain(mods, x):7.2f} ms")

def qkvo(x):
    q = L.rms_norm(L.linear(p["self_attn"]["q"], x),
                   p["self_attn"]["norm_q"], cfg.eps)
    k = L.rms_norm(L.linear(p["self_attn"]["k"], x),
                   p["self_attn"]["norm_k"], cfg.eps)
    v = L.linear(p["self_attn"]["v"], x)
    return L.linear(p["self_attn"]["o"], q + k + v)
print(f"self qkvo proj+rmsnorm: {chain(qkvo, x):7.2f} ms")

def rope(x):
    q = x.reshape(b, s, cfg.num_heads, cfg.head_dim)
    return L.apply_rope(q, rope_cos, rope_sin).reshape(b, s, d)
print(f"rope apply (x1):      {chain(rope, x):7.2f} ms")
