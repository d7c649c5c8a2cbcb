"""fp8 (e4m3) weight storage for the DiT linear layers.

Counterpart of the reference's fp8 path
(`/root/reference/hyvideo/modules/fp8_optimization.py:55-102`): weights are
stored as e4m3 with a per-tensor scale and dequantized on the fly in each
linear. On TPU this halves weight HBM traffic/footprint versus bf16
(v5e has no fp8 MXU, so matmuls still run in bf16 — the same trade the
reference's pure-torch emulation makes on GPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["quantize_linear_fp8", "quantize_tree_fp8", "E4M3_MAX"]

E4M3_MAX = 448.0


def quantize_linear_fp8(p: dict) -> dict:
    """{'w': [...], 'b'?} -> {'w8', 'scale', 'b'?} with per-tensor scaling."""
    w = jnp.asarray(p["w"], jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w)), 1e-12) / E4M3_MAX
    w8 = (w / scale).astype(jnp.float8_e4m3fn)
    out = {"w8": w8, "scale": scale.astype(jnp.float32)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def _is_linear(node) -> bool:
    return isinstance(node, dict) and "w" in node and \
        getattr(node["w"], "ndim", 0) == 2


def quantize_tree_fp8(params, min_size: int = 2 ** 16):
    """Quantize every large 2-D linear weight in a param tree to fp8.

    Small tensors (norms, modulations, embeddings) stay as-is, mirroring
    the reference's Linear-only conversion with exclusions."""
    def rec(node):
        if _is_linear(node) and node["w"].size >= min_size:
            return quantize_linear_fp8(node)
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        if isinstance(node, list):
            return [rec(v) for v in node]
        return node
    return rec(params)
