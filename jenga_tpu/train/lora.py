"""LoRA adapters over jenga_tpu parameter trees.

Counterpart of the reference's kohya/peft LoRA machinery
(`/root/reference/hyvideo_i2v/utils/train_utils.py:24-100`,
``lora_utils.py``): low-rank deltas on the DiT's 2-D linear weights,
trained with optax while the base tree stays frozen. ``apply_lora``
produces the effective weights functionally (no module surgery), which is
the JAX-native equivalent of peft's wrapped Linear modules; exporting back
to the reference's kohya safetensors layout is supported for interchange.
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["init_lora", "apply_lora", "lora_param_count",
           "export_kohya", "DEFAULT_TARGETS"]

# reference trains LoRA on the attention + mlp linears of both block kinds
# (`train_utils.py:37-50`'s key remaps enumerate exactly these)
DEFAULT_TARGETS = (
    r"double_blocks/\d+/(img_qkv|txt_qkv|img_proj|txt_proj|img_mlp/fc\d|"
    r"txt_mlp/fc\d)",
    r"single_blocks/\d+/(linear1|linear2)",
    # Wan DiT
    r"blocks/\d+/(self_attn|cross_attn)/(q|k|v|o)",
    r"blocks/\d+/ffn/fc\d",
)


def _paths_of(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _paths_of(v, prefix + (str(k),))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _paths_of(v, prefix + (str(i),))
    else:
        yield "/".join(prefix), tree


def _match(path: str, targets) -> bool:
    return any(re.search(t, path) for t in targets)


def init_lora(key, params, rank: int = 16, targets=DEFAULT_TARGETS,
              dtype=jnp.float32) -> dict:
    """Build {path: {"a": [r, in], "b": [out, r]}} for every targeted 2-D
    linear weight; ``a`` is gaussian, ``b`` zero (standard LoRA init, so
    the initial delta is exactly zero)."""
    lora = {}
    for path, leaf in _paths_of(params):
        if not path.endswith("/w") or getattr(leaf, "ndim", 0) != 2:
            continue
        base = path[:-2]
        if not _match(base, targets):
            continue
        d_in, d_out = leaf.shape
        key, k = jax.random.split(key)
        lora[base] = {
            "a": jax.random.normal(k, (rank, d_in), dtype) * (1.0 / rank),
            "b": jnp.zeros((d_out, rank), dtype),
        }
    return lora


def _set_path(tree, parts, value):
    head = parts[0]
    if isinstance(tree, dict):
        sub = tree[head]
        if len(parts) == 1:
            out = dict(tree)
            out[head] = value
            return out
        out = dict(tree)
        out[head] = _set_path(sub, parts[1:], value)
        return out
    idx = int(head)
    sub = tree[idx]
    out = list(tree)
    out[idx] = value if len(parts) == 1 else _set_path(sub, parts[1:], value)
    return out


def _get_path(tree, parts):
    for p in parts:
        tree = tree[int(p)] if isinstance(tree, (list, tuple)) else tree[p]
    return tree


def apply_lora(params, lora: dict, scale: float = 1.0):
    """Return a new tree with ``W <- W + scale * (b @ a).T`` per adapter
    (our linears are [in, out]; a@b deltas are computed in f32 then cast
    to the base dtype)."""
    out = params
    for base, ab in lora.items():
        parts = base.split("/") + ["w"]
        w = _get_path(out, parts)
        delta = (ab["b"].astype(jnp.float32)
                 @ ab["a"].astype(jnp.float32)).T * scale
        out = _set_path(out, parts, (w.astype(jnp.float32) + delta)
                        .astype(w.dtype))
    return out


def lora_param_count(lora: dict) -> int:
    return sum(int(np.prod(v["a"].shape)) + int(np.prod(v["b"].shape))
               for v in lora.values())


def export_kohya(lora: dict, prefix: str = "Hunyuan_video_I2V") -> dict:
    """Export to the reference's kohya safetensors key layout
    (``<prefix>_lora_<module path with underscores>.lora_down/up.weight``)
    so adapters trained here load in the reference (and vice versa through
    ``jenga_tpu.convert.merge_lora``)."""
    out = {}
    for base, ab in lora.items():
        name = f"{prefix}_lora_" + base.replace("/", "_") \
            .replace("_img_mlp_fc", "_img_mlp_fc") \
            .replace(".", "_")
        rank = ab["a"].shape[0]
        out[f"{name}.lora_down.weight"] = np.asarray(ab["a"], np.float32)
        out[f"{name}.lora_up.weight"] = np.asarray(ab["b"], np.float32)
        out[f"{name}.alpha"] = np.float32(rank)
    return out
