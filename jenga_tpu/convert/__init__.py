"""Checkpoint converters: reference torch checkpoints -> jenga_tpu pytrees.

Covers the weight formats the reference loads
(`/root/reference/hyvideo/inference.py:288-364`: bare
``pytorch_model_*.pt`` and deepspeed ``*_model_states.pt`` with
``module``/``ema`` keys; `/root/reference/wan/text2video.py:85`: diffusers
sharded safetensors; VAE ``pytorch_model.pt``). Converted trees can be
saved/loaded with orbax or ``numpy.savez``.

Conventions: torch ``nn.Linear`` stores ``[out, in]`` -> transposed to our
``[in, out]``; conv kernels keep torch ``[O, I, kt, kh, kw]``; strided
patch-embedding convs become matmul weights (kernel flattened in
``(C, pt, ph, pw)`` order, matching ``layers.patchify_3d``).
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["load_torch_state_dict", "convert_wan_dit", "convert_hyvideo_dit",
           "convert_hyvae", "convert_wanvae", "save_params", "load_params",
           "load_safetensors_state_dict", "load_fp8_state_dict",
           "merge_lora", "save_params_orbax", "load_params_orbax"]


def _np(t):
    import torch
    if isinstance(t, torch.Tensor):
        return t.detach().to(torch.float32).cpu().numpy()
    return np.asarray(t)


def load_torch_state_dict(path: str) -> dict:
    """Load a torch checkpoint file, unwrapping deepspeed containers
    (reference ``Inference.load_state_dict``,
    `/root/reference/hyvideo/inference.py:288-364`)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    for key in ("module", "ema", "state_dict", "model"):
        if isinstance(ckpt, dict) and key in ckpt \
                and isinstance(ckpt[key], dict):
            ckpt = ckpt[key]
            break
    return ckpt


def _lin(sd, name, dtype=np.float32):
    p = {"w": _np(sd[f"{name}.weight"]).T.astype(dtype)}
    if f"{name}.bias" in sd:
        p["b"] = _np(sd[f"{name}.bias"]).astype(dtype)
    return p


def _norm(sd, name):
    return {"w": _np(sd[f"{name}.weight"]).astype(np.float32),
            "b": _np(sd[f"{name}.bias"]).astype(np.float32)}


def _patch_conv(sd, name, dtype=np.float32):
    """Conv3d(kernel==stride) -> matmul weight [C*pt*ph*pw, dim]."""
    w = _np(sd[f"{name}.weight"])                 # [dim, C, pt, ph, pw]
    p = {"w": w.reshape(w.shape[0], -1).T.astype(dtype),
         "b": _np(sd[f"{name}.bias"]).astype(dtype)}
    return p


def convert_wan_dit(sd: dict, cfg, dtype=np.float32) -> dict:
    """WanModel state dict -> ``jenga_tpu.models.wan`` param tree
    (reference module layout `/root/reference/wan/modules/model_mul.py:
    394-654`)."""
    def attn(prefix, img_branch=False):
        p = {
            "q": _lin(sd, f"{prefix}.q", dtype),
            "k": _lin(sd, f"{prefix}.k", dtype),
            "v": _lin(sd, f"{prefix}.v", dtype),
            "o": _lin(sd, f"{prefix}.o", dtype),
            "norm_q": _np(sd[f"{prefix}.norm_q.weight"]).astype(np.float32),
            "norm_k": _np(sd[f"{prefix}.norm_k.weight"]).astype(np.float32),
        }
        if img_branch and f"{prefix}.k_img.weight" in sd:
            p["k_img"] = _lin(sd, f"{prefix}.k_img", dtype)
            p["v_img"] = _lin(sd, f"{prefix}.v_img", dtype)
            p["norm_k_img"] = _np(
                sd[f"{prefix}.norm_k_img.weight"]).astype(np.float32)
        return p

    blocks = []
    for i in range(cfg.num_layers):
        pre = f"blocks.{i}"
        blocks.append({
            "self_attn": attn(f"{pre}.self_attn"),
            "cross_attn": attn(f"{pre}.cross_attn", img_branch=True),
            "norm3": (_norm(sd, f"{pre}.norm3")
                      if f"{pre}.norm3.weight" in sd else
                      {"w": np.ones(cfg.dim, np.float32),
                       "b": np.zeros(cfg.dim, np.float32)}),
            "ffn": {"fc1": _lin(sd, f"{pre}.ffn.0", dtype),
                    "fc2": _lin(sd, f"{pre}.ffn.2", dtype)},
            "modulation": _np(sd[f"{pre}.modulation"])[0].astype(np.float32),
        })

    params = {
        "patch_embedding": _patch_conv(sd, "patch_embedding", dtype),
        "text_embedding": {"fc1": _lin(sd, "text_embedding.0", dtype),
                           "fc2": _lin(sd, "text_embedding.2", dtype)},
        "time_embedding": {"fc1": _lin(sd, "time_embedding.0"),
                           "fc2": _lin(sd, "time_embedding.2")},
        "time_projection": _lin(sd, "time_projection.1"),
        "blocks": blocks,
        "head": {
            "norm": None,
            "linear": _lin(sd, "head.head", dtype),
            "modulation": _np(sd["head.modulation"])[0].astype(np.float32),
        },
    }
    if "img_emb.proj.0.weight" in sd:
        params["img_emb"] = {
            "norm_in": _norm(sd, "img_emb.proj.0"),
            "fc1": _lin(sd, "img_emb.proj.1", dtype),
            "fc2": _lin(sd, "img_emb.proj.3", dtype),
            "norm_out": _norm(sd, "img_emb.proj.4"),
        }
    return params


def convert_hyvideo_dit(sd: dict, cfg, dtype=np.float32) -> dict:
    """HYVideoDiffusionTransformer state dict -> param tree (reference
    layout `/root/reference/hyvideo/modules/
    models_mul_block_gc_ha_multigpu.py:503-845`)."""
    def rms(name):
        return _np(sd[f"{name}.weight"]).astype(np.float32)

    double = []
    for i in range(cfg.double_blocks):
        pre = f"double_blocks.{i}"
        double.append({
            "img_mod": _lin(sd, f"{pre}.img_mod.linear"),
            "txt_mod": _lin(sd, f"{pre}.txt_mod.linear"),
            "img_qkv": _lin(sd, f"{pre}.img_attn_qkv", dtype),
            "txt_qkv": _lin(sd, f"{pre}.txt_attn_qkv", dtype),
            "img_q_norm": rms(f"{pre}.img_attn_q_norm"),
            "img_k_norm": rms(f"{pre}.img_attn_k_norm"),
            "txt_q_norm": rms(f"{pre}.txt_attn_q_norm"),
            "txt_k_norm": rms(f"{pre}.txt_attn_k_norm"),
            "img_proj": _lin(sd, f"{pre}.img_attn_proj", dtype),
            "txt_proj": _lin(sd, f"{pre}.txt_attn_proj", dtype),
            "img_mlp": {"fc1": _lin(sd, f"{pre}.img_mlp.fc1", dtype),
                        "fc2": _lin(sd, f"{pre}.img_mlp.fc2", dtype)},
            "txt_mlp": {"fc1": _lin(sd, f"{pre}.txt_mlp.fc1", dtype),
                        "fc2": _lin(sd, f"{pre}.txt_mlp.fc2", dtype)},
        })

    single = []
    for i in range(cfg.single_blocks):
        pre = f"single_blocks.{i}"
        single.append({
            "modulation": _lin(sd, f"{pre}.modulation.linear"),
            "linear1": _lin(sd, f"{pre}.linear1", dtype),
            "linear2": _lin(sd, f"{pre}.linear2", dtype),
            "q_norm": rms(f"{pre}.q_norm"),
            "k_norm": rms(f"{pre}.k_norm"),
        })

    refiner_blocks = []
    for i in range(cfg.refiner_depth):
        pre = f"txt_in.individual_token_refiner.blocks.{i}"
        refiner_blocks.append({
            "norm1": _norm(sd, f"{pre}.norm1"),
            "qkv": _lin(sd, f"{pre}.self_attn_qkv", dtype),
            "proj": _lin(sd, f"{pre}.self_attn_proj", dtype),
            "norm2": _norm(sd, f"{pre}.norm2"),
            "mlp": {"fc1": _lin(sd, f"{pre}.mlp.fc1", dtype),
                    "fc2": _lin(sd, f"{pre}.mlp.fc2", dtype)},
            "adaLN": _lin(sd, f"{pre}.adaLN_modulation.1"),
        })

    params = {
        "img_in": _patch_conv(sd, "img_in.proj", dtype),
        "txt_in": {
            "input_embedder": _lin(sd, "txt_in.input_embedder", dtype),
            "t_embedder": {"fc1": _lin(sd, "txt_in.t_embedder.mlp.0"),
                           "fc2": _lin(sd, "txt_in.t_embedder.mlp.2")},
            "c_embedder": {"fc1": _lin(sd, "txt_in.c_embedder.linear_1",
                                       dtype),
                           "fc2": _lin(sd, "txt_in.c_embedder.linear_2",
                                       dtype)},
            "blocks": refiner_blocks,
        },
        "time_in": {"fc1": _lin(sd, "time_in.mlp.0"),
                    "fc2": _lin(sd, "time_in.mlp.2")},
        "vector_in": {"fc1": _lin(sd, "vector_in.in_layer"),
                      "fc2": _lin(sd, "vector_in.out_layer")},
        "double_blocks": double,
        "single_blocks": single,
        "final_layer": {
            "linear": _lin(sd, "final_layer.linear", dtype),
            "adaLN": _lin(sd, "final_layer.adaLN_modulation.1"),
        },
    }
    if "guidance_in.mlp.0.weight" in sd:
        params["guidance_in"] = {"fc1": _lin(sd, "guidance_in.mlp.0"),
                                 "fc2": _lin(sd, "guidance_in.mlp.2")}
    return params


def convert_hyvae(sd: dict, cfg, dtype=np.float32) -> dict:
    """AutoencoderKLCausal3D state dict -> ``codec.vae_hy`` param tree."""
    def conv(name):
        return {"w": _np(sd[f"{name}.conv.weight"]).astype(dtype),
                "b": _np(sd[f"{name}.conv.bias"]).astype(dtype)}

    def plain_conv(name):
        return {"w": _np(sd[f"{name}.weight"]).astype(dtype),
                "b": _np(sd[f"{name}.bias"]).astype(dtype)}

    def resnet(pre):
        p = {"norm1": _norm(sd, f"{pre}.norm1"),
             "conv1": conv(f"{pre}.conv1"),
             "norm2": _norm(sd, f"{pre}.norm2"),
             "conv2": conv(f"{pre}.conv2")}
        if f"{pre}.conv_shortcut.conv.weight" in sd:
            p["shortcut"] = conv(f"{pre}.conv_shortcut")
        return p

    def mid(pre):
        a = f"{pre}.attentions.0"
        return {
            "resnet0": resnet(f"{pre}.resnets.0"),
            "resnet1": resnet(f"{pre}.resnets.1"),
            "attn": {
                "norm": _norm(sd, f"{a}.group_norm"),
                "q": _lin(sd, f"{a}.to_q"),
                "k": _lin(sd, f"{a}.to_k"),
                "v": _lin(sd, f"{a}.to_v"),
                "o": _lin(sd, f"{a}.to_out.0"),
            },
        }

    n = len(cfg.block_out_channels)
    enc_blocks = []
    for i in range(n):
        pre = f"encoder.down_blocks.{i}"
        blk = {"resnets": [resnet(f"{pre}.resnets.{j}")
                           for j in range(cfg.layers_per_block)]}
        if f"{pre}.downsamplers.0.conv.conv.weight" in sd:
            blk["down"] = conv(f"{pre}.downsamplers.0.conv")
        enc_blocks.append(blk)

    dec_blocks = []
    for i in range(n):
        pre = f"decoder.up_blocks.{i}"
        blk = {"resnets": [resnet(f"{pre}.resnets.{j}")
                           for j in range(cfg.layers_per_block + 1)]}
        if f"{pre}.upsamplers.0.conv.conv.weight" in sd:
            blk["up"] = {"conv": conv(f"{pre}.upsamplers.0.conv")}
        dec_blocks.append(blk)

    return {
        "encoder": {
            "conv_in": conv("encoder.conv_in"),
            "blocks": enc_blocks,
            "mid": mid("encoder.mid_block"),
            "norm_out": _norm(sd, "encoder.conv_norm_out"),
            "conv_out": conv("encoder.conv_out"),
        },
        "decoder": {
            "conv_in": conv("decoder.conv_in"),
            "mid": mid("decoder.mid_block"),
            "blocks": dec_blocks,
            "norm_out": _norm(sd, "decoder.conv_norm_out"),
            "conv_out": conv("decoder.conv_out"),
        },
        "quant_conv": plain_conv("quant_conv"),
        "post_quant_conv": plain_conv("post_quant_conv"),
    }


def save_params(path: str, params) -> None:
    """Flatten a param pytree into an .npz archive."""
    import jax
    flat = {}
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    for keypath, leaf in leaves:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in keypath)
        flat[name] = np.asarray(leaf)
    np.savez(path, **flat)


def load_params(path: str, like) -> dict:
    """Load an .npz saved by ``save_params`` back into the tree structure
    of ``like``."""
    import jax
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(like)
    out = []
    for keypath, leaf in leaves:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in keypath)
        out.append(data[name])
    return jax.tree_util.tree_unflatten(treedef, out)


def convert_wanvae(sd: dict, cfg, dtype=np.float32) -> dict:
    """WanVAE_ state dict -> ``codec.vae_wan`` param tree (reference module
    layout with flat nn.Sequential indices,
    `/root/reference/wan/modules/vae.py:265-509`)."""
    def c3(name):
        return {"w": _np(sd[f"{name}.weight"]).astype(dtype),
                "b": _np(sd[f"{name}.bias"]).astype(dtype)}

    def c2(name):
        return {"w": _np(sd[f"{name}.weight"]).astype(dtype),
                "b": _np(sd[f"{name}.bias"]).astype(dtype)}

    def rms(name):
        return {"g": _np(sd[f"{name}.gamma"]).reshape(-1).astype(np.float32)}

    def resblock(pre):
        p = {"norm1": rms(f"{pre}.residual.0"),
             "conv1": c3(f"{pre}.residual.2"),
             "norm2": rms(f"{pre}.residual.3"),
             "conv2": c3(f"{pre}.residual.6")}
        if f"{pre}.shortcut.weight" in sd:
            p["shortcut"] = c3(f"{pre}.shortcut")
        return p

    def attn(pre):
        return {"norm": rms(f"{pre}.norm"),
                "qkv": c2(f"{pre}.to_qkv"),
                "proj": c2(f"{pre}.proj")}

    def mid(pre):
        return {"res0": resblock(f"{pre}.0"), "attn": attn(f"{pre}.1"),
                "res1": resblock(f"{pre}.2")}

    n_stage = len(cfg.dim_mult)

    enc = {"conv1": c3("encoder.conv1"), "down": [],
           "mid": mid("encoder.middle"),
           "head_norm": rms("encoder.head.0"),
           "head_conv": c3("encoder.head.2")}
    idx = 0
    for i in range(n_stage):
        stage = {"res": []}
        for _ in range(cfg.num_res_blocks):
            stage["res"].append(resblock(f"encoder.downsamples.{idx}"))
            idx += 1
        if i != n_stage - 1:
            pre = f"encoder.downsamples.{idx}"
            stage["sample"] = {"conv": c2(f"{pre}.resample.1")}
            if cfg.temporal_downsample[i]:
                stage["sample"]["time_conv"] = c3(f"{pre}.time_conv")
            idx += 1
        enc["down"].append(stage)

    dec = {"conv1": c3("decoder.conv1"), "up": [],
           "mid": mid("decoder.middle"),
           "head_norm": rms("decoder.head.0"),
           "head_conv": c3("decoder.head.2")}
    t_up = tuple(reversed(cfg.temporal_downsample))
    idx = 0
    for i in range(n_stage):
        stage = {"res": []}
        for _ in range(cfg.num_res_blocks + 1):
            stage["res"].append(resblock(f"decoder.upsamples.{idx}"))
            idx += 1
        if i != n_stage - 1:
            pre = f"decoder.upsamples.{idx}"
            stage["sample"] = {"conv": c2(f"{pre}.resample.1")}
            if t_up[i]:
                stage["sample"]["time_conv"] = c3(f"{pre}.time_conv")
            idx += 1
        dec["up"].append(stage)

    return {"encoder": enc, "decoder": dec,
            "conv1": c3("conv1"), "conv2": c3("conv2")}


def load_safetensors_state_dict(path: str) -> dict:
    """Load a safetensors checkpoint: a single ``.safetensors`` file, a
    directory containing one, or a sharded set with a
    ``*.safetensors.index.json`` (how Wan 14B ships its DiT,
    `/root/reference/wan/text2video.py:85` via diffusers ``from_pretrained``).
    Returns numpy arrays (fp8 tensors come back as uint8 views plus their
    dtype tag handled by the caller)."""
    import json
    import os as _os
    from safetensors import safe_open

    def read_file(fp):
        out = {}
        with safe_open(fp, framework="np") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out

    if _os.path.isdir(path):
        idx = [f for f in sorted(_os.listdir(path))
               if f.endswith(".safetensors.index.json")]
        if idx:
            with open(_os.path.join(path, idx[0])) as f:
                index = json.load(f)
            shards = sorted(set(index["weight_map"].values()))
            sd = {}
            for s in shards:
                sd.update(read_file(_os.path.join(path, s)))
            return sd
        files = [f for f in sorted(_os.listdir(path))
                 if f.endswith(".safetensors")]
        if not files:
            raise FileNotFoundError(f"no .safetensors under {path}")
        sd = {}
        for s in files:
            sd.update(read_file(_os.path.join(path, s)))
        return sd
    return read_file(path)


def load_fp8_state_dict(dit_path: str) -> dict:
    """Load a reference fp8 DiT checkpoint (``*_fp8.pt`` weights stored as
    float8_e4m3fn + ``*_fp8_map.pt`` per-layer scales,
    `/root/reference/hyvideo/modules/fp8_optimization.py:82-102`) and
    dequantize to f32 numpy so the normal converters apply."""
    import os as _os
    import torch
    map_path = dit_path.replace(".pt", "_map.pt")
    if not _os.path.exists(map_path):
        raise FileNotFoundError(f"fp8 scale map not found: {map_path}")
    sd = load_torch_state_dict(dit_path)
    fp8_map = torch.load(map_path, map_location="cpu", weights_only=True)
    out = {}
    for k, v in sd.items():
        if isinstance(v, torch.Tensor) and v.dtype == torch.float8_e4m3fn:
            mkey = k[:-len(".weight")] if k.endswith(".weight") else k
            scale = fp8_map[mkey].to(torch.float32)
            out[k] = (v.to(torch.float32) * scale)
        else:
            out[k] = v
    return out


def _kohya_to_module_key(key: str, prefix: str) -> str:
    """kohya LoRA key -> reference module path (the inverse mapping of
    `/root/reference/hyvideo_i2v/utils/train_utils.py:24-55`), e.g.
    ``<pre>_lora_double_blocks_0_img_attn_qkv`` ->
    ``double_blocks.0.img_attn_qkv``."""
    name = key.split(".")[0]
    if prefix and name.startswith(prefix + "_lora_"):
        name = name[len(prefix) + 6:]
    elif name.startswith("lora_"):
        name = name[5:]
    for pat, rep in (
        ("single_blocks_", "single_blocks."),
        ("double_blocks_", "double_blocks."),
        ("_individual_token_refiner_blocks_",
         ".individual_token_refiner.blocks."),
        ("_img_attn_proj", ".img_attn_proj"),
        ("_img_attn_qkv", ".img_attn_qkv"),
        ("_img_mlp_fc", ".img_mlp.fc"),
        ("_txt_mlp_fc", ".txt_mlp.fc"),
        ("_img_mod", ".img_mod"),
        ("_txt", ".txt"),
        ("_modulation", ".modulation"),
        ("_linear", ".linear"),
        ("_mlp_fc", ".mlp.fc"),
    ):
        name = name.replace(pat, rep)
    # remaining single-word underscore segments after a block index
    # (e.g. ``0_self_attn_qkv``) become dots
    parts = name.split(".")
    fixed = []
    for p in parts:
        if "_" in p and p.split("_")[0].isdigit():
            head, rest = p.split("_", 1)
            fixed.extend([head, rest])
        else:
            fixed.append(p)
    return ".".join(fixed)


def merge_lora(sd: dict, lora, alpha: float = 1.0, prefix: str = "") -> dict:
    """Merge a kohya-format LoRA into a torch state dict in place:
    ``W += alpha/rank * up @ down`` per adapted linear (reference merge
    semantics, `/root/reference/hyvideo_i2v/utils/lora_utils.py:6-100`).

    ``lora`` is a safetensors path or an already-loaded dict with
    ``<name>.lora_down.weight`` / ``<name>.lora_up.weight`` /
    optional ``<name>.alpha`` entries.
    """
    import torch
    if isinstance(lora, str):
        from safetensors.torch import load_file
        lora = load_file(lora)
    downs = {k: v for k, v in lora.items() if k.endswith("lora_down.weight")}
    for dk, down in downs.items():
        base = dk[:-len(".lora_down.weight")]
        up = lora[f"{base}.lora_up.weight"]
        rank = down.shape[0]
        a = float(lora.get(f"{base}.alpha", rank))
        target = _kohya_to_module_key(base, prefix) + ".weight"
        if target not in sd:
            raise KeyError(f"LoRA target {target} not in base state dict")
        w = sd[target]
        delta = (alpha * a / rank) * (up.to(torch.float32)
                                      @ down.to(torch.float32))
        sd[target] = (w.to(torch.float32) + delta).to(w.dtype)
    return sd


def save_params_orbax(path: str, params) -> None:
    """Save a param pytree with orbax (the TPU-native checkpoint format:
    sharded, async-capable, zarr-backed — preferred over .npz for 14B)."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load_params_orbax(path: str, like=None):
    """Load an orbax checkpoint; ``like`` (a matching pytree of arrays or
    ShapeDtypeStructs) restores with placement/dtype control."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        import jax
        target = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), like)
        return ckptr.restore(os.path.abspath(path), target)
    return ckptr.restore(os.path.abspath(path))
