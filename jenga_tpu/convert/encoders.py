"""Text/image encoder checkpoint converters -> jenga_tpu param trees.

Covers every encoder the reference loads:
  * llama/llava LLM (HunyuanVideo ``text_encoder``, HF layout,
    `/root/reference/hyvideo/text_encoder/__init__.py:102-357`)
  * CLIP-L text (HunyuanVideo ``text_encoder_2``, HF CLIPTextModel)
  * UMT5-XXL (Wan ``models_t5_umt5-xxl-enc-bf16.pth``, the reference's
    scratch module layout `/root/reference/wan/modules/t5.py:267-341`,
    plus the HF UMT5EncoderModel layout)
  * CLIP ViT-H vision + XLM-Roberta text towers (Wan I2V
    ``models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth``,
    `/root/reference/wan/modules/clip.py:222-416`)

All linears transpose torch ``[out, in]`` -> ``[in, out]``; norm scales are
kept f32.
"""

from __future__ import annotations

import numpy as np

__all__ = ["convert_llama", "convert_clip_text", "convert_umt5_wan",
           "convert_umt5_hf", "convert_clip_vision_wan",
           "convert_xlm_roberta_wan", "strip_prefix"]


# torch->numpy cast and the bias-less/bias-ful linear + f32-norm helpers
# are shared with the DiT/VAE converters so conversion semantics cannot
# drift between the two converter modules
from . import _np, _norm as _ln_shared


def strip_prefix(sd: dict, *prefixes: str) -> dict:
    """Return the sub-dict under the first matching key prefix (or the
    original dict when no key carries any prefix). Used to unwrap llava's
    ``language_model.`` nesting and CLIP's ``text_model.``/``visual.``."""
    for pre in prefixes:
        hit = {k[len(pre):]: v for k, v in sd.items() if k.startswith(pre)}
        if hit:
            return hit
    return sd


def _linw(sd, name, dtype):
    return {"w": _np(sd[f"{name}.weight"]).T.astype(dtype)}


def _linwb(sd, name, dtype):
    p = {"w": _np(sd[f"{name}.weight"]).T.astype(dtype)}
    if f"{name}.bias" in sd:
        p["b"] = _np(sd[f"{name}.bias"]).astype(dtype)
    return p


def _ln(sd, name):
    return _ln_shared(sd, name)


# ------------------------------------------------------------------ llama


def convert_llama(sd: dict, cfg, dtype=np.float32) -> dict:
    """HF LlamaModel / llava ``language_model`` state dict ->
    ``jenga_tpu.text.llama`` tree."""
    # the LM head lives OUTSIDE the model.* prefix in ForCausalLM dicts
    lm_head = None
    for hk in ("lm_head.weight", "language_model.lm_head.weight"):
        if hk in sd:
            lm_head = {"w": _np(sd[hk]).T.astype(dtype)}
            break
    sd = strip_prefix(sd, "language_model.model.", "language_model.",
                      "model.")
    blocks = []
    for i in range(cfg.num_layers):
        pre = f"layers.{i}"
        blocks.append({
            "input_norm": _np(
                sd[f"{pre}.input_layernorm.weight"]).astype(np.float32),
            # _linwb keeps biases when present (Qwen2-style checkpoints)
            "q": _linwb(sd, f"{pre}.self_attn.q_proj", dtype),
            "k": _linwb(sd, f"{pre}.self_attn.k_proj", dtype),
            "v": _linwb(sd, f"{pre}.self_attn.v_proj", dtype),
            "o": _linwb(sd, f"{pre}.self_attn.o_proj", dtype),
            "post_norm": _np(
                sd[f"{pre}.post_attention_layernorm.weight"]).astype(
                    np.float32),
            "gate": _linw(sd, f"{pre}.mlp.gate_proj", dtype),
            "up": _linw(sd, f"{pre}.mlp.up_proj", dtype),
            "down": _linw(sd, f"{pre}.mlp.down_proj", dtype),
        })
    params = {
        "embed": _np(sd["embed_tokens.weight"]).astype(dtype),
        "blocks": blocks,
        "final_norm": _np(sd["norm.weight"]).astype(np.float32),
    }
    if lm_head is not None:          # untied LM head (generation)
        params["lm_head"] = lm_head
    return params


# -------------------------------------------------------------- CLIP text


def convert_clip_text(sd: dict, cfg, dtype=np.float32) -> dict:
    """HF CLIPTextModel state dict -> ``jenga_tpu.text.clip`` text tree."""
    sd = strip_prefix(sd, "text_model.")
    blocks = []
    for i in range(cfg.num_layers):
        pre = f"encoder.layers.{i}"
        blocks.append({
            "ln1": _ln(sd, f"{pre}.layer_norm1"),
            "q": _linwb(sd, f"{pre}.self_attn.q_proj", dtype),
            "k": _linwb(sd, f"{pre}.self_attn.k_proj", dtype),
            "v": _linwb(sd, f"{pre}.self_attn.v_proj", dtype),
            "o": _linwb(sd, f"{pre}.self_attn.out_proj", dtype),
            "ln2": _ln(sd, f"{pre}.layer_norm2"),
            "fc1": _linwb(sd, f"{pre}.mlp.fc1", dtype),
            "fc2": _linwb(sd, f"{pre}.mlp.fc2", dtype),
        })
    return {
        "token_embed": _np(
            sd["embeddings.token_embedding.weight"]).astype(dtype),
        "pos_embed": _np(
            sd["embeddings.position_embedding.weight"]).astype(dtype),
        "blocks": blocks,
        "final_ln": _ln(sd, "final_layer_norm"),
    }


# ------------------------------------------------------------------ UMT5


def convert_umt5_wan(sd: dict, cfg, dtype=np.float32) -> dict:
    """Wan scratch-T5 state dict (``models_t5_umt5-xxl-enc-bf16.pth``,
    module layout `/root/reference/wan/modules/t5.py:267-341`) ->
    ``jenga_tpu.text.t5`` tree."""
    blocks = []
    for i in range(cfg.num_layers):
        pre = f"blocks.{i}"
        p = {
            "norm1": _np(sd[f"{pre}.norm1.weight"]).astype(np.float32),
            "q": _linw(sd, f"{pre}.attn.q", dtype),
            "k": _linw(sd, f"{pre}.attn.k", dtype),
            "v": _linw(sd, f"{pre}.attn.v", dtype),
            "o": _linw(sd, f"{pre}.attn.o", dtype),
            "norm2": _np(sd[f"{pre}.norm2.weight"]).astype(np.float32),
            "gate": _linw(sd, f"{pre}.ffn.gate.0", dtype),
            "fc1": _linw(sd, f"{pre}.ffn.fc1", dtype),
            "fc2": _linw(sd, f"{pre}.ffn.fc2", dtype),
        }
        if not cfg.shared_pos:
            p["rel_embedding"] = _np(
                sd[f"{pre}.pos_embedding.embedding.weight"]).astype(
                    np.float32)
        blocks.append(p)
    params = {
        "embed": _np(sd["token_embedding.weight"]).astype(dtype),
        "blocks": blocks,
        "final_norm": _np(sd["norm.weight"]).astype(np.float32),
    }
    if cfg.shared_pos:
        params["rel_embedding"] = _np(
            sd["pos_embedding.embedding.weight"]).astype(np.float32)
    return params


def convert_umt5_hf(sd: dict, cfg, dtype=np.float32) -> dict:
    """HF UMT5EncoderModel state dict -> ``jenga_tpu.text.t5`` tree."""
    blocks = []
    for i in range(cfg.num_layers):
        pre = f"encoder.block.{i}"
        p = {
            "norm1": _np(
                sd[f"{pre}.layer.0.layer_norm.weight"]).astype(np.float32),
            "q": _linw(sd, f"{pre}.layer.0.SelfAttention.q", dtype),
            "k": _linw(sd, f"{pre}.layer.0.SelfAttention.k", dtype),
            "v": _linw(sd, f"{pre}.layer.0.SelfAttention.v", dtype),
            "o": _linw(sd, f"{pre}.layer.0.SelfAttention.o", dtype),
            "norm2": _np(
                sd[f"{pre}.layer.1.layer_norm.weight"]).astype(np.float32),
            "gate": _linw(sd, f"{pre}.layer.1.DenseReluDense.wi_0", dtype),
            "fc1": _linw(sd, f"{pre}.layer.1.DenseReluDense.wi_1", dtype),
            "fc2": _linw(sd, f"{pre}.layer.1.DenseReluDense.wo", dtype),
        }
        if not cfg.shared_pos:
            p["rel_embedding"] = _np(sd[
                f"{pre}.layer.0.SelfAttention.relative_attention_bias"
                ".weight"]).astype(np.float32)
        blocks.append(p)
    embed_key = ("encoder.embed_tokens.weight"
                 if "encoder.embed_tokens.weight" in sd else "shared.weight")
    params = {
        "embed": _np(sd[embed_key]).astype(dtype),
        "blocks": blocks,
        "final_norm": _np(
            sd["encoder.final_layer_norm.weight"]).astype(np.float32),
    }
    if cfg.shared_pos:
        params["rel_embedding"] = _np(sd[
            "encoder.block.0.layer.0.SelfAttention.relative_attention_bias"
            ".weight"]).astype(np.float32)
    return params


# --------------------------------------------------- Wan CLIP (ViT-H + XLMR)


def convert_clip_vision_wan(sd: dict, cfg, dtype=np.float32) -> dict:
    """Wan XLMRobertaCLIP ``visual.*`` sub-dict -> ``jenga_tpu.text.clip``
    vision tree (module layout
    `/root/reference/wan/modules/clip.py:222-300``: fused to_qkv, gelu MLP
    as nn.Sequential indices 0/2, pre_norm + post_norm)."""
    sd = strip_prefix(sd, "visual.")
    d = cfg.hidden_size
    blocks = []
    for i in range(cfg.num_layers):
        pre = f"transformer.{i}"
        qkv_w = _np(sd[f"{pre}.attn.to_qkv.weight"])       # [3d, d]
        qkv_b = _np(sd[f"{pre}.attn.to_qkv.bias"])
        blocks.append({
            "ln1": _ln(sd, f"{pre}.norm1"),
            "q": {"w": qkv_w[:d].T.astype(dtype),
                  "b": qkv_b[:d].astype(dtype)},
            "k": {"w": qkv_w[d:2 * d].T.astype(dtype),
                  "b": qkv_b[d:2 * d].astype(dtype)},
            "v": {"w": qkv_w[2 * d:].T.astype(dtype),
                  "b": qkv_b[2 * d:].astype(dtype)},
            "o": _linwb(sd, f"{pre}.attn.proj", dtype),
            "ln2": _ln(sd, f"{pre}.norm2"),
            "fc1": _linwb(sd, f"{pre}.mlp.0", dtype),
            "fc2": _linwb(sd, f"{pre}.mlp.2", dtype),
        })
    # Conv2d(3, d, patch, stride=patch, bias=False) -> matmul weight in
    # (C, ph, pw) flatten order, matching clip_vision_encode's reshape.
    w = _np(sd["patch_embedding.weight"])                  # [d, 3, p, p]
    patch = {"w": w.reshape(w.shape[0], -1).T.astype(dtype)}
    return {
        "patch_embed": patch,
        "cls_token": _np(sd["cls_embedding"]).astype(dtype),
        "pos_embed": _np(sd["pos_embedding"])[0].astype(dtype),
        "pre_ln": _ln(sd, "pre_norm"),
        "blocks": blocks,
        "post_ln": _ln(sd, "post_norm"),
    }


def convert_xlm_roberta_wan(sd: dict, cfg, dtype=np.float32) -> dict:
    """Wan XLMRobertaCLIP ``textual.*`` sub-dict ->
    ``jenga_tpu.text.xlm_roberta`` tree (module layout
    `/root/reference/wan/modules/xlm_roberta.py:76-142`, post_norm=True:
    embedding LN first, post-LN blocks)."""
    sd = strip_prefix(sd, "textual.")
    blocks = []
    for i in range(cfg.num_layers):
        pre = f"blocks.{i}"
        blocks.append({
            "q": _linwb(sd, f"{pre}.attn.q", dtype),
            "k": _linwb(sd, f"{pre}.attn.k", dtype),
            "v": _linwb(sd, f"{pre}.attn.v", dtype),
            "o": _linwb(sd, f"{pre}.attn.o", dtype),
            "ln1": _ln(sd, f"{pre}.norm1"),
            "fc1": _linwb(sd, f"{pre}.ffn.0", dtype),
            "fc2": _linwb(sd, f"{pre}.ffn.2", dtype),
            "ln2": _ln(sd, f"{pre}.norm2"),
        })
    return {
        "token_embed": _np(sd["token_embedding.weight"]).astype(dtype),
        "type_embed": _np(sd["type_embedding.weight"]).astype(dtype),
        "pos_embed": _np(sd["pos_embedding.weight"]).astype(dtype),
        "embed_ln": _ln(sd, "norm"),
        "blocks": blocks,
    }


def convert_clip_vision_hf(sd: dict, cfg, dtype=np.float32) -> dict:
    """HF CLIPVisionModel state dict (``vision_model.*``) ->
    ``jenga_tpu.text.clip`` vision tree (llava's tower layout)."""
    sd = strip_prefix(sd, "vision_model.")
    blocks = []
    for i in range(cfg.num_layers):
        pre = f"encoder.layers.{i}"
        blocks.append({
            "ln1": _ln(sd, f"{pre}.layer_norm1"),
            "q": _linwb(sd, f"{pre}.self_attn.q_proj", dtype),
            "k": _linwb(sd, f"{pre}.self_attn.k_proj", dtype),
            "v": _linwb(sd, f"{pre}.self_attn.v_proj", dtype),
            "o": _linwb(sd, f"{pre}.self_attn.out_proj", dtype),
            "ln2": _ln(sd, f"{pre}.layer_norm2"),
            "fc1": _linwb(sd, f"{pre}.mlp.fc1", dtype),
            "fc2": _linwb(sd, f"{pre}.mlp.fc2", dtype),
        })
    w = _np(sd["embeddings.patch_embedding.weight"])   # [d, 3, p, p]
    return {
        "patch_embed": {"w": w.reshape(w.shape[0], -1).T.astype(dtype)},
        "cls_token": _np(sd["embeddings.class_embedding"]).reshape(
            1, 1, -1).astype(dtype),
        "pos_embed": _np(
            sd["embeddings.position_embedding.weight"]).astype(dtype),
        # HF's (sic) "pre_layrnorm"
        "pre_ln": _ln(sd, "pre_layrnorm"),
        "blocks": blocks,
        "post_ln": _ln(sd, "post_layernorm"),
    }


def convert_llava(sd: dict, llm_cfg, vision_cfg, dtype=np.float32) -> dict:
    """HF LlavaForConditionalGeneration state dict -> {"vision",
    "projector", "llm"} trees for ``jenga_tpu.text.llava``."""
    # transformers >=4.52 moved weights under model.*
    if any(k.startswith("model.language_model.") for k in sd):
        sd = {k[len("model."):] if k.startswith("model.") else k: v
              for k, v in sd.items()}
    vision_sd = strip_prefix(sd, "vision_tower.")
    proj_sd = strip_prefix(sd, "multi_modal_projector.")
    return {
        "vision": convert_clip_vision_hf(vision_sd, vision_cfg, dtype),
        "projector": {"fc1": _linwb(proj_sd, "linear_1", dtype),
                      "fc2": _linwb(proj_sd, "linear_2", dtype)},
        "llm": convert_llama(sd, llm_cfg, dtype),
    }
