"""Llava multimodal encoder for HunyuanVideo-I2V prompt conditioning.

The reference's I2V text encoder runs a full llava forward — CLIP ViT-L/336
vision tower (features at hidden layer -2, CLS dropped) -> 2-layer MLP
projector -> 576 image embeddings spliced at the ``<image>`` token ->
llama — then extracts interleave-strided image tokens [5:581] and cropped
text tokens and concatenates them
(`/root/reference/hyvideo_i2v/text_encoder/__init__.py:368-533`,
templates/constants `/root/reference/hyvideo_i2v/constants.py:54-105`).

Here each piece is the existing JAX module (``text.clip`` vision tower,
``text.llama`` LLM) and the splice is a static-shape concatenation: the
``<image>`` token sits at a fixed template position, so no dynamic shapes
enter jit.
"""

from __future__ import annotations


import jax.numpy as jnp
import numpy as np

from .clip import CLIP_L_VISION_336, clip_vision_encode
from .llama import llama_hidden_states

__all__ = ["PROMPT_TEMPLATE_I2V_IMAGE", "PROMPT_TEMPLATE_I2V_VIDEO",
           "NEGATIVE_PROMPT_I2V", "I2V_TEMPLATE_INFO", "llava_encode",
           "llava_splice", "extract_i2v_tokens"]

# reference templates (`/root/reference/hyvideo_i2v/constants.py:54-73`)
PROMPT_TEMPLATE_I2V_IMAGE = (
    "<|start_header_id|>system<|end_header_id|>\n\n<image>\nDescribe the "
    "image by detailing the color, shape, size, texture, "
    "quantity, text, spatial relationships of the objects and background:"
    "<|eot_id|>"
    "<|start_header_id|>user<|end_header_id|>\n\n{}<|eot_id|>"
    "<|start_header_id|>assistant<|end_header_id|>\n\n")
PROMPT_TEMPLATE_I2V_VIDEO = (
    "<|start_header_id|>system<|end_header_id|>\n\n<image>\nDescribe the "
    "video by detailing the following aspects according to the reference "
    "image: "
    "1. The main content and theme of the video."
    "2. The color, shape, size, texture, quantity, text, and spatial "
    "relationships of the objects."
    "3. Actions, events, behaviors temporal relationships, physical "
    "movement changes of the objects."
    "4. background environment, light, style and atmosphere."
    "5. camera angles, movements, and transitions used in the video:"
    "<|eot_id|>\n\n"
    "<|start_header_id|>user<|end_header_id|>\n\n{}<|eot_id|>"
    "<|start_header_id|>assistant<|end_header_id|>\n\n")
NEGATIVE_PROMPT_I2V = ("deformation, a poor composition and deformed "
                       "video, bad teeth, bad eyes, bad limbs")

# crop/splice geometry per template (constants.py:85-100)
I2V_TEMPLATE_INFO = {
    # expected_double_returns: hits the full template yields per sample;
    # fewer means the prompt was truncated. Only the video branch of the
    # reference anchor-crops on it (`__init__.py:407-439`), so only
    # "video" carries the expectation.
    "image": {"template": PROMPT_TEMPLATE_I2V_IMAGE, "crop_start": 36,
              "image_emb_start": 5, "image_emb_end": 581,
              "image_emb_len": 576, "double_return_token_id": 271},
    "video": {"template": PROMPT_TEMPLATE_I2V_VIDEO, "crop_start": 103,
              "image_emb_start": 5, "image_emb_end": 581,
              "image_emb_len": 576, "double_return_token_id": 271,
              "expected_double_returns": 4},
}


def llava_splice(params, token_ids, attention_mask, pixel_values,
                 image_token_pos: int, vision_cfg=CLIP_L_VISION_336):
    """Vision tower + projector + static splice: returns the multimodal
    ``(inputs_embeds, attention_mask)`` pair where the single ``<image>``
    token at ``image_token_pos`` is expanded into the projected patch
    embeddings (HF llava semantics, vision_feature_layer=-2, CLS dropped).
    """
    feats = clip_vision_encode(params["vision"], vision_cfg, pixel_values,
                               feature_layer=-2)[:, 1:]   # drop CLS
    pr = params["projector"]
    from ..models import layers as L
    img = L.linear(pr["fc2"], _gelu(L.linear(pr["fc1"], feats)))

    embeds = params["llm"]["embed"][token_ids]
    b = embeds.shape[0]
    p = image_token_pos
    spliced = jnp.concatenate(
        [embeds[:, :p], img.astype(embeds.dtype), embeds[:, p + 1:]], axis=1)
    n_img = img.shape[1]
    mask = jnp.concatenate(
        [attention_mask[:, :p],
         jnp.ones((b, n_img), attention_mask.dtype),
         attention_mask[:, p + 1:]], axis=1)
    return spliced, mask


def llava_encode(params, llm_cfg, token_ids, attention_mask, pixel_values,
                 image_token_pos: int, num_layers: int | None = None,
                 vision_cfg=CLIP_L_VISION_336):
    """Full llava forward.

    ``params``: {"vision": ..., "projector": {"fc1", "fc2"}, "llm": ...};
    ``pixel_values`` [B, 3, 336, 336] normalized.
    Returns the llama hidden-states list over the spliced sequence.
    """
    spliced, mask = llava_splice(params, token_ids, attention_mask,
                                 pixel_values, image_token_pos, vision_cfg)
    states = llama_hidden_states(params["llm"], llm_cfg, None, mask,
                                 num_layers=num_layers,
                                 inputs_embeds=spliced)
    return states, mask


def _gelu(x):
    import jax
    return jax.nn.gelu(x, approximate=False)


def extract_i2v_tokens(hidden, mask, mode: str = "video",
                       image_embed_interleave: int = 4, token_ids=None):
    """Post-process llava hidden states into DiT conditioning: strided
    image tokens [start:end:interleave] + template-cropped text tokens,
    concatenated (reference ``encode``,
    `/root/reference/hyvideo_i2v/text_encoder/__init__.py:395-533`).

    ``interleave``: 4 for token_replace, 2 for latent_concat
    (`/root/reference/hyvideo_i2v/inference.py:260-268`).

    ``token_ids``: the UNSPLICED prompt token ids [B, S]; when given, the
    4 assistant-header tokens
    (``<|start_header_id|>assistant<|end_header_id|>\\n\\n``) preceding
    the last double-return token (id 271) are cropped out of the text
    span, matching the reference's assistant_crop
    (`__init__.py:425-439`). Positions are converted to spliced
    coordinates (the ``<image>`` token expanded to image_emb_len).
    """
    info = I2V_TEMPLATE_INFO[mode]
    s, e = info["image_emb_start"], info["image_emb_end"]
    text_start = info["crop_start"] - 1 + info["image_emb_len"]
    hidden = np.asarray(hidden)
    mask = np.asarray(mask)
    img_h = hidden[:, s:e:image_embed_interleave]
    img_m = mask[:, s:e:image_embed_interleave]
    if token_ids is None:
        txt_h = hidden[:, text_start:]
        txt_m = mask[:, text_start:]
        return (np.concatenate([img_h, txt_h], axis=1),
                np.concatenate([img_m, txt_m], axis=1))
    ids = np.asarray(token_ids)
    out_h, out_m = [], []
    shift = info["image_emb_len"] - 1     # <image> -> 576 embeddings
    for i in range(hidden.shape[0]):
        hits = np.nonzero(ids[i] == info["double_return_token_id"])[0]
        # A too-long prompt truncates the assistant header's trailing
        # double-return: the reference then substitutes the sequence end
        # as the crop anchor (`__init__.py:411-420`). Anchoring on an
        # earlier hit would crop 4 tokens out of the middle of the text.
        expected = info.get("expected_double_returns")
        if len(hits) == 0 or (expected and len(hits) < expected):
            last = ids.shape[1]
        else:
            last = int(hits[-1])
        acs = last + shift - 4            # assistant crop, spliced coords
        ace = last + shift
        out_h.append(np.concatenate(
            [hidden[i, text_start:acs], hidden[i, ace:]]))
        out_m.append(np.concatenate(
            [mask[i, text_start:acs], mask[i, ace:]]))
    txt_h = np.stack(out_h)
    txt_m = np.stack(out_m)
    return (np.concatenate([img_h, txt_h], axis=1),
            np.concatenate([img_m, txt_m], axis=1))
