"""Text conditioning: prompt templating, tokenization adapters, encoders.

The heavy encoders (llama LLM, UMT5, CLIP) are JAX implementations in this
package; tokenization is host-side via HF tokenizers (the reference also
uses HF tokenizers, `/root/reference/wan/modules/tokenizers.py:37-82`,
`/root/reference/hyvideo/text_encoder/__init__.py:102-357`).
"""

from __future__ import annotations


import numpy as np

from .llama import (CROP_START, NEGATIVE_PROMPT, PROMPT_TEMPLATE_IMAGE,
                    PROMPT_TEMPLATE_VIDEO)

__all__ = ["apply_hyvideo_template", "crop_encoder_output",
           "HFTokenizerAdapter", "NEGATIVE_PROMPT",
           "PROMPT_TEMPLATE_IMAGE", "PROMPT_TEMPLATE_VIDEO", "CROP_START"]


def apply_hyvideo_template(prompt: str, mode: str = "video") -> str:
    """Wrap a user prompt in the instruct template whose tokens are later
    cropped (`/root/reference/hyvideo/constants.py:33-60`)."""
    template = (PROMPT_TEMPLATE_VIDEO if mode == "video"
                else PROMPT_TEMPLATE_IMAGE)
    return template.format(prompt)


def crop_encoder_output(hidden_states: np.ndarray, mask: np.ndarray,
                        mode: str = "video"):
    """Strip the instruction-template tokens from LLM states + mask
    (reference crop logic,
    `/root/reference/hyvideo/text_encoder/__init__.py:320-332`)."""
    crop = CROP_START[mode]
    return hidden_states[:, crop:], mask[:, crop:]


class HFTokenizerAdapter:
    """Thin host-side wrapper over an HF tokenizer directory."""

    def __init__(self, path: str, max_length: int = 256,
                 add_special_tokens: bool = True):
        from transformers import AutoTokenizer
        self.tok = AutoTokenizer.from_pretrained(path)
        self.max_length = max_length
        self.add_special_tokens = add_special_tokens

    def __call__(self, texts, max_length: int | None = None):
        out = self.tok(
            texts if isinstance(texts, list) else [texts],
            padding="max_length", truncation=True,
            max_length=max_length or self.max_length,
            add_special_tokens=self.add_special_tokens,
            return_tensors="np")
        return out["input_ids"], out["attention_mask"]
