"""Prompt extension / rewriting.

Counterpart of the reference's prompt expanders
(`/root/reference/wan/utils/prompt_extend.py:101-545`: DashScope API and
local Qwen expanders) and the HunyuanVideo rewrite templates
(`/root/reference/hyvideo/prompt_rewrite.py:1-51`). The system prompts are
re-authored equivalents; the local-model path plugs into any callable
``chat_fn(system, user) -> str`` (e.g. a JAX llama from
``jenga_tpu.text.llama`` with converted Qwen weights, or an external API).
"""

from __future__ import annotations

import dataclasses

__all__ = ["T2V_EXTEND_SYSTEM_PROMPT", "I2V_EXTEND_SYSTEM_PROMPT",
           "REWRITE_NORMAL_SYSTEM_PROMPT", "REWRITE_MASTER_SYSTEM_PROMPT",
           "PromptExpander", "LocalLLMExpander"]

T2V_EXTEND_SYSTEM_PROMPT = (
    "You are a prompt engineer for a text-to-video model. Expand the "
    "user's short prompt into a single detailed paragraph that specifies: "
    "the main subjects and their appearance (color, shape, size, texture, "
    "count), the actions and their temporal order, the background and "
    "lighting, the artistic style and atmosphere, and the camera angle "
    "and movement. Keep every element of the original prompt, invent only "
    "plausible supporting detail, and answer with the expanded prompt "
    "only.")

I2V_EXTEND_SYSTEM_PROMPT = (
    "You are a prompt engineer for an image-to-video model. Given an "
    "input image description and a user instruction, write one detailed "
    "paragraph describing how the scene evolves over time: motion of each "
    "subject, camera movement, lighting changes, and atmosphere, staying "
    "strictly consistent with the visible content of the image. Answer "
    "with the expanded prompt only.")

REWRITE_NORMAL_SYSTEM_PROMPT = (
    "Rewrite the user's video prompt so it is concrete and unambiguous: "
    "resolve pronouns, name the subjects explicitly, state spatial "
    "relations, and keep the original intent and all constraints. Output "
    "only the rewritten prompt.")

REWRITE_MASTER_SYSTEM_PROMPT = (
    "Rewrite the user's video prompt in a cinematic 'master shot' style: "
    "add professional cinematography vocabulary (lens, framing, movement, "
    "lighting design, color palette) while preserving the original "
    "content exactly. Output only the rewritten prompt.")


@dataclasses.dataclass
class PromptExpander:
    """Expand/rewrite prompts through a pluggable chat function."""

    chat_fn: object                   # callable(system, user) -> str
    mode: str = "t2v"                 # t2v | i2v | rewrite | master

    def __call__(self, prompt: str, image_description: str = "") -> str:
        system = {
            "t2v": T2V_EXTEND_SYSTEM_PROMPT,
            "i2v": I2V_EXTEND_SYSTEM_PROMPT,
            "rewrite": REWRITE_NORMAL_SYSTEM_PROMPT,
            "master": REWRITE_MASTER_SYSTEM_PROMPT,
        }[self.mode]
        user = prompt if not image_description else (
            f"Image: {image_description}\nInstruction: {prompt}")
        out = self.chat_fn(system, user)
        return out.strip() or prompt


class LocalLLMExpander:
    """Local prompt-expander model (reference ``QwenPromptExpander``,
    `/root/reference/wan/utils/prompt_extend.py:288-545`): loads any
    llama/Qwen2-architecture HF checkpoint dir and generates the expanded
    prompt on-device with the JAX LM + KV cache."""

    def __init__(self, model_dir: str, max_new_tokens: int = 256,
                 temperature: float = 0.0, dtype: str = "bfloat16"):
        import json
        import os

        import jax
        import jax.numpy as jnp

        from ..convert import load_safetensors_state_dict, \
            load_torch_state_dict
        from ..convert.encoders import convert_llama
        from .llama import LlamaConfig

        with open(os.path.join(model_dir, "config.json")) as f:
            hf = json.load(f)
        self.cfg = LlamaConfig(
            vocab_size=hf["vocab_size"],
            hidden_size=hf["hidden_size"],
            intermediate_size=hf["intermediate_size"],
            num_layers=hf["num_hidden_layers"],
            num_heads=hf["num_attention_heads"],
            num_kv_heads=hf.get("num_key_value_heads",
                                hf["num_attention_heads"]),
            rope_theta=hf.get("rope_theta", 10000.0),
            rms_eps=hf.get("rms_norm_eps", 1e-6),
            dtype=dtype)
        try:
            sd = load_safetensors_state_dict(model_dir)
        except FileNotFoundError:
            pt = os.path.join(model_dir, "pytorch_model.bin")
            sd = load_torch_state_dict(pt)
        self.params = jax.tree.map(jnp.asarray, convert_llama(sd, self.cfg))
        from transformers import AutoTokenizer
        self.tok = AutoTokenizer.from_pretrained(model_dir)
        self.max_new_tokens = max_new_tokens
        self.temperature = temperature

    def __call__(self, system: str, user: str) -> str:
        import jax
        import jax.numpy as jnp
        import numpy as np

        from .llama import llama_generate

        messages = [{"role": "system", "content": system},
                    {"role": "user", "content": user}]
        try:
            text = self.tok.apply_chat_template(
                messages, tokenize=False, add_generation_prompt=True)
        except Exception:
            text = f"{system}\n\n{user}\n"
        enc = self.tok(text, return_tensors="np")
        ids = jnp.asarray(enc["input_ids"])
        mask = jnp.asarray(enc.get(
            "attention_mask", np.ones_like(enc["input_ids"])))
        out = llama_generate(
            self.params, self.cfg, ids, mask,
            max_new_tokens=self.max_new_tokens,
            eos_token_id=self.tok.eos_token_id,
            temperature=self.temperature,
            key=jax.random.PRNGKey(0) if self.temperature > 0 else None)
        return self.tok.decode(out[0], skip_special_tokens=True)
