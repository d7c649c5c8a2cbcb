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
           "PromptExpander"]

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
