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

import numpy as np

__all__ = ["T2V_EXTEND_SYSTEM_PROMPT", "I2V_EXTEND_SYSTEM_PROMPT",
           "VL_EXTEND_SYSTEM_PROMPT",
           "REWRITE_NORMAL_SYSTEM_PROMPT", "REWRITE_MASTER_SYSTEM_PROMPT",
           "PromptExpander", "LocalLLMExpander", "LocalVLExpander",
           "APIExpander"]

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

VL_EXTEND_SYSTEM_PROMPT = (
    "You are a prompt engineer for an image-to-video model and you can "
    "see the user's conditioning image. Rewrite the user's short "
    "instruction into one detailed English paragraph that is grounded in "
    "the actual image content: name the visible subjects and their "
    "colors, shapes, textures and positions, then describe how they move "
    "and how the camera moves over the course of the clip, plus lighting "
    "and atmosphere. Never contradict the image, keep every element of "
    "the user's instruction, and answer with the expanded prompt only.")

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
    mode: str = "t2v"                 # t2v | i2v | vl | rewrite | master

    def __call__(self, prompt: str, image_description: str = "",
                 image=None) -> str:
        system = {
            "t2v": T2V_EXTEND_SYSTEM_PROMPT,
            "i2v": I2V_EXTEND_SYSTEM_PROMPT,
            "vl": VL_EXTEND_SYSTEM_PROMPT,
            "rewrite": REWRITE_NORMAL_SYSTEM_PROMPT,
            "master": REWRITE_MASTER_SYSTEM_PROMPT,
        }[self.mode]
        user = prompt if not image_description else (
            f"Image: {image_description}\nInstruction: {prompt}")
        if image is not None:
            # vision-language chat_fn (e.g. LocalVLExpander) sees the image
            out = self.chat_fn(system, user, image=image)
        else:
            out = self.chat_fn(system, user)
        return out.strip() or prompt


class APIExpander:
    """Remote-API prompt expander — counterpart of the reference's
    ``DashScopePromptExpander`` (`/root/reference/wan/utils/
    prompt_extend.py:101-161`: DashScope ``Generation``/
    ``MultiModalConversation`` calls with retry). Speaks the
    OpenAI-compatible chat-completions JSON dialect that DashScope, vLLM,
    and most hosted LLM endpoints expose, over stdlib ``urllib`` (no SDK
    dependency). Plugs into :class:`PromptExpander` as ``chat_fn``.

    ``transport`` is the seam for tests / exotic backends: a callable
    ``(url, headers: dict, body: bytes, timeout: float) -> bytes``
    returning the raw JSON response. The default posts over HTTPS.
    """

    def __init__(self, model: str = "qwen-plus", url: str | None = None,
                 api_key: str | None = None, timeout: float = 30.0,
                 retries: int = 4, transport=None):
        import os

        self.model = model
        self.url = url or os.environ.get(
            "PROMPT_EXTEND_API_URL",
            "https://dashscope.aliyuncs.com/compatible-mode/v1"
            "/chat/completions")
        self.api_key = api_key if api_key is not None else (
            os.environ.get("DASH_API_KEY")        # reference env var name
            or os.environ.get("DASHSCOPE_API_KEY")
            or os.environ.get("OPENAI_API_KEY"))
        self.timeout = timeout
        self.retries = max(1, int(retries))
        self.transport = transport or self._http_post

    @staticmethod
    def _http_post(url, headers, body, timeout):
        import urllib.request

        req = urllib.request.Request(url, data=body, headers=headers,
                                     method="POST")
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.read()

    @staticmethod
    def _image_part(image):
        """Image path / [3,H,W] uint8-able array -> data-URL content part
        (the reference uploads a local file to the multimodal endpoint;
        the OpenAI dialect inlines it as a base64 data URL)."""
        import base64

        if isinstance(image, str):
            with open(image, "rb") as f:
                raw = f.read()
            mime = ("image/png" if image.lower().endswith(".png")
                    else "image/jpeg")
        else:
            import io

            arr = np.asarray(image)
            if arr.ndim == 3 and arr.shape[0] in (1, 3):   # CHW -> HWC
                arr = np.moveaxis(arr, 0, -1)
            if arr.dtype != np.uint8:
                arr = np.clip(arr, 0, 255).astype(np.uint8)
            buf = io.BytesIO()
            try:
                from PIL import Image as _Image
                _Image.fromarray(arr.squeeze()).save(buf, format="PNG")
            except ImportError:
                # minimal fallback: raw npy payload (accepted by our own
                # transport seam in tests; real endpoints want PNG/JPEG)
                np.save(buf, arr)
            raw, mime = buf.getvalue(), "image/png"
        b64 = base64.b64encode(raw).decode("ascii")
        return {"type": "image_url",
                "image_url": {"url": f"data:{mime};base64,{b64}"}}

    def __call__(self, system: str, user: str, image=None) -> str:
        import json
        import time

        if image is None:
            user_content = user
        else:
            user_content = [{"type": "text", "text": user},
                            self._image_part(image)]
        body = json.dumps({
            "model": self.model,
            "messages": [{"role": "system", "content": system},
                         {"role": "user", "content": user_content}],
        }).encode("utf-8")
        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        err = None
        for attempt in range(self.retries):
            try:
                raw = self.transport(self.url, headers, body, self.timeout)
                resp = json.loads(raw)
                # OpenAI/DashScope-compatible dialect first, then the
                # native DashScope shape (output.choices / output.text)
                if "choices" in resp:
                    return resp["choices"][0]["message"]["content"]
                out = resp["output"]
                if "choices" in out:
                    return out["choices"][0]["message"]["content"]
                return out["text"]
            except Exception as e:  # noqa: BLE001 - retry any transport
                err = e             # or schema error, like the reference
                time.sleep(min(2.0 ** attempt * 0.5, 4.0))
        raise RuntimeError(
            f"prompt-extend API failed after {self.retries} attempts: "
            f"{type(err).__name__}: {err}") from err


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
        # pass dtype so the 7-8B weight tree lands in bf16 (f32 doubles
        # host+device memory and halves matmul throughput)
        self.params = jax.tree.map(jnp.asarray, convert_llama(
            sd, self.cfg, dtype=np.dtype(self.cfg.dtype)))
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


class LocalVLExpander:
    """Image-conditioned prompt expander (reference ``QwenPromptExpander``
    with ``is_vl=True``, `/root/reference/wan/utils/prompt_extend.py:288-
    352,437-520`): loads any llava-format HF checkpoint dir (vision tower
    + projector + llama) and expands the prompt while *seeing* the I2V
    conditioning image — multimodal prefill via spliced image embeddings,
    then KV-cache decoding, all on-device."""

    def __init__(self, model_dir: str, max_new_tokens: int = 256,
                 temperature: float = 0.0, dtype: str = "bfloat16"):
        import json
        import os

        import jax
        import jax.numpy as jnp

        from ..convert import load_safetensors_state_dict, \
            load_torch_state_dict
        from ..convert.encoders import convert_llava
        from .clip import CLIP_L_VISION_336, CLIPVisionConfig
        from .llama import LlamaConfig

        with open(os.path.join(model_dir, "config.json")) as f:
            hf = json.load(f)
        self.image_token_id = hf.get("image_token_index", None)
        txt = hf.get("text_config", hf)
        self.cfg = LlamaConfig(
            vocab_size=txt["vocab_size"],
            hidden_size=txt["hidden_size"],
            intermediate_size=txt["intermediate_size"],
            num_layers=txt["num_hidden_layers"],
            num_heads=txt["num_attention_heads"],
            num_kv_heads=txt.get("num_key_value_heads",
                                 txt["num_attention_heads"]),
            rope_theta=txt.get("rope_theta", 10000.0),
            rms_eps=txt.get("rms_norm_eps", 1e-6),
            dtype=dtype)
        vis = hf.get("vision_config")
        self.vision_cfg = CLIPVisionConfig(
            image_size=vis.get("image_size", 336),
            patch_size=vis.get("patch_size", 14),
            hidden_size=vis.get("hidden_size", 1024),
            intermediate_size=vis.get("intermediate_size", 4096),
            num_layers=vis.get("num_hidden_layers", 24),
            num_heads=vis.get("num_attention_heads", 16),
            act=vis.get("hidden_act", "quick_gelu"),
        ) if vis else CLIP_L_VISION_336
        try:
            sd = load_safetensors_state_dict(model_dir)
        except FileNotFoundError:
            sd = load_torch_state_dict(
                os.path.join(model_dir, "pytorch_model.bin"))
        self.params = jax.tree.map(
            jnp.asarray, convert_llava(sd, self.cfg, self.vision_cfg,
                                       dtype=np.dtype(self.cfg.dtype)))
        from transformers import AutoTokenizer
        self.tok = AutoTokenizer.from_pretrained(model_dir)
        if self.image_token_id is None:
            self.image_token_id = self.tok.convert_tokens_to_ids("<image>")
        self.max_new_tokens = max_new_tokens
        self.temperature = temperature

    def _pixel_values(self, image):
        """Image path / [3,H,W] array -> normalized [1,3,336,336]."""
        import numpy as np

        from ..runtime import CLIP_MEAN, CLIP_STD, _resize_chw, load_image
        if isinstance(image, str):
            image = load_image(image)
        s = self.vision_cfg.image_size
        x = np.asarray(_resize_chw(np.asarray(image, np.float32), s, s))
        x = (x - CLIP_MEAN[:, None, None]) / CLIP_STD[:, None, None]
        return x[None]

    def __call__(self, system: str, user: str, image=None) -> str:
        import jax
        import jax.numpy as jnp
        import numpy as np

        from .llama import llama_generate
        from .llava import llava_splice

        if image is None:
            raise ValueError("LocalVLExpander requires an image; use "
                             "LocalLLMExpander for text-only expansion")
        messages = [{"role": "system", "content": system},
                    {"role": "user", "content": f"<image>\n{user}"}]
        try:
            text = self.tok.apply_chat_template(
                messages, tokenize=False, add_generation_prompt=True)
        except Exception:
            text = f"{system}\n\n<image>\n{user}\n"
        enc = self.tok(text, return_tensors="np")
        ids = enc["input_ids"]
        mask = enc.get("attention_mask", np.ones_like(ids))
        pos = np.nonzero(ids[0] == self.image_token_id)[0]
        if pos.size != 1:
            raise ValueError(
                f"prompt must contain exactly one <image> token "
                f"(id {self.image_token_id}), found {pos.size}")
        embeds, full_mask = llava_splice(
            self.params, jnp.asarray(ids), jnp.asarray(mask),
            jnp.asarray(self._pixel_values(image)), int(pos[0]),
            vision_cfg=self.vision_cfg)
        out = llama_generate(
            self.params["llm"], self.cfg, None, full_mask,
            max_new_tokens=self.max_new_tokens,
            eos_token_id=self.tok.eos_token_id,
            temperature=self.temperature,
            key=jax.random.PRNGKey(0) if self.temperature > 0 else None,
            inputs_embeds=embeds)
        return self.tok.decode(out[0], skip_special_tokens=True)
