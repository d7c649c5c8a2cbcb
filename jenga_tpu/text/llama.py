"""Llama-style causal LM encoder for HunyuanVideo's LLM text conditioning.

The reference wraps an HF llava/llama ``AutoModel`` and takes
``hidden_states[-(skip_layer+1)]`` with the instruction template cropped
off (`/root/reference/hyvideo/text_encoder/__init__.py:102-357`). This is
a from-scratch JAX llama (RMSNorm, rope, GQA, SwiGLU) exposing hidden
states at any depth, so the text path runs on TPU like everything else.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..models import layers as L

__all__ = ["LlamaConfig", "init_llama_params", "llama_hidden_states",
           "PROMPT_TEMPLATE_VIDEO", "PROMPT_TEMPLATE_IMAGE",
           "NEGATIVE_PROMPT", "CROP_START"]

# reference templates (`/root/reference/hyvideo/constants.py:33-60`)
PROMPT_TEMPLATE_IMAGE = (
    "<|start_header_id|>system<|end_header_id|>\n\nDescribe the image by "
    "detailing the color, shape, size, texture, quantity, text, spatial "
    "relationships of the objects and background:<|eot_id|>"
    "<|start_header_id|>user<|end_header_id|>\n\n{}<|eot_id|>")
PROMPT_TEMPLATE_VIDEO = (
    "<|start_header_id|>system<|end_header_id|>\n\nDescribe the video by "
    "detailing the following aspects: "
    "1. The main content and theme of the video."
    "2. The color, shape, size, texture, quantity, text, and spatial "
    "relationships of the objects."
    "3. Actions, events, behaviors temporal relationships, physical "
    "movement changes of the objects."
    "4. background environment, light, style and atmosphere."
    "5. camera angles, movements, and transitions used in the video:"
    "<|eot_id|><|start_header_id|>user<|end_header_id|>\n\n{}<|eot_id|>")
NEGATIVE_PROMPT = (
    "Aerial view, aerial view, overexposed, low quality, deformation, a "
    "poor composition, bad hands, bad teeth, bad eyes, bad limbs, "
    "distortion")
CROP_START = {"image": 36, "video": 95}


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 128320
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    rope_theta: float = 500000.0
    rms_eps: float = 1e-5
    dtype: str = "bfloat16"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def _lin(key, a, b, dtype):
    bound = math.sqrt(6.0 / (a + b))
    return {"w": jax.random.uniform(key, (a, b), dtype, -bound, bound)}


def init_llama_params(key, cfg: LlamaConfig):
    dtype = jnp.dtype(cfg.dtype)
    keys = iter(jax.random.split(key, 8 + 8 * cfg.num_layers))
    nk = lambda: next(keys)
    d, kvd = cfg.hidden_size, cfg.num_kv_heads * cfg.head_dim

    def block():
        return {
            "input_norm": jnp.ones((d,), jnp.float32),
            "q": _lin(nk(), d, d, dtype),
            "k": _lin(nk(), d, kvd, dtype),
            "v": _lin(nk(), d, kvd, dtype),
            "o": _lin(nk(), d, d, dtype),
            "post_norm": jnp.ones((d,), jnp.float32),
            "gate": _lin(nk(), d, cfg.intermediate_size, dtype),
            "up": _lin(nk(), d, cfg.intermediate_size, dtype),
            "down": _lin(nk(), cfg.intermediate_size, d, dtype),
        }

    return {
        "embed": jax.random.normal(nk(), (cfg.vocab_size, d), dtype) * 0.02,
        "blocks": [block() for _ in range(cfg.num_layers)],
        "final_norm": jnp.ones((d,), jnp.float32),
    }


def llama_hidden_states(params, cfg: LlamaConfig, token_ids, attention_mask,
                        num_layers: int | None = None, inputs_embeds=None):
    """Run the causal LM; returns the hidden state after each block
    as a list (index 0 = embeddings), mirroring HF ``hidden_states``.

    ``num_layers`` truncates the stack (only layers up to the needed
    skip-layer depth need computing — the reference runs all 32 then
    indexes; we stop early, an easy TPU win). ``inputs_embeds`` bypasses
    the embedding lookup (llava splices image embeddings in).
    """
    h = (inputs_embeds if inputs_embeds is not None
         else params["embed"][token_ids])
    b, s, d = h.shape
    n, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    cos, sin = L.rope_table_1d(np.arange(s), hd, theta=cfg.rope_theta)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    mask = attention_mask.astype(bool)
    # causal + padding mask folded into a bias
    causal = jnp.tril(jnp.ones((s, s), bool))
    bias = jnp.where(causal[None] & mask[:, None, :], 0.0, -1e30)

    states = [h]
    depth = num_layers if num_layers is not None else cfg.num_layers
    for p in params["blocks"][:depth]:
        x = L.rms_norm(h, p["input_norm"], cfg.rms_eps)
        q = L.linear(p["q"], x).reshape(b, s, n, hd)
        k = L.linear(p["k"], x).reshape(b, s, nkv, hd)
        v = L.linear(p["v"], x).reshape(b, s, nkv, hd)
        # llama "half-rotate" rope: rotate_half convention over split halves
        q = _rope_half(q, cos, sin)
        k = _rope_half(k, cos, sin)
        if nkv != n:
            k = jnp.repeat(k, n // nkv, axis=2)
            v = jnp.repeat(v, n // nkv, axis=2)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * hd ** -0.5
        logits = logits + bias[:, None]
        a = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("bhqk,bkhd->bqhd", a, v.astype(jnp.float32))
        attn = attn.reshape(b, s, d).astype(h.dtype)
        h = h + L.linear(p["o"], attn)
        x = L.rms_norm(h, p["post_norm"], cfg.rms_eps)
        y = L.linear(p["down"],
                     jax.nn.silu(L.linear(p["gate"], x))
                     * L.linear(p["up"], x))
        h = h + y
        states.append(h)
    if depth == cfg.num_layers:
        # HF convention: the last hidden_states entry is the final-normed
        # output; intermediates (what hidden_state_skip_layer indexes) are
        # raw block outputs.
        states[-1] = L.rms_norm(h, params["final_norm"], cfg.rms_eps)
    return states


def _rope_half(x, cos, sin):
    """Llama convention: rotate (first half, second half) pairs."""
    hd = x.shape[-1]
    x1, x2 = x[..., :hd // 2], x[..., hd // 2:]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    return jnp.concatenate([xf1 * c - xf2 * s, xf2 * c + xf1 * s],
                           axis=-1).astype(x.dtype)


# ------------------------------------------------------------- generation


def init_kv_cache(cfg: LlamaConfig, batch: int, max_len: int):
    """Per-layer KV cache arrays [B, max_len, kv_heads, head_dim] (f32)."""
    shape = (batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    return [{"k": jnp.zeros(shape, jnp.float32),
             "v": jnp.zeros(shape, jnp.float32)}
            for _ in range(cfg.num_layers)]


def _attn_with_cache(q, k_cache, v_cache, n, nkv, valid_len):
    """q [B, Tq, n, hd] against the cache's first ``valid_len`` entries."""
    b, tq, _, hd = q.shape
    max_len = k_cache.shape[1]
    if nkv != n:
        k_cache = jnp.repeat(k_cache, n // nkv, axis=2)
        v_cache = jnp.repeat(v_cache, n // nkv, axis=2)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        k_cache) * hd ** -0.5
    pos_k = jnp.arange(max_len)[None, None, None, :]
    mask = pos_k < valid_len.reshape(-1, 1, 1, 1)
    logits = jnp.where(mask, logits, -1e30)
    a = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", a, v_cache)
    return out.reshape(b, tq, n * hd)


def llama_prefill(params, cfg: LlamaConfig, token_ids, attention_mask,
                  max_len: int, inputs_embeds=None):
    """Run the prompt through the LM, filling a KV cache of ``max_len``.

    Returns (logits_last [B, vocab], cache, lengths [B]). Assumes
    right-padded prompts (positions = arange). ``inputs_embeds`` bypasses
    the embedding lookup (multimodal prompts with spliced image
    embeddings; ``token_ids`` may then be None)."""
    if inputs_embeds is not None:
        b, s = inputs_embeds.shape[:2]
    else:
        b, s = token_ids.shape
    n, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    cos_full, sin_full = L.rope_table_1d(np.arange(max_len), hd,
                                         theta=cfg.rope_theta)
    cos = jnp.asarray(cos_full[:s])
    sin = jnp.asarray(sin_full[:s])
    lengths = jnp.sum(attention_mask.astype(jnp.int32), axis=-1)

    h = (inputs_embeds if inputs_embeds is not None
         else params["embed"][token_ids])
    causal = jnp.tril(jnp.ones((s, s), bool))
    key_ok = attention_mask.astype(bool)[:, None, :]
    bias = jnp.where(causal[None] & key_ok, 0.0, -1e30)

    cache = init_kv_cache(cfg, b, max_len)
    for li, p in enumerate(params["blocks"]):
        x = L.rms_norm(h, p["input_norm"], cfg.rms_eps)
        q = _rope_half(L.linear(p["q"], x).reshape(b, s, n, hd), cos, sin)
        k = _rope_half(L.linear(p["k"], x).reshape(b, s, nkv, hd), cos, sin)
        v = L.linear(p["v"], x).reshape(b, s, nkv, hd)
        cache[li]["k"] = cache[li]["k"].at[:, :s].set(
            k.astype(jnp.float32))
        cache[li]["v"] = cache[li]["v"].at[:, :s].set(
            v.astype(jnp.float32))
        if nkv != n:
            k = jnp.repeat(k, n // nkv, axis=2)
            v = jnp.repeat(v, n // nkv, axis=2)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * hd ** -0.5
        logits = logits + bias[:, None]
        a = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("bhqk,bkhd->bqhd", a, v.astype(jnp.float32))
        h = h + L.linear(p["o"], attn.reshape(b, s, -1).astype(h.dtype))
        x = L.rms_norm(h, p["post_norm"], cfg.rms_eps)
        h = h + L.linear(p["down"],
                         jax.nn.silu(L.linear(p["gate"], x))
                         * L.linear(p["up"], x))
    h = L.rms_norm(h, params["final_norm"], cfg.rms_eps)
    # logits at each sample's LAST real token
    last = h[jnp.arange(b), lengths - 1]
    # lm_head defaults to tied embeddings (HF tie_word_embeddings)
    head = params.get("lm_head", {"w": params["embed"].T})
    logits = L.linear(head, last)
    return logits.astype(jnp.float32), cache, lengths


def llama_decode_step(params, cfg: LlamaConfig, token, pos, cache,
                      rope_cos, rope_sin):
    """One decode step: ``token`` [B] at position ``pos`` [B] (0-based).
    Returns (logits [B, vocab], cache)."""
    b = token.shape[0]
    n, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    cos = rope_cos[pos][:, None, None, :]   # [B,1,1,hd/2] per-sample pos
    sin = rope_sin[pos][:, None, None, :]

    h = params["embed"][token][:, None]     # [B, 1, d]
    for li, p in enumerate(params["blocks"]):
        x = L.rms_norm(h, p["input_norm"], cfg.rms_eps)
        q = L.linear(p["q"], x).reshape(b, 1, n, hd)
        k = L.linear(p["k"], x).reshape(b, 1, nkv, hd)
        v = L.linear(p["v"], x).reshape(b, 1, nkv, hd)
        q = _rope_pointwise(q, cos, sin)
        k = _rope_pointwise(k, cos, sin)
        # scatter k/v at pos per sample — REPLACE, never add: for ragged
        # right-padded batches the prefill already filled these positions
        # with pad-token k/v, and adding on top corrupts the cache for
        # every shorter sample
        onehot = jax.nn.one_hot(pos, cache[li]["k"].shape[1],
                                dtype=jnp.float32)[:, :, None, None]
        cache[li]["k"] = cache[li]["k"] * (1.0 - onehot) \
            + onehot * k.astype(jnp.float32)
        cache[li]["v"] = cache[li]["v"] * (1.0 - onehot) \
            + onehot * v.astype(jnp.float32)
        attn = _attn_with_cache(q, cache[li]["k"], cache[li]["v"], n, nkv,
                                pos + 1)
        h = h + L.linear(p["o"], attn.astype(h.dtype))
        x = L.rms_norm(h, p["post_norm"], cfg.rms_eps)
        h = h + L.linear(p["down"],
                         jax.nn.silu(L.linear(p["gate"], x))
                         * L.linear(p["up"], x))
    h = L.rms_norm(h, params["final_norm"], cfg.rms_eps)[:, 0]
    head = params.get("lm_head", {"w": params["embed"].T})
    logits = L.linear(head, h)
    return logits.astype(jnp.float32), cache


def _rope_pointwise(x, cos, sin):
    hd = x.shape[-1]
    x1, x2 = x[..., :hd // 2].astype(jnp.float32), \
        x[..., hd // 2:].astype(jnp.float32)
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                           axis=-1).astype(x.dtype)


def llama_generate(params, cfg: LlamaConfig, token_ids, attention_mask,
                   max_new_tokens: int = 128, eos_token_id=None,
                   temperature: float = 0.0, key=None, inputs_embeds=None):
    """Greedy (or sampled) decoding with a KV cache.

    ``token_ids`` [B, S] right-padded prompts. Returns a list of generated
    token-id lists (without the prompt), each stopped at ``eos_token_id``.
    ``inputs_embeds`` replaces the prompt embedding lookup (multimodal
    prompts with spliced image features; ``token_ids`` may then be None).
    """
    import functools
    if inputs_embeds is not None:
        b, s = inputs_embeds.shape[:2]
    else:
        b, s = token_ids.shape
    max_len = s + max_new_tokens
    cos, sin = L.rope_table_1d(np.arange(max_len), cfg.head_dim,
                               theta=cfg.rope_theta)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    prefill = jax.jit(functools.partial(llama_prefill, cfg=cfg,
                                        max_len=max_len))
    step = jax.jit(functools.partial(llama_decode_step, cfg=cfg))

    logits, cache, lengths = prefill(params, token_ids=token_ids,
                                     attention_mask=attention_mask,
                                     inputs_embeds=inputs_embeds)
    out = [[] for _ in range(b)]
    done = [False] * b
    pos = lengths  # next write position per sample
    for t in range(max_new_tokens):
        if temperature > 0.0 and key is not None:
            key, sub = jax.random.split(key)
            token = jax.random.categorical(sub, logits / temperature,
                                           axis=-1)
        else:
            token = jnp.argmax(logits, axis=-1)
        tok_host = np.asarray(token)
        for i in range(b):
            if not done[i]:
                if eos_token_id is not None and tok_host[i] == eos_token_id:
                    done[i] = True
                else:
                    out[i].append(int(tok_host[i]))
        if all(done):
            break
        logits, cache = step(params, token=token, pos=pos, cache=cache,
                             rope_cos=cos, rope_sin=sin)
        pos = pos + 1
    return out
