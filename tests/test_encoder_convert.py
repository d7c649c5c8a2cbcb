"""Encoder converter tests: numerics vs HF transformers (tiny models) for
the HF-layout formats, and key-coverage/shape checks for the Wan-native
scratch-module formats."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from jenga_tpu.convert import encoders as E
from jenga_tpu.text import clip as clip_lib
from jenga_tpu.text import llama as llama_lib
from jenga_tpu.text import t5 as t5_lib
from jenga_tpu.text import xlm_roberta as xlmr_lib


def test_llama_matches_transformers():
    from transformers import LlamaConfig, LlamaModel
    hf_cfg = LlamaConfig(vocab_size=128, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         rope_theta=500000.0, rms_norm_eps=1e-5)
    torch.manual_seed(0)
    model = LlamaModel(hf_cfg).eval()
    ids = torch.randint(0, 128, (2, 10))
    mask = torch.ones(2, 10, dtype=torch.long)
    mask[1, 7:] = 0
    with torch.no_grad():
        out = model(input_ids=ids, attention_mask=mask,
                    output_hidden_states=True)

    cfg = llama_lib.LlamaConfig(vocab_size=128, hidden_size=64,
                                intermediate_size=128, num_layers=2,
                                num_heads=4, num_kv_heads=2,
                                rope_theta=500000.0, dtype="float32")
    params = jax.tree.map(jnp.asarray,
                          E.convert_llama(model.state_dict(), cfg))
    states = llama_lib.llama_hidden_states(
        params, cfg, jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy()))
    valid = np.asarray(mask.numpy(), bool)
    for i in (0, 1, 2):
        ours = np.asarray(states[i])[valid]
        ref = out.hidden_states[i].numpy()[valid]
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-4)


def test_llama_llava_prefix_stripped():
    cfg = llama_lib.LlamaConfig(vocab_size=16, hidden_size=8,
                                intermediate_size=16, num_layers=1,
                                num_heads=2, num_kv_heads=2, dtype="float32")
    d = cfg.hidden_size
    sd = {}
    pre = "language_model.model."
    sd[pre + "embed_tokens.weight"] = torch.randn(16, d)
    sd[pre + "norm.weight"] = torch.ones(d)
    b = pre + "layers.0."
    sd[b + "input_layernorm.weight"] = torch.ones(d)
    sd[b + "post_attention_layernorm.weight"] = torch.ones(d)
    for n in ("q_proj", "o_proj"):
        sd[b + f"self_attn.{n}.weight"] = torch.randn(d, d)
    for n in ("k_proj", "v_proj"):
        sd[b + f"self_attn.{n}.weight"] = torch.randn(d, d)
    sd[b + "mlp.gate_proj.weight"] = torch.randn(16, d)
    sd[b + "mlp.up_proj.weight"] = torch.randn(16, d)
    sd[b + "mlp.down_proj.weight"] = torch.randn(d, 16)
    params = E.convert_llama(sd, cfg)
    assert params["embed"].shape == (16, d)
    assert params["blocks"][0]["down"]["w"].shape == (16, d)


def test_clip_text_matches_transformers():
    from transformers import CLIPTextConfig, CLIPTextModel
    hf_cfg = CLIPTextConfig(vocab_size=99, hidden_size=32,
                            intermediate_size=64, num_hidden_layers=2,
                            num_attention_heads=4, max_position_embeddings=77,
                            eos_token_id=98, bos_token_id=97)
    torch.manual_seed(1)
    model = CLIPTextModel(hf_cfg).eval()
    ids = torch.randint(0, 97, (2, 12))
    ids[:, 0] = 97
    ids[0, 5] = 98
    ids[1, 11] = 98
    with torch.no_grad():
        out = model(input_ids=ids)

    cfg = clip_lib.CLIPTextConfig(vocab_size=99, hidden_size=32,
                                  intermediate_size=64, num_layers=2,
                                  num_heads=4, eos_token_id=98)
    params = jax.tree.map(jnp.asarray,
                          E.convert_clip_text(model.state_dict(), cfg))
    states, pooled = clip_lib.clip_text_encode(params, cfg,
                                               jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(np.asarray(states),
                               out.last_hidden_state.numpy(),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(pooled),
                               out.pooler_output.numpy(),
                               atol=2e-5, rtol=2e-5)


def test_umt5_hf_matches_transformers():
    from transformers import UMT5Config, UMT5EncoderModel
    hf_cfg = UMT5Config(vocab_size=128, d_model=32, d_kv=8, d_ff=64,
                        num_layers=2, num_heads=4,
                        relative_attention_num_buckets=32,
                        relative_attention_max_distance=128,
                        feed_forward_proj="gated-gelu", dropout_rate=0.0)
    torch.manual_seed(2)
    model = UMT5EncoderModel(hf_cfg).eval()
    ids = torch.randint(0, 128, (2, 9))
    mask = torch.ones(2, 9, dtype=torch.long)
    mask[1, 6:] = 0
    with torch.no_grad():
        out = model(input_ids=ids, attention_mask=mask)

    cfg = t5_lib.T5Config(vocab_size=128, dim=32, dim_attn=32, dim_ffn=64,
                          num_heads=4, num_layers=2, num_buckets=32,
                          max_dist=128, shared_pos=False, dtype="float32")
    params = jax.tree.map(jnp.asarray,
                          E.convert_umt5_hf(model.state_dict(), cfg))
    states = t5_lib.t5_encode(params, cfg, jnp.asarray(ids.numpy()),
                              jnp.asarray(mask.numpy()))
    valid = np.asarray(mask.numpy(), bool)
    np.testing.assert_allclose(np.asarray(states)[valid],
                               out.last_hidden_state.numpy()[valid],
                               atol=2e-4, rtol=2e-4)


def _full_coverage(convert_fn, sd, cfg):
    """Every synthesized key must be consumed (catches layout drift)."""
    seen = set()

    class Tracker(dict):
        def __getitem__(self, k):
            seen.add(k)
            return dict.__getitem__(self, k)

        def __contains__(self, k):
            return dict.__contains__(self, k)

    tree = convert_fn(Tracker(sd), cfg)
    missing = set(sd) - seen
    assert not missing, f"converter ignored keys: {sorted(missing)[:8]}"
    return tree


def test_umt5_wan_layout():
    cfg = t5_lib.T5Config(vocab_size=64, dim=16, dim_attn=16, dim_ffn=32,
                          num_heads=2, num_layers=2, shared_pos=False,
                          dtype="float32")
    sd = {"token_embedding.weight": torch.randn(64, 16),
          "norm.weight": torch.ones(16)}
    for i in range(2):
        p = f"blocks.{i}"
        sd[f"{p}.norm1.weight"] = torch.ones(16)
        sd[f"{p}.norm2.weight"] = torch.ones(16)
        for n in "qkvo":
            sd[f"{p}.attn.{n}.weight"] = torch.randn(16, 16)
        sd[f"{p}.ffn.gate.0.weight"] = torch.randn(32, 16)
        sd[f"{p}.ffn.fc1.weight"] = torch.randn(32, 16)
        sd[f"{p}.ffn.fc2.weight"] = torch.randn(16, 32)
        sd[f"{p}.pos_embedding.embedding.weight"] = torch.randn(32, 2)
    params = jax.tree.map(jnp.asarray, _full_coverage(E.convert_umt5_wan,
                                                      sd, cfg))
    ids = jnp.asarray(np.random.randint(0, 64, (1, 8)))
    states = t5_lib.t5_encode(params, cfg, ids, jnp.ones((1, 8), jnp.int32))
    assert states.shape == (1, 8, 16)
    assert np.isfinite(np.asarray(states)).all()


def test_clip_vision_wan_layout():
    cfg = clip_lib.CLIPVisionConfig(image_size=28, patch_size=14,
                                    hidden_size=16, intermediate_size=32,
                                    num_layers=2, num_heads=2)
    sd = {"patch_embedding.weight": torch.randn(16, 3, 14, 14),
          "cls_embedding": torch.randn(1, 1, 16),
          "pos_embedding": torch.randn(1, 5, 16)}
    for n in ("pre_norm", "post_norm"):
        sd[f"{n}.weight"] = torch.ones(16)
        sd[f"{n}.bias"] = torch.zeros(16)
    for i in range(2):
        p = f"transformer.{i}"
        for n in ("norm1", "norm2"):
            sd[f"{p}.{n}.weight"] = torch.ones(16)
            sd[f"{p}.{n}.bias"] = torch.zeros(16)
        sd[f"{p}.attn.to_qkv.weight"] = torch.randn(48, 16)
        sd[f"{p}.attn.to_qkv.bias"] = torch.randn(48)
        sd[f"{p}.attn.proj.weight"] = torch.randn(16, 16)
        sd[f"{p}.attn.proj.bias"] = torch.randn(16)
        sd[f"{p}.mlp.0.weight"] = torch.randn(32, 16)
        sd[f"{p}.mlp.0.bias"] = torch.randn(32)
        sd[f"{p}.mlp.2.weight"] = torch.randn(16, 32)
        sd[f"{p}.mlp.2.bias"] = torch.randn(16)
    params = jax.tree.map(jnp.asarray,
                          _full_coverage(E.convert_clip_vision_wan, sd, cfg))
    img = jnp.asarray(np.random.randn(1, 3, 28, 28), jnp.float32)
    feats = clip_lib.clip_vision_encode(params, cfg, img)
    assert feats.shape == (1, 5, 16)  # cls + 4 patches
    assert np.isfinite(np.asarray(feats)).all()


def test_xlm_roberta_wan_layout():
    cfg = xlmr_lib.XLMRobertaConfig(vocab_size=32, max_positions=20,
                                    dim=16, num_heads=2, num_layers=2,
                                    ffn_dim=32)
    sd = {"token_embedding.weight": torch.randn(32, 16),
          "type_embedding.weight": torch.randn(1, 16),
          "pos_embedding.weight": torch.randn(20, 16),
          "norm.weight": torch.ones(16),
          "norm.bias": torch.zeros(16)}
    for i in range(2):
        p = f"blocks.{i}"
        for n in "qkvo":
            sd[f"{p}.attn.{n}.weight"] = torch.randn(16, 16)
            sd[f"{p}.attn.{n}.bias"] = torch.randn(16)
        for n in ("norm1", "norm2"):
            sd[f"{p}.{n}.weight"] = torch.ones(16)
            sd[f"{p}.{n}.bias"] = torch.zeros(16)
        sd[f"{p}.ffn.0.weight"] = torch.randn(32, 16)
        sd[f"{p}.ffn.0.bias"] = torch.randn(32)
        sd[f"{p}.ffn.2.weight"] = torch.randn(16, 32)
        sd[f"{p}.ffn.2.bias"] = torch.randn(16)
    params = jax.tree.map(jnp.asarray,
                          _full_coverage(E.convert_xlm_roberta_wan, sd, cfg))
    ids = jnp.asarray(np.random.randint(2, 32, (1, 10)))
    states = xlmr_lib.xlm_roberta_encode(params, cfg, ids)
    assert states.shape == (1, 10, 16)
    assert np.isfinite(np.asarray(states)).all()
