"""Llava multimodal encoder (HY-I2V conditioning) vs HF transformers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from jenga_tpu.convert.encoders import convert_llava
from jenga_tpu.text import llama as llama_lib
from jenga_tpu.text.clip import CLIPVisionConfig
from jenga_tpu.text.llava import extract_i2v_tokens, llava_encode
from jenga_tpu.text import llava as extract_mod


def _tiny_hf_llava():
    from transformers import (CLIPVisionConfig as HFVis, LlamaConfig,
                              LlavaConfig, LlavaForConditionalGeneration)
    vis = HFVis(hidden_size=32, intermediate_size=64, num_hidden_layers=3,
                num_attention_heads=4, image_size=28, patch_size=14,
                num_channels=3)
    txt = LlamaConfig(vocab_size=64, hidden_size=48, intermediate_size=96,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, rope_theta=500000.0,
                      rms_norm_eps=1e-5)
    cfg = LlavaConfig(vision_config=vis, text_config=txt,
                      image_token_index=63,
                      vision_feature_layer=-2,
                      vision_feature_select_strategy="default")
    torch.manual_seed(0)
    return LlavaForConditionalGeneration(cfg).eval()


def test_llava_matches_transformers():
    model = _tiny_hf_llava()
    n_patches = (28 // 14) ** 2   # 4
    pos = 3                       # <image> token position in the template
    torch.manual_seed(1)
    pixels = torch.randn(1, 3, 28, 28)

    # HF expects one placeholder per patch; ours expands a single token.
    base_ids = torch.randint(0, 62, (1, 10))
    hf_ids = torch.cat([base_ids[:, :pos],
                        torch.full((1, n_patches), 63),
                        base_ids[:, pos + 1:]], dim=1)
    mask_hf = torch.ones_like(hf_ids)
    with torch.no_grad():
        out = model(input_ids=hf_ids, attention_mask=mask_hf,
                    pixel_values=pixels, output_hidden_states=True)

    llm_cfg = llama_lib.LlamaConfig(
        vocab_size=64, hidden_size=48, intermediate_size=96, num_layers=2,
        num_heads=4, num_kv_heads=2, rope_theta=500000.0, dtype="float32")
    vis_cfg = CLIPVisionConfig(image_size=28, patch_size=14, hidden_size=32,
                               intermediate_size=64, num_layers=3,
                               num_heads=4, act="quick_gelu")
    params = jax.tree.map(jnp.asarray,
                          convert_llava(model.state_dict(), llm_cfg,
                                        vis_cfg))
    states, mask = llava_encode(
        params, llm_cfg, jnp.asarray(base_ids.numpy()),
        jnp.ones((1, 10), jnp.int32), jnp.asarray(pixels.numpy()),
        image_token_pos=pos, vision_cfg=vis_cfg)
    ours = np.asarray(states[-1])
    ref = out.hidden_states[-1].numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=5e-4)


def test_extract_i2v_tokens_geometry():
    """Strided image tokens + cropped text tokens, reference constants
    (image [5:581:interleave], text from crop_start-1+576)."""
    L = 581 + 40
    hidden = np.arange(L, dtype=np.float32)[None, :, None]
    mask = np.ones((1, L), np.int32)
    h, m = extract_i2v_tokens(hidden, mask, mode="image",
                              image_embed_interleave=4)
    n_img = len(range(5, 581, 4))
    text_start = 36 - 1 + 576
    assert h.shape[1] == n_img + (L - text_start)
    assert h[0, 0, 0] == 5.0                  # first strided image token
    assert h[0, n_img, 0] == float(text_start)  # first text token
    assert m.shape[1] == h.shape[1]


def test_extract_video_mode_crop():
    L = 581 + 200
    hidden = np.zeros((1, L, 2), np.float32)
    mask = np.ones((1, L), np.int32)
    h, _ = extract_i2v_tokens(hidden, mask, mode="video",
                              image_embed_interleave=2)
    n_img = len(range(5, 581, 2))
    assert h.shape[1] == n_img + (L - (103 - 1 + 576))


def test_llava_greedy_generate_matches_hf():
    """Multimodal prefill (spliced image embeds) + KV-cache greedy decode
    vs HF ``LlavaForConditionalGeneration.generate`` — the LocalVLExpander
    compute path (`/root/reference/wan/utils/prompt_extend.py:437-520`
    is the torch QwenVL counterpart)."""
    from jenga_tpu.text.llava import llava_splice

    model = _tiny_hf_llava()
    n_patches = 4
    pos = 3
    torch.manual_seed(2)
    pixels = torch.randn(1, 3, 28, 28)
    base_ids = torch.randint(0, 62, (1, 9))
    hf_ids = torch.cat([base_ids[:, :pos],
                        torch.full((1, n_patches), 63),
                        base_ids[:, pos + 1:]], dim=1)
    with torch.no_grad():
        ref = model.generate(input_ids=hf_ids,
                             attention_mask=torch.ones_like(hf_ids),
                             pixel_values=pixels, max_new_tokens=8,
                             do_sample=False)
    ref_new = ref[0, hf_ids.shape[1]:].tolist()

    llm_cfg = llama_lib.LlamaConfig(
        vocab_size=64, hidden_size=48, intermediate_size=96, num_layers=2,
        num_heads=4, num_kv_heads=2, rope_theta=500000.0, dtype="float32")
    vis_cfg = CLIPVisionConfig(image_size=28, patch_size=14, hidden_size=32,
                               intermediate_size=64, num_layers=3,
                               num_heads=4, act="quick_gelu")
    params = jax.tree.map(jnp.asarray,
                          convert_llava(model.state_dict(), llm_cfg,
                                        vis_cfg))
    embeds, mask = llava_splice(
        params, jnp.asarray(base_ids.numpy()), jnp.ones((1, 9), jnp.int32),
        jnp.asarray(pixels.numpy()), image_token_pos=pos,
        vision_cfg=vis_cfg)
    ours = llama_lib.llama_generate(params["llm"], llm_cfg, None, mask,
                                    max_new_tokens=8,
                                    inputs_embeds=embeds)[0]
    assert ours == ref_new


def test_local_vl_expander_end_to_end(tmp_path):
    """LocalVLExpander: llava dir on disk -> image-grounded expansion
    (multimodal prefill + decode). Checks dir loading (config-driven
    vision cfg), <image> token splice, and that the image actually
    conditions the output."""
    import json

    from tokenizers import Tokenizer, models, pre_tokenizers
    from jenga_tpu.text.prompt_extend import LocalVLExpander, PromptExpander

    model = _tiny_hf_llava()
    model.save_pretrained(str(tmp_path))
    vocab = {f"w{i}": i for i in range(62)}
    vocab["<pad>"] = 62
    vocab["<image>"] = 63
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<pad>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.add_special_tokens(["<image>"])
    tok.save(str(tmp_path / "tokenizer.json"))
    (tmp_path / "tokenizer_config.json").write_text(json.dumps(
        {"tokenizer_class": "PreTrainedTokenizerFast",
         "pad_token": "<pad>", "unk_token": "<pad>", "eos_token": "<pad>",
         "model_max_length": 512}))

    exp = LocalVLExpander(str(tmp_path), max_new_tokens=4)
    assert exp.vision_cfg.image_size == 28    # from config.json, not 336
    rng = np.random.default_rng(0)
    img_a = rng.random((3, 16, 16), np.float32)
    out = PromptExpander(chat_fn=exp, mode="vl")("w1 w2 w3", image=img_a)
    assert isinstance(out, str) and len(out) > 0

    # a different image must change the multimodal prefill embeddings
    from jenga_tpu.text.llava import llava_splice
    ids = jnp.asarray([[1, 63, 2]])
    m = jnp.ones((1, 3), jnp.int32)
    ea, _ = llava_splice(exp.params, ids, m,
                         jnp.asarray(exp._pixel_values(img_a)), 1,
                         vision_cfg=exp.vision_cfg)
    img_b = rng.random((3, 16, 16), np.float32) * 10 - 5
    eb, _ = llava_splice(exp.params, ids, m,
                         jnp.asarray(exp._pixel_values(img_b)), 1,
                         vision_cfg=exp.vision_cfg)
    assert float(jnp.max(jnp.abs(ea - eb))) > 1e-4

    with pytest.raises(ValueError):
        exp("sys", "w1 w2 w3")   # image required


def test_extract_i2v_assistant_crop():
    """With token_ids given, the 4 assistant-header tokens before the LAST
    double-return token (id 271) are cropped out of the text span
    (reference `/root/reference/hyvideo_i2v/text_encoder/__init__.py:
    425-439`)."""
    info = extract_mod.I2V_TEMPLATE_INFO["image"]
    crop, emb_len = info["crop_start"], info["image_emb_len"]
    S = 160                                    # unspliced token count
    spliced_len = S - 1 + emb_len
    hidden = np.arange(spliced_len, dtype=np.float32)[None, :, None]
    mask = np.ones((1, spliced_len), np.int64)
    ids = np.zeros((1, S), np.int64)
    ids[0, 10] = 271                           # earlier double-return
    last = 150
    ids[0, last] = 271                         # the LAST one
    h, m = extract_mod.extract_i2v_tokens(
        hidden, mask, mode="image", image_embed_interleave=4,
        token_ids=ids)
    n_img = len(range(info["image_emb_start"], info["image_emb_end"], 4))
    txt = h[0, n_img:, 0].astype(int)
    text_start = crop - 1 + emb_len
    acs = last + emb_len - 1 - 4
    ace = last + emb_len - 1
    expect = list(range(text_start, acs)) + list(range(ace, spliced_len))
    assert txt.tolist() == expect              # exactly 4 positions removed
    assert h.shape[1] == m.shape[1]


def test_extract_i2v_truncated_prompt_falls_back_to_seq_end():
    """Video mode expects 4 double-return hits; a truncated prompt (3 hits,
    the assistant header's final one cut) anchors the crop at the sequence
    end instead of an earlier hit (reference `__init__.py:411-420`)."""
    info = extract_mod.I2V_TEMPLATE_INFO["video"]
    crop, emb_len = info["crop_start"], info["image_emb_len"]
    S = 200
    spliced_len = S - 1 + emb_len
    hidden = np.arange(spliced_len, dtype=np.float32)[None, :, None]
    mask = np.ones((1, spliced_len), np.int64)
    ids = np.zeros((1, S), np.int64)
    for pos in (10, 40, 90):                   # only 3 hits (truncated)
        ids[0, pos] = 271
    h, _ = extract_mod.extract_i2v_tokens(
        hidden, mask, mode="video", image_embed_interleave=4,
        token_ids=ids)
    n_img = len(range(info["image_emb_start"], info["image_emb_end"], 4))
    txt = h[0, n_img:, 0].astype(int)
    text_start = crop - 1 + emb_len
    acs = S + emb_len - 1 - 4                  # anchored at sequence end
    expect = list(range(text_start, acs))      # the final 4 are cropped
    assert txt.tolist() == expect
