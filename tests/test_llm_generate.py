"""Autoregressive generation (KV cache) vs HF transformers, and the local
prompt expander end-to-end on a synthetic checkpoint."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from jenga_tpu.convert.encoders import convert_llama
from jenga_tpu.text.llama import LlamaConfig, llama_generate, llama_prefill


def _tiny_lm(vocab=64, qkv_bias=False, tie=True):
    from transformers import LlamaConfig as HFCfg, LlamaForCausalLM
    hf_cfg = HFCfg(vocab_size=vocab, hidden_size=32, intermediate_size=64,
                   num_hidden_layers=2, num_attention_heads=4,
                   num_key_value_heads=2, rope_theta=10000.0,
                   rms_norm_eps=1e-5, attention_bias=qkv_bias,
                   tie_word_embeddings=tie)
    torch.manual_seed(0)
    return LlamaForCausalLM(hf_cfg).eval()


def _our_cfg(vocab=64):
    return LlamaConfig(vocab_size=vocab, hidden_size=32,
                       intermediate_size=64, num_layers=2, num_heads=4,
                       num_kv_heads=2, rope_theta=10000.0, rms_eps=1e-5,
                       dtype="float32")


def test_greedy_generate_matches_hf():
    model = _tiny_lm()
    cfg = _our_cfg()
    params = jax.tree.map(jnp.asarray,
                          convert_llama(model.state_dict(), cfg))
    torch.manual_seed(1)
    ids = torch.randint(0, 64, (1, 7))
    with torch.no_grad():
        hf_out = model.generate(ids, max_new_tokens=8, do_sample=False,
                                eos_token_id=None,
                                pad_token_id=0).numpy()[0, 7:]
    ours = llama_generate(params, cfg, jnp.asarray(ids.numpy()),
                          jnp.ones((1, 7), jnp.int32), max_new_tokens=8)
    assert ours[0] == hf_out.tolist()


def test_greedy_generate_matches_hf_qwen_style_bias():
    """attention_bias=True exercises the Qwen2-style qkv biases."""
    model = _tiny_lm(qkv_bias=True, tie=False)
    cfg = _our_cfg()
    params = jax.tree.map(jnp.asarray,
                          convert_llama(model.state_dict(), cfg))
    assert "lm_head" in params          # untied head converted
    assert "b" in params["blocks"][0]["q"]   # bias picked up
    torch.manual_seed(2)
    ids = torch.randint(0, 64, (1, 5))
    with torch.no_grad():
        hf_out = model.generate(ids, max_new_tokens=6, do_sample=False,
                                eos_token_id=None,
                                pad_token_id=0).numpy()[0, 5:]
    ours = llama_generate(params, cfg, jnp.asarray(ids.numpy()),
                          jnp.ones((1, 5), jnp.int32), max_new_tokens=6)
    assert ours[0] == hf_out.tolist()


def test_qwen2_architecture_matches_hf():
    """The reference's local expanders are actual Qwen2.5 checkpoints
    (`/root/reference/wan/utils/prompt_extend.py:235-545`). Qwen2 = llama
    with q/k/v biases but NO o_proj bias, rope_theta 1e6 — convert the
    real HF ``Qwen2ForCausalLM`` class and pin greedy generation plus
    prefill logits (VERDICT r3 missing-2)."""
    from transformers import Qwen2Config, Qwen2ForCausalLM
    qcfg = Qwen2Config(vocab_size=64, hidden_size=32, intermediate_size=64,
                       num_hidden_layers=2, num_attention_heads=4,
                       num_key_value_heads=2, rope_theta=1000000.0,
                       rms_norm_eps=1e-6, tie_word_embeddings=True)
    torch.manual_seed(5)
    model = Qwen2ForCausalLM(qcfg).eval()
    cfg = LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                      num_layers=2, num_heads=4, num_kv_heads=2,
                      rope_theta=1000000.0, rms_eps=1e-6, dtype="float32")
    params = jax.tree.map(jnp.asarray,
                          convert_llama(model.state_dict(), cfg))
    blk = params["blocks"][0]
    assert "b" in blk["q"] and "b" in blk["k"] and "b" in blk["v"]
    assert "b" not in blk["o"]          # Qwen2 o_proj has no bias
    if "lm_head" in params:             # HF materializes the tied head
        np.testing.assert_array_equal(np.asarray(params["lm_head"]["w"]),
                                      np.asarray(params["embed"]).T)

    torch.manual_seed(6)
    ids = torch.randint(0, 64, (1, 6))
    with torch.no_grad():
        hf_out = model.generate(ids, max_new_tokens=8, do_sample=False,
                                eos_token_id=None,
                                pad_token_id=0).numpy()[0, 6:]
        hf_logits = model(input_ids=ids).logits
    ours = llama_generate(params, cfg, jnp.asarray(ids.numpy()),
                          jnp.ones((1, 6), jnp.int32), max_new_tokens=8)
    assert ours[0] == hf_out.tolist()
    logits, _, _ = llama_prefill(params, cfg, jnp.asarray(ids.numpy()),
                                 jnp.ones((1, 6), jnp.int32), max_len=16)
    np.testing.assert_allclose(np.asarray(logits[0]),
                               hf_logits[0, -1].numpy(), atol=2e-4,
                               rtol=2e-3)


def test_local_expander_loads_qwen2_checkpoint_dir(tmp_path):
    """LocalLLMExpander reads a Qwen2 ``config.json`` (the reference's
    expander model format) and generates through the JAX LM."""
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import Qwen2Config, Qwen2ForCausalLM
    from jenga_tpu.text.prompt_extend import (LocalLLMExpander,
                                              PromptExpander)

    qcfg = Qwen2Config(vocab_size=64, hidden_size=32, intermediate_size=64,
                       num_hidden_layers=2, num_attention_heads=4,
                       num_key_value_heads=2, rope_theta=1000000.0,
                       rms_norm_eps=1e-6, tie_word_embeddings=True)
    torch.manual_seed(7)
    Qwen2ForCausalLM(qcfg).eval().save_pretrained(str(tmp_path))
    vocab = {f"w{i}": i for i in range(62)}
    vocab["<pad>"] = 62
    vocab["<unk>"] = 63
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.save(str(tmp_path / "tokenizer.json"))
    (tmp_path / "tokenizer_config.json").write_text(json.dumps(
        {"tokenizer_class": "PreTrainedTokenizerFast",
         "pad_token": "<pad>", "unk_token": "<unk>", "eos_token": "<pad>",
         "model_max_length": 512}))

    exp = LocalLLMExpander(str(tmp_path), max_new_tokens=4)
    assert exp.cfg.rope_theta == 1000000.0
    assert "b" in exp.params["blocks"][0]["q"]
    out = PromptExpander(chat_fn=exp, mode="t2v")("w1 w2 w3")
    assert isinstance(out, str) and len(out) > 0


def test_prefill_logits_match_hf():
    model = _tiny_lm()
    cfg = _our_cfg()
    params = jax.tree.map(jnp.asarray,
                          convert_llama(model.state_dict(), cfg))
    torch.manual_seed(3)
    ids = torch.randint(0, 64, (2, 6))
    mask = torch.ones(2, 6, dtype=torch.long)
    mask[1, 4:] = 0
    with torch.no_grad():
        hf_logits = model(input_ids=ids, attention_mask=mask).logits
    logits, cache, lengths = llama_prefill(
        params, cfg, jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy()),
        max_len=16)
    np.testing.assert_allclose(np.asarray(logits[0]),
                               hf_logits[0, -1].numpy(), atol=2e-4,
                               rtol=2e-3)
    np.testing.assert_allclose(np.asarray(logits[1]),
                               hf_logits[1, 3].numpy(), atol=2e-4,
                               rtol=2e-3)
    assert np.asarray(lengths).tolist() == [6, 4]


def test_local_llm_expander_end_to_end(tmp_path):
    """LocalLLMExpander drives a saved tiny checkpoint through the chat
    template + generate path."""
    from tokenizers import Tokenizer, models, pre_tokenizers
    from jenga_tpu.text.prompt_extend import (LocalLLMExpander,
                                              PromptExpander)

    model = _tiny_lm()
    model.save_pretrained(str(tmp_path))
    vocab = {f"w{i}": i for i in range(62)}
    vocab["<pad>"] = 62
    vocab["<unk>"] = 63
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.save(str(tmp_path / "tokenizer.json"))
    (tmp_path / "tokenizer_config.json").write_text(json.dumps(
        {"tokenizer_class": "PreTrainedTokenizerFast",
         "pad_token": "<pad>", "unk_token": "<unk>", "eos_token": "<pad>",
         "model_max_length": 512}))

    exp = LocalLLMExpander(str(tmp_path), max_new_tokens=4)
    out = PromptExpander(chat_fn=exp, mode="t2v")("w1 w2 w3")
    assert isinstance(out, str) and len(out) > 0

# ------------------------------------------------------- API expander

def test_api_expander_openai_dialect():
    """APIExpander posts an OpenAI-compatible chat request and parses the
    ``choices`` response (reference DashScopePromptExpander,
    `/root/reference/wan/utils/prompt_extend.py:101-161`)."""
    from jenga_tpu.text.prompt_extend import APIExpander, PromptExpander

    seen = {}

    def transport(url, headers, body, timeout):
        seen.update(url=url, headers=headers, body=json.loads(body))
        return json.dumps({"choices": [{"message": {
            "content": "  an expanded prompt  "}}]}).encode()

    exp = APIExpander(model="qwen-plus", url="https://x/v1/chat",
                      api_key="sk-test", transport=transport)
    out = PromptExpander(chat_fn=exp, mode="t2v")("a cat")
    assert out == "an expanded prompt"
    assert seen["url"] == "https://x/v1/chat"
    assert seen["headers"]["Authorization"] == "Bearer sk-test"
    assert seen["body"]["model"] == "qwen-plus"
    roles = [m["role"] for m in seen["body"]["messages"]]
    assert roles == ["system", "user"]
    assert seen["body"]["messages"][1]["content"] == "a cat"


def test_api_expander_dashscope_dialect_and_retry():
    """Native DashScope response shapes (output.choices / output.text)
    parse too, and a failing attempt is retried like the reference."""
    from jenga_tpu.text.prompt_extend import APIExpander

    calls = {"n": 0}

    def flaky(url, headers, body, timeout):
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("connection reset")
        return json.dumps({"output": {"text": "ds text"}}).encode()

    exp = APIExpander(transport=flaky, retries=3)
    assert exp("sys", "user") == "ds text"
    assert calls["n"] == 2

    exp2 = APIExpander(transport=lambda *a: json.dumps(
        {"output": {"choices": [{"message": {"content": "dc"}}]}}).encode())
    assert exp2("sys", "user") == "dc"

    import pytest
    exp3 = APIExpander(transport=lambda *a: (_ for _ in ()).throw(
        OSError("down")), retries=2)
    with pytest.raises(RuntimeError, match="after 2 attempts"):
        exp3("sys", "user")


def test_api_expander_image_content():
    """An image becomes a base64 data-URL content part (multimodal
    message), mirroring the reference's VL API path."""
    import numpy as np
    from jenga_tpu.text.prompt_extend import APIExpander

    seen = {}

    def transport(url, headers, body, timeout):
        seen.update(body=json.loads(body))
        return json.dumps({"choices": [{"message": {
            "content": "grounded"}}]}).encode()

    img = np.zeros((3, 8, 8), np.uint8)
    exp = APIExpander(transport=transport)
    assert exp("sys", "user text", image=img) == "grounded"
    content = seen["body"]["messages"][1]["content"]
    assert content[0] == {"type": "text", "text": "user text"}
    assert content[1]["type"] == "image_url"
    assert content[1]["image_url"]["url"].startswith("data:image/png;base64,")
