"""Text encoder tests on tiny configs (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from jenga_tpu.text import apply_hyvideo_template, crop_encoder_output
from jenga_tpu.text.clip import (
    CLIPTextConfig,
    CLIPVisionConfig,
    clip_text_encode,
    clip_vision_encode,
    init_clip_text_params,
    init_clip_vision_params,
)
from jenga_tpu.text.llama import LlamaConfig, init_llama_params, \
    llama_hidden_states
from jenga_tpu.text.t5 import (
    T5Config,
    init_t5_params,
    relative_position_bucket,
    t5_encode,
)

TINY_LLAMA = LlamaConfig(vocab_size=100, hidden_size=64,
                         intermediate_size=128, num_layers=3, num_heads=4,
                         num_kv_heads=2, dtype="float32")
TINY_T5 = T5Config(vocab_size=100, dim=64, dim_attn=64, dim_ffn=128,
                   num_heads=4, num_layers=2, dtype="float32")
TINY_CLIP = CLIPTextConfig(vocab_size=100, hidden_size=32,
                           intermediate_size=64, num_layers=2, num_heads=2,
                           max_positions=16, eos_token_id=99)


class TestLlama:
    def test_hidden_states_depth_and_shape(self):
        params = init_llama_params(jax.random.PRNGKey(0), TINY_LLAMA)
        ids = jnp.arange(12).reshape(1, 12) % 100
        mask = jnp.ones((1, 12), jnp.int32)
        states = llama_hidden_states(params, TINY_LLAMA, ids, mask)
        assert len(states) == TINY_LLAMA.num_layers + 1
        assert states[-1].shape == (1, 12, 64)

    def test_truncated_depth_matches_full(self):
        params = init_llama_params(jax.random.PRNGKey(0), TINY_LLAMA)
        ids = jnp.arange(8).reshape(1, 8) % 100
        mask = jnp.ones((1, 8), jnp.int32)
        full = llama_hidden_states(params, TINY_LLAMA, ids, mask)
        trunc = llama_hidden_states(params, TINY_LLAMA, ids, mask,
                                    num_layers=2)
        np.testing.assert_allclose(np.asarray(full[2]), np.asarray(trunc[2]),
                                   atol=1e-6)

    def test_causality(self):
        params = init_llama_params(jax.random.PRNGKey(1), TINY_LLAMA)
        ids = jnp.arange(8).reshape(1, 8) % 100
        ids2 = ids.at[0, -1].set(7)
        mask = jnp.ones((1, 8), jnp.int32)
        a = llama_hidden_states(params, TINY_LLAMA, ids, mask)[-1]
        b = llama_hidden_states(params, TINY_LLAMA, ids2, mask)[-1]
        np.testing.assert_allclose(np.asarray(a[:, :-1]),
                                   np.asarray(b[:, :-1]), atol=1e-5)


class TestT5:
    def test_bucket_properties(self):
        rel = np.arange(-200, 200)
        b = relative_position_bucket(rel, 32, 128)
        assert b.min() >= 0 and b.max() < 32
        assert b[200] == 0  # rel_pos == 0
        # monotone in |distance| within each direction
        neg = b[:200][::-1]
        assert (np.diff(neg.astype(int)) >= 0).all()

    def test_encode_shapes_and_mask(self):
        params = init_t5_params(jax.random.PRNGKey(0), TINY_T5)
        ids = jnp.arange(10).reshape(1, 10) % 100
        mask = jnp.ones((1, 10), jnp.int32).at[0, 7:].set(0)
        out = t5_encode(params, TINY_T5, ids, mask)
        assert out.shape == (1, 10, 64)
        assert np.isfinite(np.asarray(out)).all()
        # padding token content must not affect valid positions
        ids2 = ids.at[0, 8].set(55)
        out2 = t5_encode(params, TINY_T5, ids2, mask)
        np.testing.assert_allclose(np.asarray(out[:, :7]),
                                   np.asarray(out2[:, :7]), atol=1e-5)


class TestCLIP:
    def test_text_pooled_at_eos(self):
        params = init_clip_text_params(jax.random.PRNGKey(0), TINY_CLIP)
        ids = jnp.array([[5, 6, 7, 99, 0, 0]])
        states, pooled = clip_text_encode(params, TINY_CLIP, ids)
        assert states.shape == (1, 6, 32)
        np.testing.assert_allclose(np.asarray(pooled)[0],
                                   np.asarray(states[0, 3]), atol=1e-6)

    def test_vision_tokens(self):
        cfg = CLIPVisionConfig(image_size=28, patch_size=14, hidden_size=32,
                               intermediate_size=64, num_layers=2,
                               num_heads=2)
        params = init_clip_vision_params(jax.random.PRNGKey(1), cfg)
        img = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 28, 28))
        out = clip_vision_encode(params, cfg, img)
        assert out.shape == (1, 5, 32)  # cls + 4 patches


def test_template_and_crop():
    s = apply_hyvideo_template("a cat", mode="video")
    assert "a cat" in s and s.startswith("<|start_header_id|>")
    h = np.zeros((1, 100, 8))
    m = np.ones((1, 100))
    h2, m2 = crop_encoder_output(h, m, mode="video")
    assert h2.shape[1] == 100 - 95


def test_xlm_roberta_encode():
    from jenga_tpu.text.xlm_roberta import (XLMRobertaConfig,
                                            init_xlm_roberta_params,
                                            xlm_roberta_encode)
    cfg = XLMRobertaConfig(vocab_size=50, max_positions=32, dim=32,
                           num_heads=2, num_layers=2, ffn_dim=64)
    params = init_xlm_roberta_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.array([[5, 6, 7, 1, 1, 1]])  # pad_id = 1
    out = xlm_roberta_encode(params, cfg, ids)
    assert out.shape == (1, 6, 32)
    # padding content must not leak into valid positions
    ids2 = ids.at[0, 4].set(9).at[0, 4].set(1)  # still padding
    out2 = xlm_roberta_encode(params, cfg, ids2)
    np.testing.assert_allclose(np.asarray(out[:, :3]),
                               np.asarray(out2[:, :3]), atol=1e-5)
