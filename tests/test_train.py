"""Training scaffolding tests: transport math, LoRA, dataset, end-to-end
LoRA fine-tuning on a tiny model (loss must decrease)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jenga_tpu.train import (TransportConfig, apply_lora, init_lora,
                             make_lora_train_step, training_loss)
from jenga_tpu.train.transport import (interpolate, path_coefficients,
                                       sample_t)


class TestTransport:
    def test_linear_path_endpoints(self):
        cfg = TransportConfig(path_type="linear")
        x0 = jnp.ones((1, 4))      # noise
        x1 = jnp.full((1, 4), 3.0)  # data
        xt, ut = interpolate(cfg, jnp.array([0.0]), x0, x1)
        np.testing.assert_allclose(xt, x0)          # t=0 -> pure noise
        xt, ut = interpolate(cfg, jnp.array([1.0]), x0, x1)
        np.testing.assert_allclose(xt, x1)          # t=1 -> data
        np.testing.assert_allclose(ut, x1 - x0)     # constant velocity

    def test_reverse_linear_path(self):
        cfg = TransportConfig(path_type="linear", reverse=True)
        x0 = jnp.ones((1, 4))
        x1 = jnp.full((1, 4), 3.0)
        xt, ut = interpolate(cfg, jnp.array([0.0]), x0, x1)
        np.testing.assert_allclose(xt, x1)          # reverse: t=0 -> data
        np.testing.assert_allclose(ut, x0 - x1)

    def test_gvp_alpha_sigma_unit_norm(self):
        cfg = TransportConfig(path_type="gvp")
        t = jnp.linspace(0.0, 1.0, 7)
        a, _, s, _ = path_coefficients(cfg, t)
        np.testing.assert_allclose(a ** 2 + s ** 2, np.ones(7), atol=1e-6)

    def test_vp_coefficients_finite(self):
        cfg = TransportConfig(path_type="vp", train_eps=1e-5)
        t = jnp.linspace(1e-5, 1.0 - 1e-5, 9)
        vals = path_coefficients(cfg, t)
        for v in vals:
            assert np.isfinite(np.asarray(v)).all()

    def test_sample_t_shift_matches_reference_map(self):
        """shift s maps u -> u/(s-(s-1)u) (forward) — check the analytic
        mapping on a fixed uniform draw."""
        cfg0 = TransportConfig(shift=1.0)
        cfg7 = TransportConfig(shift=7.0)
        key = jax.random.PRNGKey(0)
        t_plain = sample_t(cfg0, key, 1000)
        t_shift = sample_t(cfg7, key, 1000)
        expected = t_plain / (7.0 - 6.0 * t_plain)
        np.testing.assert_allclose(np.asarray(t_shift),
                                   np.asarray(expected), atol=1e-6)
        # shift pushes mass toward low t (more high-noise steps)
        assert float(t_shift.mean()) < float(t_plain.mean())

    def test_lognorm_in_range(self):
        cfg = TransportConfig(snr_type="lognorm")
        t = sample_t(cfg, jax.random.PRNGKey(1), 512)
        assert float(t.min()) > 0.0 and float(t.max()) < 1.0

    def test_velocity_loss_zero_for_perfect_model(self):
        cfg = TransportConfig()
        x1 = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 3, 8, 8))
        captured = {}

        def model_fn(xt, t_model):
            # reconstruct the true velocity from the recorded aux
            return captured["ut"]

        # first pass to capture ut, then verify zero loss
        loss, aux = training_loss(cfg, lambda xt, t: jnp.zeros_like(xt),
                                  jax.random.PRNGKey(3), x1)
        captured["ut"] = aux["ut"]
        loss2, _ = training_loss(cfg, model_fn, jax.random.PRNGKey(3), x1)
        assert float(loss2.max()) < 1e-10
        assert float(loss.min()) > 0.0

    def test_token_replace_excludes_first_frame(self):
        cfg = TransportConfig()
        x1 = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 3, 4, 4))
        cond = x1[:, :, :1]
        seen = {}

        def model_fn(xt, t):
            seen["xt"] = xt
            return jnp.zeros_like(xt)

        loss, _ = training_loss(cfg, model_fn, jax.random.PRNGKey(5), x1,
                                i2v_condition_type="token_replace",
                                cond_latents=cond)
        # the model input's first frame is the clean conditioning latent
        np.testing.assert_allclose(np.asarray(seen["xt"][:, :, :1]),
                                   np.asarray(cond))

    def test_latent_concat_channels(self):
        cfg = TransportConfig()
        x1 = jax.random.normal(jax.random.PRNGKey(6), (1, 4, 3, 4, 4))
        seen = {}

        def model_fn(xt, t):
            seen["xt"] = xt
            return jnp.zeros((1, 4, 3, 4, 4))

        training_loss(cfg, model_fn, jax.random.PRNGKey(7), x1,
                      i2v_condition_type="latent_concat",
                      cond_latents=x1[:, :, :1])
        assert seen["xt"].shape[1] == 4 + 4 + 1   # xt + img latent + mask


class TestLora:
    def _params(self):
        from jenga_tpu.models.wan import WanConfig, init_wan_params
        cfg = WanConfig(dim=32, ffn_dim=64, freq_dim=16, num_heads=2,
                        num_layers=2, text_dim=16, text_len=4,
                        dtype="float32")
        return cfg, init_wan_params(jax.random.PRNGKey(0), cfg)

    def test_init_targets_attention_and_ffn(self):
        cfg, params = self._params()
        lora = init_lora(jax.random.PRNGKey(1), params, rank=4)
        assert "blocks/0/self_attn/q" in lora
        assert "blocks/1/ffn/fc2" in lora
        assert "patch_embedding" not in lora
        assert all(v["a"].shape[0] == 4 for v in lora.values())

    def test_zero_initial_delta(self):
        cfg, params = self._params()
        lora = init_lora(jax.random.PRNGKey(1), params, rank=4)
        merged = apply_lora(params, lora)
        w0 = params["blocks"][0]["self_attn"]["q"]["w"]
        w1 = merged["blocks"][0]["self_attn"]["q"]["w"]
        np.testing.assert_array_equal(np.asarray(w0), np.asarray(w1))

    def test_apply_changes_only_targets(self):
        cfg, params = self._params()
        lora = init_lora(jax.random.PRNGKey(1), params, rank=4)
        lora = jax.tree.map(lambda x: x + 0.1, lora)
        merged = apply_lora(params, lora, scale=2.0)
        assert not np.allclose(
            np.asarray(merged["blocks"][0]["self_attn"]["q"]["w"]),
            np.asarray(params["blocks"][0]["self_attn"]["q"]["w"]))
        np.testing.assert_array_equal(
            np.asarray(merged["patch_embedding"]["w"]),
            np.asarray(params["patch_embedding"]["w"]))

    def test_kohya_export_merge_roundtrip(self):
        """Adapters exported to kohya load through convert.merge_lora and
        produce the same delta as apply_lora."""
        torch = pytest.importorskip("torch")
        from jenga_tpu.convert import merge_lora
        from jenga_tpu.train.lora import export_kohya

        key = jax.random.PRNGKey(2)
        w = jax.random.normal(key, (16, 24))      # ours: [in, out]
        params = {"double_blocks": [{"img_qkv": {"w": w}}]}
        lora = init_lora(jax.random.PRNGKey(3), params, rank=2)
        lora = jax.tree.map(
            lambda x: x + 0.05 * jnp.ones_like(x), lora)
        merged_ours = apply_lora(params, lora)

        kohya = {k: torch.from_numpy(np.asarray(v))
                 for k, v in export_kohya(lora).items()}
        sd = {"double_blocks.0.img_qkv.weight":
              torch.from_numpy(np.asarray(w).T.copy())}  # torch: [out, in]
        merged_ref = merge_lora(sd, kohya, prefix="Hunyuan_video_I2V")
        np.testing.assert_allclose(
            merged_ref["double_blocks.0.img_qkv.weight"].numpy().T,
            np.asarray(merged_ours["double_blocks"][0]["img_qkv"]["w"]),
            atol=1e-5)


class TestDataset:
    def test_bucketing_and_batches(self, tmp_path):
        from jenga_tpu.train.dataset import LatentDataset
        jdir = tmp_path / "jsons"
        jdir.mkdir()
        for i, shape in enumerate([(4, 2, 8, 8), (4, 2, 8, 8),
                                   (4, 2, 4, 4)]):
            lat = np.random.randn(*shape).astype(np.float32)
            npy = str(tmp_path / f"{i}.npy")
            np.save(npy, lat)
            (jdir / f"{i}.json").write_text(json.dumps({
                "video_id": f"v{i}", "latent_shape": list(shape),
                "prompt": f"p{i}", "npy_save_path": npy}))
        ds = LatentDataset(str(jdir))
        assert len(ds) == 3
        assert len(ds.buckets()) == 2
        batches = list(ds.batches(2, np.random.default_rng(0)))
        assert len(batches) == 1     # 4x4 bucket dropped (remainder)
        assert batches[0]["latents"].shape == (2, 4, 2, 8, 8)


def test_lora_finetune_loss_decreases():
    """End-to-end: LoRA fine-tune a tiny Wan DiT on one fixed batch with a
    fixed t/noise draw; the loss must drop substantially."""
    import optax
    from jenga_tpu.models.wan import WanConfig, init_wan_params, wan_forward

    cfg = WanConfig(dim=32, ffn_dim=64, freq_dim=16, num_heads=2,
                    num_layers=2, text_dim=16, text_len=4, dtype="float32")
    base = init_wan_params(jax.random.PRNGKey(0), cfg)
    # the production head is zero-init (pretrained checkpoints overwrite
    # it); a random-init test model needs a live head for gradients to
    # reach the trunk LoRA
    base["head"]["linear"]["w"] = jax.random.normal(
        jax.random.PRNGKey(9), base["head"]["linear"]["w"].shape) * 0.1
    tcfg = TransportConfig(shift=7.0)

    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 4, cfg.text_dim))
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(2),
                                     (2, 16, 2, 8, 8)),
        "context": jnp.pad(ctx, ((0, 0), (0, 0), (0, 0))),
    }

    def model_apply(params, xt, t, b):
        ctx_pad = jnp.pad(b["context"],
                          ((0, 0), (0, cfg.text_len - 4), (0, 0)))
        return wan_forward(params, cfg, xt, t, ctx_pad)

    lora = init_lora(jax.random.PRNGKey(3), base, rank=4)
    opt = optax.adamw(3e-2)
    opt_state = opt.init(lora)
    step = make_lora_train_step(model_apply, tcfg, opt)

    key = jax.random.PRNGKey(4)   # FIXED key: overfit one (t, noise) draw
    losses = []
    for i in range(40):
        lora, opt_state, loss = step(lora, opt_state, base, batch, key)
        losses.append(float(loss))
    # rank-4 LoRA on a random 2-layer base has a high loss floor; the
    # signal is a substantial, steady decrease (grads flow end-to-end)
    assert losses[-1] < 0.8 * losses[0], (losses[0], losses[-1])
    assert min(losses[-5:]) <= min(losses)  # still improving at the end


def test_remat_forward_matches_and_grads_flow():
    """jax.checkpoint'd trunk gives identical outputs and works under grad
    (the memory/FLOPs trade for fine-tuning at video lengths)."""
    from jenga_tpu.models.wan import WanConfig, init_wan_params, wan_forward

    cfg = WanConfig(dim=32, ffn_dim=64, freq_dim=16, num_heads=2,
                    num_layers=2, text_dim=16, text_len=4, dtype="float32")
    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 2, 8, 8))
    t = jnp.array([500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 16))

    out = wan_forward(params, cfg, x, t, ctx)
    out_r = wan_forward(params, cfg, x, t, ctx, remat=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r),
                               atol=1e-5, rtol=1e-5)

    def loss(p):
        return jnp.mean(wan_forward(p, cfg, x, t, ctx, remat=True) ** 2)

    g = jax.grad(loss)(params)
    gn = np.asarray(jnp.linalg.norm(g["blocks"][0]["ffn"]["fc1"]["w"]))
    assert np.isfinite(gn)


def test_pipeline_seed_determinism():
    """Same options + seed -> bit-identical latents across runs."""
    from jenga_tpu.models.wan import WanConfig, init_wan_params
    from jenga_tpu.pipelines.wan_t2v import WanT2VOptions, WanT2VPipeline

    cfg = WanConfig(dim=64, ffn_dim=128, freq_dim=32, num_heads=2,
                    num_layers=1, text_dim=32, text_len=8, dtype="float32")
    pipe = WanT2VPipeline(cfg, init_wan_params(jax.random.PRNGKey(0), cfg))
    opts = WanT2VOptions(size=(64, 64), frame_num=5, sampling_steps=2,
                         teacache_thresh=None, seed=123)
    ctx = jnp.zeros((8, cfg.text_dim))
    a = np.asarray(pipe.generate(ctx, ctx, opts, decode=False))
    b = np.asarray(pipe.generate(ctx, ctx, opts, decode=False))
    np.testing.assert_array_equal(a, b)
