"""Numerical parity against the ACTUAL reference implementation.

Loads the reference's torch ``WanModel`` (dense path) from
``/root/reference`` — with test-side shims for its CUDA-only deps
(easydict/diffusers stubs, SDPA instead of flash-attn) — initializes a
tiny model, converts its state dict through ``jenga_tpu.convert``, and
asserts our JAX forward reproduces the torch forward at f32 precision.
This is the end-to-end fidelity check the whole rebuild is measured by;
it skips automatically when the reference tree is absent.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "wan", "modules")),
    reason="reference tree not available")


def _install_stubs():
    """Shim the reference's import-time deps that aren't in this image."""
    if "easydict" not in sys.modules:
        m = types.ModuleType("easydict")

        class EasyDict(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

            def __setattr__(self, k, v):
                self[k] = v

        m.EasyDict = EasyDict
        sys.modules["easydict"] = m
    if "diffusers" not in sys.modules:
        diff = types.ModuleType("diffusers")
        cu = types.ModuleType("diffusers.configuration_utils")
        mu = types.ModuleType("diffusers.models.modeling_utils")
        models = types.ModuleType("diffusers.models")

        class ConfigMixin:
            pass

        class ModelMixin(torch.nn.Module):
            pass

        def register_to_config(fn):
            return fn

        cu.ConfigMixin = ConfigMixin
        cu.register_to_config = register_to_config
        mu.ModelMixin = ModelMixin
        models.ModelMixin = ModelMixin
        diff.configuration_utils = cu
        models.modeling_utils = mu
        diff.models = models
        sys.modules["diffusers"] = diff
        sys.modules["diffusers.configuration_utils"] = cu
        sys.modules["diffusers.models"] = models
        sys.modules["diffusers.models.modeling_utils"] = mu
    if "ftfy" not in sys.modules:
        import importlib.machinery
        ftfy = types.ModuleType("ftfy")
        ftfy.fix_text = lambda s: s
        ftfy.__spec__ = importlib.machinery.ModuleSpec("ftfy", None)
        sys.modules["ftfy"] = ftfy
    if "torchvision" not in sys.modules:
        import importlib.machinery
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
        tr.__spec__ = importlib.machinery.ModuleSpec(
            "torchvision.transforms", None)
        tv.transforms = tr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
    # t5.py evaluates torch.cuda.current_device() in a default arg at
    # class-definition time; make it import on CPU
    if not torch.cuda.is_available():
        torch.cuda.current_device = lambda: "cpu"


def _load_reference_wan():
    """Import wan/modules/{attention,model}.py WITHOUT executing
    wan/__init__ (which pulls the triton kernel files)."""
    _install_stubs()
    pkg = types.ModuleType("refwan_modules")
    pkg.__path__ = [os.path.join(REF, "wan", "modules")]
    sys.modules["refwan_modules"] = pkg

    def load(name, fname):
        spec = importlib.util.spec_from_file_location(
            f"refwan_modules.{name}",
            os.path.join(REF, "wan", "modules", fname))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refwan_modules.{name}"] = mod
        spec.loader.exec_module(mod)
        return mod

    att = load("attention", "attention.py")
    # defensive: an earlier test may have faked flash_attn in sys.modules
    att.FLASH_ATTN_2_AVAILABLE = False
    att.FLASH_ATTN_3_AVAILABLE = False
    model = load("model", "model.py")
    # CPU run: route the direct flash_attention calls through the SDPA
    # fallback (attention() dispatches on flash-attn availability); keep
    # f32 so the comparison isn't bf16-quantized (the real pipeline runs
    # the whole model under bf16 autocast instead)
    import functools
    model.flash_attention = functools.partial(att.attention,
                                              dtype=torch.float32)
    return model


def test_wan_dense_forward_matches_reference():
    import jax
    import jax.numpy as jnp
    from jenga_tpu.convert import convert_wan_dit
    from jenga_tpu.models.wan import WanConfig, wan_forward

    model_mod = _load_reference_wan()
    torch.manual_seed(0)
    ref = model_mod.WanModel(
        model_type="t2v", patch_size=(1, 2, 2), text_len=16, in_dim=16,
        dim=64, ffn_dim=128, freq_dim=32, text_dim=32, out_dim=16,
        num_heads=2, num_layers=2, qk_norm=True,
        cross_attn_norm=True, eps=1e-6).eval().float()
    # the production head is zero-init -> output would be identically 0
    # and the comparison vacuous; randomize it (both sides get the same
    # weights through the converter)
    torch.nn.init.normal_(ref.head.head.weight, std=0.05)

    f, h, w = 3, 8, 12
    torch.manual_seed(1)
    x = torch.randn(16, f, h, w)
    t = torch.tensor([500.0])
    ctx = torch.randn(9, 32)            # unpadded text, L=9
    seq_len = f * (h // 2) * (w // 2)
    with torch.no_grad():
        out_ref = ref([x], t, [ctx], seq_len)[0].float().numpy()

    cfg = WanConfig(model_type="t2v", text_len=16, in_dim=16, dim=64,
                    ffn_dim=128, freq_dim=32, text_dim=32, out_dim=16,
                    num_heads=2, num_layers=2, qk_norm=True,
                    cross_attn_norm=True, eps=1e-6, dtype="float32")
    params = jax.tree.map(jnp.asarray,
                          convert_wan_dit(ref.state_dict(), cfg))
    ctx_pad = jnp.pad(jnp.asarray(ctx.numpy()), ((0, 16 - 9), (0, 0)))
    out = wan_forward(params, cfg, jnp.asarray(x.numpy())[None],
                      jnp.asarray(t.numpy()), ctx_pad[None])
    out = np.asarray(out[0])

    assert out.shape == out_ref.shape
    scale = np.abs(out_ref).max()
    assert scale > 1e-2, "vacuous comparison: reference output ~ 0"
    np.testing.assert_allclose(out, out_ref, atol=3e-4 * max(scale, 1.0),
                               rtol=2e-3)


def test_wan_dense_i2v_forward_matches_reference():
    """I2V variant: channel-concat y + CLIP features through img_emb."""
    import jax
    import jax.numpy as jnp
    from jenga_tpu.convert import convert_wan_dit
    from jenga_tpu.models.wan import WanConfig, wan_forward

    model_mod = _load_reference_wan()
    torch.manual_seed(2)
    ref = model_mod.WanModel(
        model_type="i2v", patch_size=(1, 2, 2), text_len=16, in_dim=36,
        dim=64, ffn_dim=128, freq_dim=32, text_dim=32, out_dim=16,
        num_heads=2, num_layers=2, qk_norm=True,
        cross_attn_norm=True, eps=1e-6).eval().float()
    torch.nn.init.normal_(ref.head.head.weight, std=0.05)

    f, h, w = 2, 8, 8
    torch.manual_seed(3)
    x = torch.randn(16, f, h, w)
    y = torch.randn(20, f, h, w)
    t = torch.tensor([300.0])
    ctx = torch.randn(7, 32)
    # the reference hardcodes the 257-token CLIP split
    # (`/root/reference/wan/modules/model.py:206-207`)
    clip_fea = torch.randn(1, 257, 1280)
    seq_len = f * (h // 2) * (w // 2)
    with torch.no_grad():
        out_ref = ref([x], t, [ctx], seq_len, clip_fea=clip_fea,
                      y=[y])[0].float().numpy()

    cfg = WanConfig(model_type="i2v", text_len=16, in_dim=36, dim=64,
                    ffn_dim=128, freq_dim=32, text_dim=32, out_dim=16,
                    num_heads=2, num_layers=2, qk_norm=True,
                    cross_attn_norm=True, eps=1e-6, dtype="float32")
    params = jax.tree.map(jnp.asarray,
                          convert_wan_dit(ref.state_dict(), cfg))
    ctx_pad = jnp.pad(jnp.asarray(ctx.numpy()), ((0, 16 - 7), (0, 0)))
    out = wan_forward(params, cfg, jnp.asarray(x.numpy())[None],
                      jnp.asarray(t.numpy()), ctx_pad[None],
                      clip_fea=jnp.asarray(clip_fea.numpy()),
                      y=jnp.asarray(y.numpy())[None])
    out = np.asarray(out[0])
    scale = np.abs(out_ref).max()
    assert scale > 1e-2, "vacuous comparison: reference output ~ 0"
    np.testing.assert_allclose(out, out_ref, atol=3e-4 * max(scale, 1.0),
                               rtol=2e-3)


def _load_reference_hyvideo():
    """Import the HY dense model stack without hyvideo/__init__ (which
    pulls the triton kernel files)."""
    _install_stubs()
    root = types.ModuleType("refhy")
    root.__path__ = [os.path.join(REF, "hyvideo")]
    sys.modules["refhy"] = root
    for sub in ("modules", "utils"):
        pkg = types.ModuleType(f"refhy.{sub}")
        pkg.__path__ = [os.path.join(REF, "hyvideo", sub)]
        sys.modules[f"refhy.{sub}"] = pkg

    def load(name, relpath):
        spec = importlib.util.spec_from_file_location(
            f"refhy.{name}", os.path.join(REF, "hyvideo", relpath))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refhy.{name}"] = mod
        spec.loader.exec_module(mod)
        return mod

    load("utils.helpers", "utils/helpers.py")
    load("modules.activation_layers", "modules/activation_layers.py")
    load("modules.norm_layers", "modules/norm_layers.py")
    load("modules.modulate_layers", "modules/modulate_layers.py")
    load("modules.embed_layers", "modules/embed_layers.py")
    load("modules.mlp_layers", "modules/mlp_layers.py")
    att = load("modules.attenion", "modules/attenion.py")
    load("modules.token_refiner", "modules/token_refiner.py")
    posemb = load("modules.posemb_layers", "modules/posemb_layers.py")
    models = load("modules.models", "modules/models.py")

    # CPU: the blocks hardcode mode="flash"; force the torch/SDPA path,
    # rebuilding the varlen semantics (keys past each sample's real
    # length are masked) as an explicit attention mask.

    def torch_attention(q, k, v, mode="flash", **kw):
        cu_q = kw.pop("cu_seqlens_q", None)
        kw.pop("cu_seqlens_kv", None)
        kw.pop("max_seqlen_q", None)
        kw.pop("max_seqlen_kv", None)
        kw.pop("batch_size", None)
        attn_mask = None
        if cu_q is not None:
            b, s = q.shape[0], q.shape[1]
            valid = torch.zeros(b, 1, 1, s, dtype=torch.bool)
            for i in range(b):
                real = int(cu_q[2 * i + 1]) - i * s
                valid[i, :, :, :real] = True
            attn_mask = valid
        return att.attention(q, k, v, mode="torch", attn_mask=attn_mask,
                             **kw)

    def cpu_get_cu_seqlens(text_mask, img_len):
        batch_size = text_mask.shape[0]
        text_len = text_mask.sum(dim=1)
        max_len = text_mask.shape[1] + img_len
        cu = torch.zeros([2 * batch_size + 1], dtype=torch.int32)
        for i in range(batch_size):
            s_ = text_len[i] + img_len
            cu[2 * i + 1] = i * max_len + s_
            cu[2 * i + 2] = (i + 1) * max_len
        return cu

    models.attention = torch_attention
    models.get_cu_seqlens = cpu_get_cu_seqlens
    return models, posemb


def test_hyvideo_dense_forward_matches_reference():
    import jax
    import jax.numpy as jnp
    from jenga_tpu.convert import convert_hyvideo_dit
    from jenga_tpu.models.hyvideo import HYVideoConfig, hyvideo_forward

    models, posemb = _load_reference_hyvideo()

    class Args:
        text_states_dim = 32
        text_states_dim_2 = 24

    torch.manual_seed(0)
    ref = models.HYVideoDiffusionTransformer(
        Args(), patch_size=[1, 2, 2], in_channels=16, out_channels=16,
        hidden_size=48, heads_num=2, mlp_width_ratio=4.0,
        mm_double_blocks_depth=2, mm_single_blocks_depth=2,
        rope_dim_list=[8, 8, 8], qkv_bias=True, qk_norm=True,
        guidance_embed=True, text_projection="single_refiner",
        use_attention_mask=True).eval().float()
    # zero-init final layer + refiner adaLN gates make the output (and
    # the refiner's mask handling) vacuously zero on a random model;
    # randomize them so the comparison exercises the full network
    torch.nn.init.normal_(ref.final_layer.linear.weight, std=0.05)
    torch.nn.init.normal_(ref.final_layer.adaLN_modulation[1].weight,
                          std=0.05)
    for blk in ref.txt_in.individual_token_refiner.blocks:
        torch.nn.init.normal_(blk.adaLN_modulation[1].weight, std=0.05)

    f, h, w = 3, 8, 12
    tt, th, tw = f, h // 2, w // 2
    torch.manual_seed(1)
    x = torch.randn(1, 16, f, h, w)
    t = torch.tensor([500.0])
    txt = torch.randn(1, 10, 32)
    mask = torch.ones(1, 10, dtype=torch.long)
    mask[:, 8:] = 0
    txt2 = torch.randn(1, 24)
    guidance = torch.tensor([6000.0])
    fc, fs = posemb.get_nd_rotary_pos_embed(
        [8, 8, 8], [tt, th, tw], theta=256, use_real=True,
        theta_rescale_factor=1)
    with torch.no_grad():
        out_ref = ref(x, t, text_states=txt, text_mask=mask,
                      text_states_2=txt2, freqs_cos=fc, freqs_sin=fs,
                      guidance=guidance)["x"].float().numpy()

    cfg = HYVideoConfig(in_channels=16, out_channels=16, hidden_size=48,
                        heads_num=2, mlp_ratio=4.0, double_blocks=2,
                        single_blocks=2, rope_dim_list=(8, 8, 8),
                        rope_theta=256.0, qkv_bias=True, guidance_embed=True,
                        text_states_dim=32, text_states_dim_2=24,
                        refiner_depth=2, dtype="float32")
    params = jax.tree.map(jnp.asarray,
                          convert_hyvideo_dit(ref.state_dict(), cfg))
    out = hyvideo_forward(params, cfg, jnp.asarray(x.numpy()),
                          jnp.asarray(t.numpy()),
                          jnp.asarray(txt.numpy()),
                          jnp.asarray(mask.numpy()),
                          jnp.asarray(txt2.numpy()),
                          guidance=jnp.asarray(guidance.numpy()))
    out = np.asarray(out)
    assert out.shape == out_ref.shape
    scale = np.abs(out_ref).max()
    assert scale > 1e-2, "vacuous comparison: reference output ~ 0"
    np.testing.assert_allclose(out, out_ref, atol=3e-4 * max(scale, 1.0),
                               rtol=2e-3)


def _load_wan_module(name, fname, extra=()):
    """Load a single wan/modules file into the fake package."""
    _install_stubs()
    if "refwan_modules" not in sys.modules:
        pkg = types.ModuleType("refwan_modules")
        pkg.__path__ = [os.path.join(REF, "wan", "modules")]
        sys.modules["refwan_modules"] = pkg
    for dep_name, dep_file in extra:
        if f"refwan_modules.{dep_name}" not in sys.modules:
            _load_wan_module(dep_name, dep_file)
    key = f"refwan_modules.{name}"
    if key in sys.modules:
        return sys.modules[key]
    spec = importlib.util.spec_from_file_location(
        key, os.path.join(REF, "wan", "modules", fname))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[key] = mod
    spec.loader.exec_module(mod)
    return mod


def test_umt5_wan_matches_reference():
    """Our T5 encode + convert_umt5_wan reproduce the reference scratch
    T5Encoder (umt5 per-layer relative bias, unscaled attention)."""
    import jax
    import jax.numpy as jnp
    from jenga_tpu.convert.encoders import convert_umt5_wan
    from jenga_tpu.text.t5 import T5Config, t5_encode

    t5_mod = _load_wan_module("t5", "t5.py")
    torch.manual_seed(0)
    ref = t5_mod.T5Encoder(vocab=64, dim=32, dim_attn=32, dim_ffn=64,
                           num_heads=4, num_layers=2, num_buckets=32,
                           shared_pos=False, dropout=0.0).eval().float()
    ids = torch.randint(0, 64, (2, 11))
    mask = torch.ones(2, 11, dtype=torch.long)
    mask[1, 7:] = 0
    with torch.no_grad():
        out_ref = ref(ids, mask).numpy()

    cfg = T5Config(vocab_size=64, dim=32, dim_attn=32, dim_ffn=64,
                   num_heads=4, num_layers=2, num_buckets=32, max_dist=128,
                   shared_pos=False, dtype="float32")
    params = jax.tree.map(jnp.asarray,
                          convert_umt5_wan(ref.state_dict(), cfg))
    out = t5_encode(params, cfg, jnp.asarray(ids.numpy()),
                    jnp.asarray(mask.numpy()))
    valid = np.asarray(mask.numpy(), bool)
    np.testing.assert_allclose(np.asarray(out)[valid],
                               out_ref[valid], atol=5e-4, rtol=5e-3)


def test_wan_vae_matches_reference():
    """Our full-sequence Wan VAE encode/decode reproduce the reference's
    causal feat-cache streaming implementation with converted weights —
    the round-1 'cache equivalence derivation' verified numerically."""
    import jax
    import jax.numpy as jnp
    from jenga_tpu.codec import vae_wan
    from jenga_tpu.convert import convert_wanvae

    vae_mod = _load_wan_module("vae", "vae.py")
    torch.manual_seed(0)
    ref = vae_mod.WanVAE_(dim=16, z_dim=4, dim_mult=[1, 2, 2, 2],
                          num_res_blocks=1, attn_scales=[],
                          temperal_downsample=[False, True, True],
                          dropout=0.0).eval().float()
    cfg = vae_wan.WanVAEConfig(dim=16, z_dim=4, dim_mult=(1, 2, 2, 2),
                               num_res_blocks=1,
                               temporal_downsample=(False, True, True))
    params = jax.tree.map(jnp.asarray, convert_wanvae(ref.state_dict(), cfg))

    torch.manual_seed(1)
    x = torch.randn(1, 3, 9, 32, 32)
    scale = [0.0, 1.0]
    with torch.no_grad():
        mu_ref = ref.encode(x, scale).numpy()
        z = torch.from_numpy(mu_ref)
        dec_ref = ref.decode(z, scale).numpy()

    mu = vae_wan.wanvae_encode(params, jnp.asarray(x.numpy()), cfg,
                               normalize=False)
    np.testing.assert_allclose(np.asarray(mu), mu_ref, atol=2e-3, rtol=2e-2)
    dec = vae_wan.wanvae_decode(params, jnp.asarray(mu_ref), cfg,
                                normalize=False)
    # the reference WanVAE wrapper clamps to [-1, 1] after the raw decode
    # (`/root/reference/wan/modules/vae.py` decode: .clamp_(-1, 1)); ours
    # clamps inside, so compare against the clamped reference
    np.testing.assert_allclose(np.asarray(dec), np.clip(dec_ref, -1, 1),
                               atol=1e-4, rtol=1e-3)


def test_xlm_roberta_matches_reference():
    import jax
    import jax.numpy as jnp
    from jenga_tpu.convert.encoders import convert_xlm_roberta_wan
    from jenga_tpu.text.xlm_roberta import (XLMRobertaConfig,
                                            xlm_roberta_encode)

    xr_mod = _load_wan_module("xlm_roberta", "xlm_roberta.py")
    torch.manual_seed(0)
    ref = xr_mod.XLMRoberta(vocab_size=64, max_seq_len=32, type_size=1,
                            pad_id=1, dim=32, num_heads=4, num_layers=2,
                            post_norm=True, dropout=0.0).eval().float()
    ids = torch.randint(2, 64, (2, 9))
    ids[1, 6:] = 1   # pad
    with torch.no_grad():
        out_ref = ref(ids).numpy()

    cfg = XLMRobertaConfig(vocab_size=64, max_positions=32, dim=32,
                           num_heads=4, num_layers=2, ffn_dim=128)
    params = jax.tree.map(jnp.asarray,
                          convert_xlm_roberta_wan(ref.state_dict(), cfg))
    out = xlm_roberta_encode(params, cfg, jnp.asarray(ids.numpy()))
    valid = np.asarray((ids != 1).numpy(), bool)
    np.testing.assert_allclose(np.asarray(out)[valid], out_ref[valid],
                               atol=5e-4, rtol=5e-3)


def test_clip_vision_wan_matches_reference():
    """Our ViT (fused-qkv split, use_31_block tap) vs the reference
    VisionTransformer with converted weights."""
    import jax
    import jax.numpy as jnp
    from jenga_tpu.convert.encoders import convert_clip_vision_wan
    from jenga_tpu.text.clip import CLIPVisionConfig, clip_vision_encode

    clip_mod = _load_wan_module(
        "clip", "clip.py",
        extra=(("attention", "attention.py"),
               ("tokenizers", "tokenizers.py"),
               ("xlm_roberta", "xlm_roberta.py")))
    att = sys.modules["refwan_modules.attention"]

    def sdpa(q, k, v, version=None, **kw):
        return att.attention(q, k, v, dtype=torch.float32, **kw)

    clip_mod.flash_attention = sdpa
    torch.manual_seed(0)
    ref = clip_mod.VisionTransformer(
        image_size=28, patch_size=14, dim=32, mlp_ratio=2, out_dim=16,
        num_heads=4, num_layers=3, pool_type="token", pre_norm=True,
        post_norm=False, activation="gelu", attn_dropout=0.0,
        proj_dropout=0.0, embedding_dropout=0.0).eval().float()
    torch.manual_seed(1)
    img = torch.randn(1, 3, 28, 28)
    with torch.no_grad():
        feats_ref = ref(img, use_31_block=True).numpy()

    cfg = CLIPVisionConfig(image_size=28, patch_size=14, hidden_size=32,
                           intermediate_size=64, num_layers=3, num_heads=4,
                           act="gelu")
    params = jax.tree.map(jnp.asarray,
                          convert_clip_vision_wan(ref.state_dict(), cfg))
    feats = clip_vision_encode(params, cfg, jnp.asarray(img.numpy()),
                               use_31_block=True)
    np.testing.assert_allclose(np.asarray(feats), feats_ref, atol=5e-4,
                               rtol=5e-3)


def _install_scheduler_stubs():
    """Richer diffusers stubs for the reference schedulers: a functional
    register_to_config (captures init args into self.config) and the
    scheduling_utils/utils surfaces they import."""
    _install_stubs()
    import enum
    import functools
    import inspect

    cu = sys.modules["diffusers.configuration_utils"]

    class _Cfg(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

    def register_to_config(fn):
        @functools.wraps(fn)
        def wrapped(self, *args, **kwargs):
            sig = inspect.signature(fn)
            bound = sig.bind(self, *args, **kwargs)
            bound.apply_defaults()
            self.config = _Cfg({k: v for k, v in bound.arguments.items()
                                if k != "self"})
            return fn(self, *args, **kwargs)
        return wrapped

    cu.register_to_config = register_to_config

    if "diffusers.schedulers.scheduling_utils" not in sys.modules:
        su = types.ModuleType("diffusers.schedulers.scheduling_utils")

        class SchedulerMixin:
            pass

        class KarrasDiffusionSchedulers(enum.Enum):
            placeholder = 0

        class SchedulerOutput(dict):
            def __init__(self, prev_sample=None, **kw):
                super().__init__(prev_sample=prev_sample, **kw)
                self.prev_sample = prev_sample
                for k, v in kw.items():
                    setattr(self, k, v)

            def __getitem__(self, k):
                if isinstance(k, int):
                    return list(self.values())[k]
                return dict.__getitem__(self, k)

        su.SchedulerMixin = SchedulerMixin
        su.KarrasDiffusionSchedulers = KarrasDiffusionSchedulers
        su.SchedulerOutput = SchedulerOutput
        sched_pkg = types.ModuleType("diffusers.schedulers")
        sched_pkg.scheduling_utils = su
        sys.modules["diffusers.schedulers"] = sched_pkg
        sys.modules["diffusers.schedulers.scheduling_utils"] = su

    if "diffusers.utils" not in sys.modules:
        du = types.ModuleType("diffusers.utils")

        class BaseOutput(dict):
            def __init__(self, **kw):
                super().__init__(**kw)
                for k, v in kw.items():
                    setattr(self, k, v)

        class _Logging:
            @staticmethod
            def get_logger(name):
                import logging as _l
                return _l.getLogger(name)

        du.BaseOutput = BaseOutput
        du.logging = _Logging()
        du.deprecate = lambda *a, **k: None
        du.is_scipy_available = lambda: True
        du.__path__ = []    # package: allow diffusers.utils.torch_utils
        sys.modules["diffusers.utils"] = du
        tu = types.ModuleType("diffusers.utils.torch_utils")

        def randn_tensor(shape, generator=None, device=None, dtype=None):
            return torch.randn(shape, generator=generator, device=device,
                               dtype=dtype)

        tu.randn_tensor = randn_tensor
        du.torch_utils = tu
        sys.modules["diffusers.utils.torch_utils"] = tu


def _load_file_module(key, path):
    spec = importlib.util.spec_from_file_location(key, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[key] = mod
    spec.loader.exec_module(mod)
    return mod


def test_flow_match_scheduler_matches_reference():
    """Euler flow-match: sigmas/timesteps with SD3 shift, step updates,
    and the Jenga x0-revert / re-noise extensions."""
    from jenga_tpu.diffusion.flow_match import flow_match_schedule

    _install_scheduler_stubs()
    mod = _load_file_module(
        "ref_fm", os.path.join(
            REF, "hyvideo/diffusion/schedulers/"
                 "scheduling_flow_match_discrete.py"))
    ref = mod.FlowMatchDiscreteScheduler(shift=7.0, reverse=True,
                                         solver="euler")
    n = 10
    ref.set_timesteps(n)
    ours = flow_match_schedule(n, shift=7.0, reverse=True)
    np.testing.assert_allclose(np.asarray(ours.sigmas),
                               ref.sigmas.numpy(), atol=1e-6)
    for i in range(n):
        assert abs(float(ours.timestep(i))
                   - float(ref.timesteps[i])) < 1e-3

    torch.manual_seed(0)
    x = torch.randn(1, 4, 2, 8, 8)
    v = torch.randn(1, 4, 2, 8, 8)
    # Euler step at i=3
    ref.set_timesteps(n)
    ref._step_index = 3
    stepped_ref = ref.step(v, ref.timesteps[3], x).prev_sample.numpy()
    import jax.numpy as jnp
    stepped = ours.step(3, jnp.asarray(x.numpy()), jnp.asarray(v.numpy()))
    np.testing.assert_allclose(np.asarray(stepped), stepped_ref, atol=1e-5)

    # Jenga extensions: x0 revert + re-noise (prores stage switch math);
    # reference signatures are (noise_pred, t, latents) and
    # (latents, noise, t) with a timestep VALUE
    x0_ref = ref.predict_x0_from_xt(
        v, ref.timesteps[3],
        torch.from_numpy(np.asarray(stepped))).prev_sample.numpy()
    x0 = ours.predict_x0(3, jnp.asarray(np.asarray(stepped)),
                         jnp.asarray(v.numpy()))
    np.testing.assert_allclose(np.asarray(x0), x0_ref, atol=1e-5)
    noise = torch.randn(1, 4, 2, 8, 8)
    ren_ref = ref.add_noise_to_step(
        torch.from_numpy(x0_ref), noise,
        ref.timesteps[5]).prev_sample.numpy()
    ren = ours.renoise_to_step(5, jnp.asarray(x0_ref),
                               jnp.asarray(noise.numpy()))
    np.testing.assert_allclose(np.asarray(ren), ren_ref, atol=1e-5)


def test_unipc_scheduler_matches_reference():
    """UniPC multistep trajectory parity: 10 steps of synthetic velocity
    through both solvers (predictor + corrector), plus step_to_zero and
    add_noise, plus the turbo disable_corrector reset."""
    import jax.numpy as jnp
    from jenga_tpu.diffusion.unipc import (unipc_add_noise, unipc_init,
                                           unipc_schedule, unipc_step,
                                           unipc_step_to_zero)

    _install_scheduler_stubs()
    mod = _load_file_module(
        "ref_unipc", os.path.join(REF, "wan/utils/fm_solvers_unipc.py"))
    n = 10
    ref = mod.FlowUniPCMultistepScheduler(num_train_timesteps=1000,
                                          solver_order=2)
    ref.set_timesteps(n, shift=8.0)
    ours_sched = unipc_schedule(n, shift=8.0)
    np.testing.assert_allclose(np.asarray(ours_sched.sigmas[:-1]),
                               ref.sigmas.numpy()[:-1], atol=1e-6)

    torch.manual_seed(0)
    x_ref = torch.randn(1, 4, 2, 8, 8)
    x_ours = jnp.asarray(x_ref.numpy())
    state = unipc_init(ours_sched)
    gen = torch.Generator().manual_seed(1)
    for i in range(n):
        v = torch.randn(1, 4, 2, 8, 8, generator=gen)
        x_ref = ref.step(v, ref.timesteps[i], x_ref,
                         return_dict=False)[0]
        state, x_ours = unipc_step(ours_sched, state,
                                   jnp.asarray(v.numpy()), x_ours)
        np.testing.assert_allclose(
            np.asarray(x_ours), x_ref.numpy(), atol=2e-4, rtol=1e-3,
            err_msg=f"diverged at step {i}")

    # step_to_zero + add_noise (turbo switch math)
    ref2 = mod.FlowUniPCMultistepScheduler(num_train_timesteps=1000,
                                           solver_order=2)
    ref2.set_timesteps(n, shift=8.0)
    torch.manual_seed(2)
    x = torch.randn(1, 4, 2, 8, 8)
    v = torch.randn(1, 4, 2, 8, 8)
    i = 4
    ref2._step_index = i
    clean_ref = ref2.step_to_zero(v, ref2.timesteps[i], x,
                                  return_dict=False)[0].numpy()
    clean = unipc_step_to_zero(ours_sched, i, jnp.asarray(v.numpy()),
                               jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(clean), clean_ref, atol=1e-5,
                               rtol=1e-4)
    noise = torch.randn(1, 4, 2, 8, 8)
    ts = ref2.timesteps[i + 1]
    ren_ref = ref2.add_noise(torch.from_numpy(clean_ref), noise,
                             ts.unsqueeze(0)).numpy()
    ren = unipc_add_noise(ours_sched, i + 1, jnp.asarray(clean_ref),
                          jnp.asarray(noise.numpy()))
    np.testing.assert_allclose(np.asarray(ren), ren_ref, atol=1e-5,
                               rtol=1e-4)


def _install_hyvae_stubs():
    """diffusers surfaces the HY causal VAE imports, including a faithful
    single-block ``Attention`` (the deprecated attn-block semantics the
    mid block relies on)."""
    _install_scheduler_stubs()
    import importlib.machinery

    def mk(name):
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        sys.modules[name] = m
        return m

    du = sys.modules["diffusers.utils"]
    if not hasattr(du, "is_torch_version"):
        du.is_torch_version = lambda op, v: False
    if "diffusers.utils.accelerate_utils" not in sys.modules:
        au = mk("diffusers.utils.accelerate_utils")
        au.apply_forward_hook = lambda fn: fn
        du.accelerate_utils = au
    if "diffusers.utils.torch_utils" not in sys.modules:
        tu = mk("diffusers.utils.torch_utils")

        def randn_tensor(shape, generator=None, device=None, dtype=None):
            return torch.randn(shape, generator=generator, device=device,
                               dtype=dtype)

        tu.randn_tensor = randn_tensor
        du.torch_utils = tu
    if "diffusers.loaders" not in sys.modules:
        ld = mk("diffusers.loaders")

        class FromOriginalVAEMixin:
            pass

        ld.FromOriginalVAEMixin = FromOriginalVAEMixin
    sys.modules["diffusers.models"].__path__ = []   # mark as package
    if "diffusers.models.normalization" not in sys.modules:
        nrm = mk("diffusers.models.normalization")

        class AdaGroupNorm(torch.nn.Module):
            pass

        class RMSNorm(torch.nn.Module):
            pass

        nrm.AdaGroupNorm = AdaGroupNorm
        nrm.RMSNorm = RMSNorm
        sys.modules["diffusers.models"].normalization = nrm
    if "diffusers.models.activations" not in sys.modules:
        act = mk("diffusers.models.activations")
        act.get_activation = lambda name: {
            "silu": torch.nn.SiLU(), "swish": torch.nn.SiLU(),
            "relu": torch.nn.ReLU(), "gelu": torch.nn.GELU()}[name]
    if "diffusers.models.modeling_outputs" not in sys.modules:
        mo = mk("diffusers.models.modeling_outputs")
        BaseOutput = du.BaseOutput

        class AutoencoderKLOutput(BaseOutput):
            pass

        mo.AutoencoderKLOutput = AutoencoderKLOutput
    if "diffusers.models.attention_processor" not in sys.modules:
        ap = mk("diffusers.models.attention_processor")
        nn = torch.nn

        class Attention(nn.Module):
            """Deprecated-attn-block semantics: group norm over channels,
            single-projection MHA, residual add, output rescale."""

            def __init__(self, query_dim, heads=1, dim_head=64,
                         rescale_output_factor=1.0, eps=1e-6,
                         norm_num_groups=32, spatial_norm_dim=None,
                         residual_connection=True, bias=True,
                         upcast_softmax=True,
                         _from_deprecated_attn_block=True, **kw):
                super().__init__()
                inner = heads * dim_head
                self.heads = heads
                self.dim_head = dim_head
                self.rescale_output_factor = rescale_output_factor
                self.residual_connection = residual_connection
                self.group_norm = nn.GroupNorm(norm_num_groups, query_dim,
                                               eps=eps)
                self.to_q = nn.Linear(query_dim, inner, bias=bias)
                self.to_k = nn.Linear(query_dim, inner, bias=bias)
                self.to_v = nn.Linear(query_dim, inner, bias=bias)
                self.to_out = nn.ModuleList(
                    [nn.Linear(inner, query_dim, bias=True),
                     nn.Dropout(0.0)])

            def forward(self, hidden_states, temb=None,
                        attention_mask=None):
                res = hidden_states
                b, s, c = hidden_states.shape
                h = self.group_norm(
                    hidden_states.transpose(1, 2)).transpose(1, 2)
                q = self.to_q(h).view(b, s, self.heads, self.dim_head)
                k = self.to_k(h).view(b, s, self.heads, self.dim_head)
                v = self.to_v(h).view(b, s, self.heads, self.dim_head)
                logits = torch.einsum(
                    "bqhd,bkhd->bhqk", q.float(), k.float()) \
                    * self.dim_head ** -0.5
                if attention_mask is not None:
                    logits = logits + attention_mask[:, None].float()
                a = logits.softmax(dim=-1).to(v.dtype)
                out = torch.einsum("bhqk,bkhd->bqhd", a, v)
                out = self.to_out[0](out.reshape(b, s, -1))
                if self.residual_connection:
                    out = out + res
                return out / self.rescale_output_factor

        class AttentionProcessor:
            pass

        ap.Attention = Attention
        ap.AttentionProcessor = AttentionProcessor
        ap.AttnProcessor = AttentionProcessor
        ap.AttnAddedKVProcessor = AttentionProcessor
        ap.SpatialNorm = type("SpatialNorm", (nn.Module,), {})
        ap.ADDED_KV_ATTENTION_PROCESSORS = ()
        ap.CROSS_ATTENTION_PROCESSORS = ()
        models_pkg = sys.modules["diffusers.models"]
        models_pkg.attention_processor = ap


def _load_reference_hyvae():
    _install_hyvae_stubs()
    root = types.ModuleType("refhyvae")
    root.__path__ = [os.path.join(REF, "hyvideo", "vae")]
    sys.modules["refhyvae"] = root

    def load(name, fname):
        key = f"refhyvae.{name}"
        if key in sys.modules:
            return sys.modules[key]
        spec = importlib.util.spec_from_file_location(
            key, os.path.join(REF, "hyvideo", "vae", fname))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[key] = mod
        spec.loader.exec_module(mod)
        return mod

    load("unet_causal_3d_blocks", "unet_causal_3d_blocks.py")
    load("vae", "vae.py")
    return load("autoencoder_kl_causal_3d", "autoencoder_kl_causal_3d.py")


def test_hy_vae_matches_reference():
    """Our causal 3D VAE encode/decode vs the reference
    AutoencoderKLCausal3D (884 layout) with converted weights."""
    import jax
    import jax.numpy as jnp
    from jenga_tpu.codec import vae_hy
    from jenga_tpu.convert import convert_hyvae

    mod = _load_reference_hyvae()
    torch.manual_seed(0)
    ref = mod.AutoencoderKLCausal3D(
        in_channels=3, out_channels=3,
        down_block_types=("DownEncoderBlockCausal3D",) * 4,
        up_block_types=("UpDecoderBlockCausal3D",) * 4,
        block_out_channels=(8, 16, 16, 16), layers_per_block=1,
        latent_channels=4, norm_num_groups=4, sample_size=32,
        sample_tsize=8, time_compression_ratio=4,
        spatial_compression_ratio=8).eval().float()

    cfg = vae_hy.HYVAEConfig(block_out_channels=(8, 16, 16, 16),
                             layers_per_block=1, latent_channels=4,
                             norm_num_groups=4, sample_size=32,
                             sample_tsize=8)
    params = jax.tree.map(jnp.asarray, convert_hyvae(ref.state_dict(), cfg))

    torch.manual_seed(1)
    x = torch.randn(1, 3, 5, 32, 32)
    with torch.no_grad():
        moments = ref.encode(x).latent_dist.parameters.numpy()
        z = torch.from_numpy(moments[:, :4])
        dec = ref.decode(z).sample.numpy()

    ours_m = vae_hy.vae_encode(params, jnp.asarray(x.numpy()), cfg)
    np.testing.assert_allclose(np.asarray(ours_m), moments, atol=2e-4,
                               rtol=2e-3)
    ours_d = vae_hy.vae_decode(params, jnp.asarray(z.numpy()), cfg)
    np.testing.assert_allclose(np.asarray(ours_d), dec, atol=5e-4,
                               rtol=5e-3)


def test_hy_vae_tiled_matches_reference():
    """Tiled encode + decode (spatial + temporal, seam blending and crops)
    vs the reference tilers at multi-tile shapes."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from jenga_tpu.codec import vae_hy
    from jenga_tpu.convert import convert_hyvae

    mod = _load_reference_hyvae()
    torch.manual_seed(0)
    ref = mod.AutoencoderKLCausal3D(
        in_channels=3, out_channels=3,
        down_block_types=("DownEncoderBlockCausal3D",) * 4,
        up_block_types=("UpDecoderBlockCausal3D",) * 4,
        block_out_channels=(8, 16, 16, 16), layers_per_block=1,
        latent_channels=4, norm_num_groups=4, sample_size=64,
        sample_tsize=16, time_compression_ratio=4,
        spatial_compression_ratio=8).eval().float()
    ref.enable_spatial_tiling(True)
    ref.enable_temporal_tiling(True)

    cfg = vae_hy.HYVAEConfig(block_out_channels=(8, 16, 16, 16),
                             layers_per_block=1, latent_channels=4,
                             norm_num_groups=4, sample_size=64,
                             sample_tsize=16)
    params = jax.tree.map(jnp.asarray, convert_hyvae(ref.state_dict(), cfg))

    torch.manual_seed(1)
    x = torch.randn(1, 3, 21, 96, 96)   # > sample_tsize and > sample_size
    with torch.no_grad():
        moments = ref.encode(x).latent_dist.parameters.numpy()
        z = torch.from_numpy(moments[:, :4])
        dec = ref.decode(z).sample.numpy()

    ours_m = vae_hy.vae_encode_tiled(params, jnp.asarray(x.numpy()), cfg)
    np.testing.assert_allclose(np.asarray(ours_m), moments, atol=5e-4,
                               rtol=5e-3)
    ours_d = vae_hy.vae_decode_tiled(params, jnp.asarray(z.numpy()), cfg)
    np.testing.assert_allclose(np.asarray(ours_d), dec, atol=1e-3,
                               rtol=1e-2)


def test_block_importance_selection_matches_reference():
    """The carving planner's top-p + adjacency + text/first-frame forcing
    vs the reference's one-hot builder (the heart of AttenCarve), with
    triton/flash-attn stubbed so the pure-torch builder imports."""
    import importlib.machinery
    import jax
    import jax.numpy as jnp
    from jenga_tpu.sparse.planner import build_block_mask

    _install_stubs()
    # initialize dynamo BEFORE faking triton so torch caches
    # "no triton available" instead of probing the stub
    import torch._dynamo  # noqa: F401
    import torch._inductor.runtime.hints  # noqa: F401
    if "triton" not in sys.modules:
        tr = types.ModuleType("triton")
        tr.__spec__ = importlib.machinery.ModuleSpec("triton", None)
        tr.jit = lambda fn=None, **kw: (fn if fn is not None
                                        else (lambda f: f))
        tr.autotune = lambda *a, **k: (lambda f: f)
        tr.cdiv = lambda a, b: (a + b - 1) // b
        tl = types.ModuleType("triton.language")
        tl.__spec__ = importlib.machinery.ModuleSpec("triton.language", None)
        tl.constexpr = int
        tl.dtype = type("dtype", (), {})   # torch._dynamo probes this
        tr.language = tl
        sys.modules["triton"] = tr
        sys.modules["triton.language"] = tl
    if "flash_attn" not in sys.modules:
        fa = types.ModuleType("flash_attn")
        fa.__spec__ = importlib.machinery.ModuleSpec("flash_attn", None)
        fa.flash_attn_func = None
        sys.modules["flash_attn"] = fa

    try:
        mod = _load_wan_module("blocksparse",
                               "attention_block_triton_diffres.py")
    finally:
        # don't leak the fake triton/flash_attn into later module loads
        sys.modules.pop("triton", None)
        sys.modules.pop("triton.language", None)
        sys.modules.pop("flash_attn", None)

    torch.manual_seed(0)
    b, h, d = 2, 3, 32
    tsb, tb, ff = 6, 2, 1
    nkb = tsb + tb
    q = torch.randn(b, h, tsb * 128, d)
    k = torch.randn(b, h, nkb * 128, d)
    neighbors = torch.rand(tsb, tsb) < 0.2
    neighbors |= torch.eye(tsb, dtype=torch.bool)
    # reference expects a [nqb, nkb]-indexable neighbor tensor
    nb_ref = torch.zeros(nkb, nkb, dtype=torch.bool)
    nb_ref[:tsb, :tsb] = neighbors

    with torch.no_grad():
        ref_mask = mod._build_block_index_with_importance_optimized(
            q, k, top_k=2, block_size_M=128, block_size_N=128,
            text_start_block=tsb, num_blocks=nkb, prob_threshold=0.6,
            text_blocks=tb, block_neighbor_list=nb_ref,
            first_frame_blocks=ff).numpy()

    ours = build_block_mask(
        jnp.asarray(q.numpy()), jnp.asarray(k.numpy()), top_k=2,
        p_remain=0.6, text_start_block=tsb, text_blocks=tb,
        block_neighbors=jnp.asarray(nb_ref.numpy()),
        first_frame_blocks=ff)
    np.testing.assert_array_equal(np.asarray(ours), ref_mask)


def test_wan_full_pipeline_matches_reference_loop():
    """END-TO-END: our WanT2VPipeline.generate (dense, CFG, UniPC) vs a
    hand-driven reference loop (reference WanModel + reference UniPC
    scheduler, converted weights, identical initial noise) — verifies the
    pipeline glue: CFG combine order, int timestep feeding, solver state
    threading (reference protocol `/root/reference/jenga_wan.py:207-217`)."""
    import jax
    import jax.numpy as jnp
    from jenga_tpu.convert import convert_wan_dit
    from jenga_tpu.models.wan import WanConfig, init_wan_params
    from jenga_tpu.pipelines.wan_t2v import WanT2VOptions, WanT2VPipeline

    model_mod = _load_reference_wan()
    _install_scheduler_stubs()
    unipc_mod = _load_file_module(
        "ref_unipc_e2e", os.path.join(REF, "wan/utils/fm_solvers_unipc.py"))

    torch.manual_seed(0)
    ref = model_mod.WanModel(
        model_type="t2v", patch_size=(1, 2, 2), text_len=16, in_dim=16,
        dim=64, ffn_dim=128, freq_dim=32, text_dim=32, out_dim=16,
        num_heads=2, num_layers=2, qk_norm=True,
        cross_attn_norm=True, eps=1e-6).eval().float()
    torch.nn.init.normal_(ref.head.head.weight, std=0.05)

    f, h, w = 2, 8, 8
    n_steps, guide, shift = 6, 5.0, 8.0
    torch.manual_seed(1)
    noise = torch.randn(16, f, h, w)
    ctx = torch.randn(9, 32)
    ctx_null = torch.randn(7, 32)
    seq_len = f * (h // 2) * (w // 2)

    # ---- reference loop (jenga_wan.py t2v_generate protocol)
    sched = unipc_mod.FlowUniPCMultistepScheduler(num_train_timesteps=1000,
                                                  solver_order=2)
    sched.set_timesteps(n_steps, shift=shift)
    lat = noise.clone()
    ref_traj = []
    with torch.no_grad():
        for t in sched.timesteps:
            timestep = torch.stack([t])
            cond = ref([lat], timestep, [ctx], seq_len)[0]
            uncond = ref([lat], timestep, [ctx_null], seq_len)[0]
            pred = uncond + guide * (cond - uncond)
            lat = sched.step(pred.unsqueeze(0), t, lat.unsqueeze(0),
                             return_dict=False)[0].squeeze(0)
            ref_traj.append(lat.numpy().copy())
    ref_final = lat.numpy()

    # ---- our pipeline
    cfg = WanConfig(model_type="t2v", text_len=16, in_dim=16, dim=64,
                    ffn_dim=128, freq_dim=32, text_dim=32, out_dim=16,
                    num_heads=2, num_layers=2, qk_norm=True,
                    cross_attn_norm=True, eps=1e-6, dtype="float32")
    params = jax.tree.map(jnp.asarray, convert_wan_dit(ref.state_dict(), cfg))
    pipe = WanT2VPipeline(cfg, params)
    opts = WanT2VOptions(size=(w * 8, h * 8), frame_num=(f - 1) * 4 + 1,
                         shift=shift, sampling_steps=n_steps,
                         guide_scale=guide, sa_drop_rates=(0.0, 0.0),
                         teacache_thresh=None)
    traj = []
    ours = pipe.generate(jnp.asarray(ctx.numpy()),
                         jnp.asarray(ctx_null.numpy()), opts, decode=False,
                         initial_latents=jnp.asarray(noise.numpy()),
                         on_step=lambda i, l: traj.append(np.asarray(l)))
    scale = np.abs(ref_final).max()
    assert scale > 1e-2
    # Per-forward f32 noise (~5e-4) is amplified ~6x by CFG at guide 5 and
    # roughly doubles per UniPC step on an untrained (high-Lipschitz)
    # model; the budget below is that growth curve, step 0 tight enough
    # to catch any glue error (wrong timestep/CFG order would blow it).
    budget = [0.010, 0.020, 0.040, 0.080, 0.160, 0.320]
    for i, (got, want) in enumerate(zip(traj, ref_traj)):
        d = float(np.abs(got - want).max())
        assert d < budget[i], f"step {i}: diff {d} over budget {budget[i]}"
    np.testing.assert_allclose(np.asarray(ours), ref_final, atol=0.32,
                               rtol=0.1)


def test_hy_full_pipeline_matches_reference_loop():
    """END-TO-END HunyuanVideo: our ProRes pipeline (dense carving, no
    skipping, flat res schedule, embedded guidance) vs a hand-driven
    reference loop (reference MMDiT + FlowMatchDiscreteScheduler,
    converted weights, identical initial noise — the protocol of
    `/root/reference/jenga_hyvideo.py` with carving off)."""
    import jax
    import jax.numpy as jnp
    from jenga_tpu.convert import convert_hyvideo_dit
    from jenga_tpu.models.hyvideo import HYVideoConfig
    from jenga_tpu.pipelines.hyvideo_t2v import (HYT2VOptions,
                                                 HYVideoT2VPipeline)

    models, posemb = _load_reference_hyvideo()
    _install_scheduler_stubs()
    fm_mod = _load_file_module(
        "ref_fm_e2e", os.path.join(
            REF, "hyvideo/diffusion/schedulers/"
                 "scheduling_flow_match_discrete.py"))

    class Args:
        text_states_dim = 32
        text_states_dim_2 = 24

    torch.manual_seed(0)
    ref = models.HYVideoDiffusionTransformer(
        Args(), patch_size=[1, 2, 2], in_channels=16, out_channels=16,
        hidden_size=48, heads_num=2, mlp_width_ratio=4.0,
        mm_double_blocks_depth=2, mm_single_blocks_depth=2,
        rope_dim_list=[8, 8, 8], qkv_bias=True, qk_norm=True,
        guidance_embed=True, text_projection="single_refiner",
        use_attention_mask=True).eval().float()
    torch.nn.init.normal_(ref.final_layer.linear.weight, std=0.05)
    torch.nn.init.normal_(ref.final_layer.adaLN_modulation[1].weight,
                          std=0.05)
    for blk in ref.txt_in.individual_token_refiner.blocks:
        torch.nn.init.normal_(blk.adaLN_modulation[1].weight, std=0.05)

    f, h, w = 3, 8, 12
    tt, th, tw = f, h // 2, w // 2
    n_steps, flow_shift, g_scale = 5, 7.0, 6.0
    torch.manual_seed(1)
    noise = torch.randn(1, 16, f, h, w)
    txt = torch.randn(1, 10, 32)
    mask = torch.ones(1, 10, dtype=torch.long)
    mask[:, 8:] = 0
    txt2 = torch.randn(1, 24)
    guidance = torch.tensor([g_scale * 1000.0])
    fc, fs = posemb.get_nd_rotary_pos_embed(
        [8, 8, 8], [tt, th, tw], theta=256, use_real=True,
        theta_rescale_factor=1)

    sched = fm_mod.FlowMatchDiscreteScheduler(shift=flow_shift,
                                              reverse=True, solver="euler")
    sched.set_timesteps(n_steps)
    lat = noise.clone()
    ref_traj = []
    with torch.no_grad():
        for i, t in enumerate(sched.timesteps):
            v = ref(lat, t.unsqueeze(0), text_states=txt, text_mask=mask,
                    text_states_2=txt2, freqs_cos=fc, freqs_sin=fs,
                    guidance=guidance)["x"]
            lat = sched.step(v, t, lat).prev_sample
            ref_traj.append(lat.numpy().copy())

    cfg = HYVideoConfig(in_channels=16, out_channels=16, hidden_size=48,
                        heads_num=2, mlp_ratio=4.0, double_blocks=2,
                        single_blocks=2, rope_dim_list=(8, 8, 8),
                        rope_theta=256.0, qkv_bias=True, guidance_embed=True,
                        text_states_dim=32, text_states_dim_2=24,
                        refiner_depth=2, dtype="float32")
    params = jax.tree.map(jnp.asarray,
                          convert_hyvideo_dit(ref.state_dict(), cfg))
    pipe = HYVideoT2VPipeline(cfg, params)
    opts = HYT2VOptions(size=(w * 8, h * 8), video_length=(f - 1) * 4 + 1,
                        num_inference_steps=n_steps,
                        embedded_guidance_scale=g_scale,
                        sa_drop_rates=(0.0, 0.0),
                        res_rate_list=(1.0, 1.0),
                        step_rate_list=(0.5, 1.0),
                        scheduler_shift_list=(flow_shift, flow_shift),
                        enable_skip=False)
    traj = []
    pipe.generate(jnp.asarray(txt.numpy())[0], jnp.asarray(mask.numpy())[0],
                  jnp.asarray(txt2.numpy())[0], opts, decode=False,
                  on_step=lambda i, l: traj.append(np.asarray(l)),
                  initial_latents=jnp.asarray(noise.numpy())[0])
    # Euler flow-match is first-order: error grows roughly linearly, much
    # tamer than the UniPC case; no CFG batch (embedded guidance only)
    budget = [0.01, 0.02, 0.03, 0.05, 0.08]
    for i, (got, want) in enumerate(zip(traj, ref_traj)):
        d = float(np.abs(got[None] - want).max())
        assert d < budget[i], f"step {i}: diff {d} over budget {budget[i]}"


def test_wan_turbo_stage_switch_matches_reference_loop():
    """TRAJECTORY ACROSS THE TURBO STAGE SWITCH (VERDICT r3 weak-4): the
    switch ops were parity-tested one by one, but never composed. Drive
    the reference protocol (`/root/reference/jenga_wan.py:158-245`) with
    the reference WanModel + reference UniPC scheduler through the
    switch — step_to_zero -> trilinear upsample -> add_noise at t_{i+1}
    -> _step_index bump -> disable_corrector -> set_timesteps(shift+2) —
    and assert our pipeline lands on the same post-switch latents and
    tracks the remaining steps from identical noises. A silent off-by-one
    in the re-shift _step_index bookkeeping fails the post-switch step."""
    import jax
    import jax.numpy as jnp
    from jenga_tpu.convert import convert_wan_dit
    from jenga_tpu.models.wan import WanConfig
    from jenga_tpu.pipelines.wan_t2v import WanT2VOptions, WanT2VPipeline

    model_mod = _load_reference_wan()
    _install_scheduler_stubs()
    unipc_mod = _load_file_module(
        "ref_unipc_turbo",
        os.path.join(REF, "wan/utils/fm_solvers_unipc.py"))

    torch.manual_seed(0)
    ref = model_mod.WanModel(
        model_type="t2v", patch_size=(1, 2, 2), text_len=16, in_dim=16,
        dim=64, ffn_dim=128, freq_dim=32, text_dim=32, out_dim=16,
        num_heads=2, num_layers=2, qk_norm=True,
        cross_attn_norm=True, eps=1e-6).eval().float()
    torch.nn.init.normal_(ref.head.head.weight, std=0.05)

    f, h, w = 2, 8, 8
    n_steps, guide, shift, switch = 8, 5.0, 8.0, 3
    lh0, lw0 = int(h * 0.75) // 2 * 2, int(w * 0.75) // 2 * 2      # 6, 6
    torch.manual_seed(1)
    # the reference draws the downsampled stage-0 noise first, then the
    # full-res re-noise draw, from one generator (jenga_wan.py:158-181)
    noise0 = torch.randn(16, f, lh0, lw0)
    noise_full = torch.randn(16, f, h, w)
    ctx = torch.randn(9, 32)
    ctx_null = torch.randn(7, 32)
    seq_len = f * (h // 2) * (w // 2)   # full-res seq_len in BOTH stages

    # ---- reference loop with the turbo switch block
    sched = unipc_mod.FlowUniPCMultistepScheduler(num_train_timesteps=1000,
                                                  solver_order=2)
    sched.set_timesteps(n_steps, shift=shift)
    timesteps = sched.timesteps
    lat = noise0.clone()
    stage_changed = False
    ref_traj = []
    with torch.no_grad():
        for idx in range(n_steps):
            t = timesteps[idx]
            timestep = torch.stack([t])
            cond = ref([lat], timestep, [ctx], seq_len)[0]
            uncond = ref([lat], timestep, [ctx_null], seq_len)[0]
            pred = uncond + guide * (cond - uncond)
            if idx >= switch and not stage_changed:
                stage_changed = True
                clean = sched.step_to_zero(pred.unsqueeze(0), t,
                                           lat.unsqueeze(0),
                                           return_dict=False)[0]
                clean = torch.nn.functional.interpolate(
                    clean, size=(f, h, w), mode="trilinear")
                noisy = sched.add_noise(clean, noise_full.unsqueeze(0),
                                        timesteps[idx + 1].unsqueeze(0))
                sched._step_index += 1
                lat = noisy.squeeze(0)
                sched.disable_corrector = list(range(24, 38))
                sched.set_timesteps(n_steps, shift=shift + 2)
                timesteps = sched.timesteps
            else:
                lat = sched.step(pred.unsqueeze(0), t, lat.unsqueeze(0),
                                 return_dict=False)[0].squeeze(0)
            ref_traj.append(lat.numpy().copy())

    # ---- our pipeline crossing its own switch
    cfg = WanConfig(model_type="t2v", text_len=16, in_dim=16, dim=64,
                    ffn_dim=128, freq_dim=32, text_dim=32, out_dim=16,
                    num_heads=2, num_layers=2, qk_norm=True,
                    cross_attn_norm=True, eps=1e-6, dtype="float32")
    params = jax.tree.map(jnp.asarray, convert_wan_dit(ref.state_dict(),
                                                       cfg))
    pipe = WanT2VPipeline(cfg, params)
    opts = WanT2VOptions(size=(w * 8, h * 8), frame_num=(f - 1) * 4 + 1,
                         shift=shift, sampling_steps=n_steps,
                         guide_scale=guide, sa_drop_rates=(0.0, 0.0),
                         teacache_thresh=None, enable_turbo=True,
                         turbo_switch_step=switch)
    traj = []
    pipe.generate(jnp.asarray(ctx.numpy()), jnp.asarray(ctx_null.numpy()),
                  opts, decode=False,
                  initial_latents=jnp.asarray(noise0.numpy()),
                  stage2_noise=jnp.asarray(noise_full.numpy()),
                  on_step=lambda i, l: traj.append(np.asarray(l)))

    assert len(traj) == len(ref_traj) == n_steps
    assert traj[switch].shape == (16, f, h, w)       # upsampled at switch
    # same growth-curve budgets as the non-turbo E2E test; the switch step
    # itself is algebra on the step-(switch) forward, so it stays tight
    budget = [0.010, 0.020, 0.040, 0.060, 0.120, 0.240, 0.480, 0.960]
    for i, (got, want) in enumerate(zip(traj, ref_traj)):
        d = float(np.abs(got - want).max())
        assert d < budget[i], f"step {i}: diff {d} over budget {budget[i]}"


def test_hy_prores_stage_switch_matches_reference_loop():
    """TRAJECTORY ACROSS THE ProRes STAGE SWITCH (VERDICT r3 weak-4):
    hand-drive the reference switch block sequence
    (`/root/reference/hyvideo/diffusion/pipelines/
    pipeline_hunyuan_video_prores.py:697-773`) with the reference MMDiT +
    reference FlowMatchDiscreteScheduler — config.shift reassign ->
    set_timesteps -> _step_index = i -> predict_x0_from_xt at the NEW
    schedule's t_i -> trilinear upsample -> add_noise_to_step(t_{i+1}) ->
    _step_index += 1 — and assert our ProRes pipeline lands on the same
    post-switch latents and tracks the remaining full-res steps."""
    import jax
    import jax.numpy as jnp
    from jenga_tpu.convert import convert_hyvideo_dit
    from jenga_tpu.models.hyvideo import HYVideoConfig
    from jenga_tpu.pipelines.hyvideo_t2v import (HYT2VOptions,
                                                 HYVideoT2VPipeline)

    models, posemb = _load_reference_hyvideo()
    _install_scheduler_stubs()
    fm_mod = _load_file_module(
        "ref_fm_switch", os.path.join(
            REF, "hyvideo/diffusion/schedulers/"
                 "scheduling_flow_match_discrete.py"))

    class Args:
        text_states_dim = 32
        text_states_dim_2 = 24

    torch.manual_seed(0)
    ref = models.HYVideoDiffusionTransformer(
        Args(), patch_size=[1, 2, 2], in_channels=16, out_channels=16,
        hidden_size=48, heads_num=2, mlp_width_ratio=4.0,
        mm_double_blocks_depth=2, mm_single_blocks_depth=2,
        rope_dim_list=[8, 8, 8], qkv_bias=True, qk_norm=True,
        guidance_embed=True, text_projection="single_refiner",
        use_attention_mask=True).eval().float()
    torch.nn.init.normal_(ref.final_layer.linear.weight, std=0.05)
    torch.nn.init.normal_(ref.final_layer.adaLN_modulation[1].weight,
                          std=0.05)
    for blk in ref.txt_in.individual_token_refiner.blocks:
        torch.nn.init.normal_(blk.adaLN_modulation[1].weight, std=0.05)

    f, h, w = 3, 8, 12                      # full-res latent grid
    h0, w0 = 4, 6                           # 0.5 res stage-0 grid
    n_steps, g_scale = 6, 6.0
    shifts = (7.0, 9.0)
    split = 3                               # int(6 * 0.5)
    torch.manual_seed(1)
    noise0 = torch.randn(1, 16, f, h0, w0)
    noise_full = torch.randn(1, 16, f, h, w)
    txt = torch.randn(1, 10, 32)
    mask = torch.ones(1, 10, dtype=torch.long)
    mask[:, 8:] = 0
    txt2 = torch.randn(1, 24)
    guidance = torch.tensor([g_scale * 1000.0])

    def freqs(grid):
        return posemb.get_nd_rotary_pos_embed(
            [8, 8, 8], [grid[0], grid[1] // 2, grid[2] // 2], theta=256,
            use_real=True, theta_rescale_factor=1)

    fc0, fs0 = freqs((f, h0, w0))
    fc1, fs1 = freqs((f, h, w))

    sched = fm_mod.FlowMatchDiscreteScheduler(shift=shifts[0],
                                              reverse=True, solver="euler")
    sched.set_timesteps(n_steps)
    timesteps = sched.timesteps
    lat = noise0.clone()
    fc, fs = fc0, fs0
    ref_traj = []
    with torch.no_grad():
        for i in range(n_steps):
            t = timesteps[i]
            v = ref(lat, t.unsqueeze(0), text_states=txt, text_mask=mask,
                    text_states_2=txt2, freqs_cos=fc, freqs_sin=fs,
                    guidance=guidance)["x"]
            if i == split:
                # the reference switch block, prores:697-773 (res_rate
                # != 1 branch; curve/drop swaps are carving-only state)
                sched.config.shift = shifts[1]
                sched.set_timesteps(n_steps)
                sched._step_index = i
                timesteps = sched.timesteps
                t = timesteps[i]
                lat = sched.predict_x0_from_xt(v, t, lat).prev_sample
                lat = torch.nn.functional.interpolate(
                    lat, size=(f, h, w), mode="trilinear")
                lat = sched.add_noise_to_step(
                    lat, noise_full, timesteps[i + 1]).prev_sample
                sched._step_index += 1
                fc, fs = fc1, fs1
            else:
                lat = sched.step(v, t, lat).prev_sample
            ref_traj.append(lat.numpy().copy())

    cfg = HYVideoConfig(in_channels=16, out_channels=16, hidden_size=48,
                        heads_num=2, mlp_ratio=4.0, double_blocks=2,
                        single_blocks=2, rope_dim_list=(8, 8, 8),
                        rope_theta=256.0, qkv_bias=True, guidance_embed=True,
                        text_states_dim=32, text_states_dim_2=24,
                        refiner_depth=2, dtype="float32")
    params = jax.tree.map(jnp.asarray,
                          convert_hyvideo_dit(ref.state_dict(), cfg))
    pipe = HYVideoT2VPipeline(cfg, params)
    opts = HYT2VOptions(size=(w * 8, h * 8), video_length=(f - 1) * 4 + 1,
                        num_inference_steps=n_steps,
                        embedded_guidance_scale=g_scale,
                        sa_drop_rates=(0.0, 0.0),
                        res_rate_list=(0.5, 1.0),
                        step_rate_list=(0.5, 1.0),
                        scheduler_shift_list=shifts,
                        flow_shift=shifts[0],
                        enable_skip=False)
    traj = []
    pipe.generate(jnp.asarray(txt.numpy())[0], jnp.asarray(mask.numpy())[0],
                  jnp.asarray(txt2.numpy())[0], opts, decode=False,
                  on_step=lambda i, l: traj.append(np.asarray(l)),
                  initial_latents=jnp.asarray(noise0.numpy())[0],
                  stage_noises={1: jnp.asarray(noise_full.numpy())[0]})

    assert len(traj) == len(ref_traj) == n_steps
    assert traj[split].shape == (16, f, h, w)        # upsampled at switch
    budget = [0.01, 0.02, 0.03, 0.05, 0.08, 0.12]
    for i, (got, want) in enumerate(zip(traj, ref_traj)):
        d = float(np.abs(got[None] - want).max())
        assert d < budget[i], f"step {i}: diff {d} over budget {budget[i]}"


def test_dpm_scheduler_matches_reference():
    """DPM++ multistep trajectory parity (the reference --sample_solver
    dpm++ alternative, `/root/reference/wan/utils/fm_solvers.py`)."""
    import jax.numpy as jnp
    from jenga_tpu.diffusion.dpm import dpm_init, dpm_schedule, dpm_step

    _install_scheduler_stubs()
    mod = _load_file_module(
        "ref_dpm", os.path.join(REF, "wan/utils/fm_solvers.py"))
    n = 10
    ref = mod.FlowDPMSolverMultistepScheduler(num_train_timesteps=1000,
                                              solver_order=2)
    ref.set_timesteps(n, shift=8.0)
    ours_sched = dpm_schedule(n, shift=8.0, grid="train")
    np.testing.assert_allclose(np.asarray(ours_sched.sigmas[:-1]),
                               ref.sigmas.numpy()[:-1], atol=1e-6)
    # the pipeline path uses the get_sampling_sigmas grid (the reference
    # dpm++ wiring, `/root/reference/jenga_wan.py:145-156`)
    sampling = dpm_schedule(n, shift=8.0)
    np.testing.assert_allclose(np.asarray(sampling.sigmas[:-1]),
                               mod.get_sampling_sigmas(n, 8.0), atol=1e-6)

    torch.manual_seed(0)
    x_ref = torch.randn(1, 4, 2, 8, 8)
    x_ours = jnp.asarray(x_ref.numpy())
    state = dpm_init(ours_sched)
    gen = torch.Generator().manual_seed(1)
    for i in range(n):
        v = torch.randn(1, 4, 2, 8, 8, generator=gen)
        x_ref = ref.step(v, ref.timesteps[i], x_ref, return_dict=False)[0]
        state, x_ours = dpm_step(ours_sched, state,
                                 jnp.asarray(v.numpy()), x_ours)
        np.testing.assert_allclose(
            np.asarray(x_ours), x_ref.numpy(), atol=2e-4, rtol=1e-3,
            err_msg=f"diverged at step {i}")


def _load_reference_hyvideo_jenga():
    """Load the reference's CARVED (Jenga) HY model stack —
    ``models_mul_block_gc_ha_multigpu.py`` + the diffres mask builder —
    with its CUDA-only deps (triton, flash_attn, xfuser) stubbed. Returns
    (jenga_models_module, diffres_module, posemb_module)."""
    import importlib.machinery

    _models, posemb = _load_reference_hyvideo()

    # initialize dynamo BEFORE faking triton (see the selection test)
    import torch._dynamo  # noqa: F401
    import torch._inductor.runtime.hints  # noqa: F401
    fakes = []

    def fake(name, **attrs):
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        for k_, v_ in attrs.items():
            setattr(m, k_, v_)
        sys.modules[name] = m
        fakes.append(name)
        return m

    try:
        if "triton" not in sys.modules:
            tr = fake("triton",
                      jit=lambda fn=None, **kw: (
                          fn if fn is not None else (lambda f: f)),
                      autotune=lambda *a, **k: (lambda f: f),
                      cdiv=lambda a, b: (a + b - 1) // b)
            tl = fake("triton.language", constexpr=int,
                      dtype=type("dtype", (), {}))
            tr.language = tl
        if "flash_attn" not in sys.modules:
            fake("flash_attn", flash_attn_func=None)
        if "xfuser" not in sys.modules:
            xf = fake("xfuser")
            core = fake("xfuser.core")
            dist_ = fake("xfuser.core.distributed",
                         get_sequence_parallel_world_size=lambda: 1,
                         get_sequence_parallel_rank=lambda: 0,
                         get_sp_group=lambda: None)
            xf.core = core
            core.distributed = dist_

        def load(name, relpath):
            spec = importlib.util.spec_from_file_location(
                f"refhy.{name}", os.path.join(REF, "hyvideo", relpath))
            mod = importlib.util.module_from_spec(spec)
            sys.modules[f"refhy.{name}"] = mod
            spec.loader.exec_module(mod)
            return mod

        diffres = load("modules.attention_block_triton_diffres",
                       "modules/attention_block_triton_diffres.py")
        jmodels = load("modules.models_mul",
                       "modules/models_mul_block_gc_ha_multigpu.py")
    finally:
        for name in fakes:
            sys.modules.pop(name, None)
    return jmodels, diffres, posemb


def _emulated_block_sparse_attention(diffres):
    """Torch stand-in for the reference's CUDA-only Triton kernel with
    EXACTLY its math (`/root/reference/hyvideo/modules/
    attention_block_triton_diffres.py:298-396`): the reference's own
    ``_build_block_index_with_importance_optimized`` selection + a
    dense masked exp2-softmax for video query rows (one-hot block mask,
    additive ``text_amp`` on text columns in the log2 domain, per-sample
    seqlen key masking) and full unmasked attention for text query rows
    (its ``flash_attn_func`` branch applies no seqlen mask)."""
    LOG2E = 1.4426950408889634

    def emu(query, key, value, top_k, block_size_M=128, block_size_N=128,
            cu_seqlens_q=None, cu_seqlens_kv=None, max_seqlen_q=None,
            max_seqlen_kv=None, text_blocks=2, text_amp=0.0,
            block_neighbor_list=None, shape_xfuse=False,
            p_remain_rates=0.5):
        q = query.transpose(1, 2).float()
        k = key.transpose(1, 2).float()
        v = value.transpose(1, 2).float()
        b, hn, s, dh = q.shape
        nb = s // block_size_M
        tsb = nb - text_blocks
        nt = tsb * block_size_M
        seqlen = int(cu_seqlens_q[1]) if cu_seqlens_q is not None else s
        with torch.no_grad():
            onehot = diffres._build_block_index_with_importance_optimized(
                q[:, :, :nt], k, top_k, block_size_M, block_size_N,
                text_start_block=tsb, num_blocks=nb,
                prob_threshold=p_remain_rates, text_blocks=text_blocks,
                block_neighbor_list=block_neighbor_list)
        sm = dh ** -0.5
        cols = torch.arange(s)
        kv_valid = (cols < seqlen)[None, None, None, :]
        logits = torch.einsum("bhqd,bhkd->bhqk", q, k) * (sm * LOG2E)
        lv = logits[:, :, :nt] + text_amp * (cols >= nt).float()
        tokmask = onehot.repeat_interleave(block_size_M, 2) \
                        .repeat_interleave(block_size_N, 3)
        lv = lv.masked_fill(~(tokmask & kv_valid), float("-inf"))
        pv = torch.exp2(lv - lv.amax(-1, keepdim=True))
        outv = (pv / pv.sum(-1, keepdim=True)) @ v
        lt = logits[:, :, nt:]
        pt = torch.exp2(lt - lt.amax(-1, keepdim=True))
        outt = (pt / pt.sum(-1, keepdim=True)) @ v
        out = torch.cat([outv, outt], dim=2)
        return out.permute(0, 2, 1, 3).reshape(b, s, hn * dh)

    return emu


def test_hy_carved_trajectory_matches_reference_loop():
    """END-TO-END CARVED HunyuanVideo: our pipeline with carving ON
    (drop 0.75, top-p 0.3, gilbert curve, per-row selection) vs a
    hand-driven reference loop that mirrors ``ra_forward``
    (`/root/reference/jenga_hyvideo.py:60-226`: embed -> hilbert reorder
    of img tokens + RoPE tables -> carved double/single blocks -> inverse
    reorder -> head), using the reference's own curve tables, mask
    builder, and Jenga model classes, with its Triton kernel emulated by
    the exact-math torch stand-in above. Closes the carved-math
    composition gap left by the per-piece parity tests."""
    import jax
    import jax.numpy as jnp
    from jenga_tpu.convert import convert_hyvideo_dit
    from jenga_tpu.models.hyvideo import HYVideoConfig
    from jenga_tpu.pipelines.hyvideo_t2v import (HYT2VOptions,
                                                 HYVideoT2VPipeline)

    jmodels, diffres, posemb = _load_reference_hyvideo_jenga()
    jmodels.block_sparse_attention = _emulated_block_sparse_attention(
        diffres)
    _install_scheduler_stubs()
    fm_mod = _load_file_module(
        "ref_fm_carved", os.path.join(
            REF, "hyvideo/diffusion/schedulers/"
                 "scheduling_flow_match_discrete.py"))
    gilbert_ref = _load_file_module("ref_gilbert_carved",
                                    os.path.join(REF, "gilbert.py"))

    class Args:
        text_states_dim = 32
        text_states_dim_2 = 24

    torch.manual_seed(0)
    ref = jmodels.HYVideoDiffusionTransformer(
        Args(), patch_size=[1, 2, 2], in_channels=16, out_channels=16,
        hidden_size=48, heads_num=2, mlp_width_ratio=4.0,
        mm_double_blocks_depth=2, mm_single_blocks_depth=2,
        rope_dim_list=[8, 8, 8], qkv_bias=True, qk_norm=True,
        guidance_embed=True, text_projection="single_refiner",
        use_attention_mask=True).eval().float()
    torch.nn.init.normal_(ref.final_layer.linear.weight, std=0.05)
    torch.nn.init.normal_(ref.final_layer.adaLN_modulation[1].weight,
                          std=0.05)
    for blk in ref.txt_in.individual_token_refiner.blocks:
        torch.nn.init.normal_(blk.adaLN_modulation[1].weight, std=0.05)

    # token grid (4, 8, 16) = 512 img tokens = 4 blocks + 2 text blocks;
    # Jenga-Base drop 0.75 -> top_k = 1 with 26-adjacency + text forcing
    tt, th, tw = 4, 8, 16
    f, h, w = tt, th * 2, tw * 2
    n_steps, flow_shift, g_scale = 5, 7.0, 6.0
    drop, p_remain = 0.75, 0.3

    # the reference's own curve tables (jenga_hyvideo.build_multi_curve)
    l2h, hil = gilbert_ref.gilbert_mapping(tt, th, tw)
    nb_list = gilbert_ref.gilbert_block_neighbor_mapping(tt, th, tw)
    curve = [torch.tensor(l2h, dtype=torch.long),
             torch.tensor(hil, dtype=torch.long),
             torch.as_tensor(np.asarray(nb_list))]

    torch.manual_seed(1)
    noise = torch.randn(1, 16, f, h, w)
    txt_states = torch.randn(1, 256, 32)
    mask = torch.ones(1, 256, dtype=torch.long)
    txt2 = torch.randn(1, 24)
    guidance = torch.tensor([g_scale * 1000.0])
    fc, fs = posemb.get_nd_rotary_pos_embed(
        [8, 8, 8], [tt, th, tw], theta=256, use_real=True,
        theta_rescale_factor=1)

    img_len = tt * th * tw
    total = img_len + 256
    cu = torch.tensor([0, img_len + int(mask.sum()), total],
                      dtype=torch.int32)
    top_k = int((1.0 - drop) * (img_len // 128))

    def ref_forward(lat, t):
        """The ra_forward protocol, skip disabled, single stage."""
        with torch.no_grad():
            img = ref.img_in(lat)
            vec = ref.time_in(t) + ref.vector_in(txt2) \
                + ref.guidance_in(guidance)
            txt = ref.txt_in(txt_states, t, mask)
            img = img[:, curve[1]]
            fcos, fsin = fc[curve[1]], fs[curve[1]]
            for blk in ref.double_blocks:
                img, txt = blk(img, txt, vec, cu, cu, total, total,
                               (fcos, fsin), drop, 0.0, [curve], p_remain)
            x = torch.cat((img, txt), 1)
            for blk in ref.single_blocks:
                x = blk(x, vec, 256, cu, cu, total, total, (fcos, fsin),
                        drop, 0.0, [curve], p_remain)
            img = x[:, :img_len][:, curve[0]]
            img = ref.final_layer(img, vec)
            return ref.unpatchify(img, tt, th, tw)

    sched = fm_mod.FlowMatchDiscreteScheduler(shift=flow_shift,
                                              reverse=True, solver="euler")
    sched.set_timesteps(n_steps)
    lat = noise.clone()
    ref_traj = []
    for t in sched.timesteps:
        v = ref_forward(lat, t.unsqueeze(0))
        lat = sched.step(v, t, lat).prev_sample
        ref_traj.append(lat.numpy().copy())

    cfg = HYVideoConfig(in_channels=16, out_channels=16, hidden_size=48,
                        heads_num=2, mlp_ratio=4.0, double_blocks=2,
                        single_blocks=2, rope_dim_list=(8, 8, 8),
                        rope_theta=256.0, qkv_bias=True, guidance_embed=True,
                        text_states_dim=32, text_states_dim_2=24,
                        refiner_depth=2, dtype="float32")
    params = jax.tree.map(jnp.asarray,
                          convert_hyvideo_dit(ref.state_dict(), cfg))
    pipe = HYVideoT2VPipeline(cfg, params)
    opts = HYT2VOptions(size=(w * 8, h * 8), video_length=(f - 1) * 4 + 1,
                        num_inference_steps=n_steps, flow_shift=flow_shift,
                        embedded_guidance_scale=g_scale,
                        sa_drop_rates=(drop, drop), p_remain=p_remain,
                        res_rate_list=(1.0, 1.0), step_rate_list=(0.5, 1.0),
                        scheduler_shift_list=(flow_shift, flow_shift),
                        enable_skip=False, curve="gilbert", q_group=1)
    traj = []
    pipe.generate(jnp.asarray(txt_states.numpy())[0],
                  jnp.asarray(mask.numpy())[0],
                  jnp.asarray(txt2.numpy())[0], opts, decode=False,
                  on_step=lambda i, l: traj.append(np.asarray(l)),
                  initial_latents=jnp.asarray(noise.numpy())[0])
    # step-wise budgets like the dense loop, slightly looser: the discrete
    # selection amplifies fp drift only if a borderline block flips
    budget = [0.015, 0.03, 0.05, 0.08, 0.12]
    for i, (got, want) in enumerate(zip(traj, ref_traj)):
        d = float(np.abs(got[None] - want).max())
        assert d < budget[i], f"step {i}: diff {d} over budget {budget[i]}"
