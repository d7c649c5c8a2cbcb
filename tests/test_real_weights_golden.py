"""Real-checkpoint golden tests — env-gated (VERDICT r3 missing-1).

This image carries no model weights, so these tests SKIP by default. On
the first machine with checkpoints they produce, with zero new code, the
quality evidence the synthetic benches cannot:

  * carved-vs-dense final-latent fidelity at a REAL checkpoint, matched
    seed (the paper's claim is VBench within ~1% of dense,
    `/root/reference/README.md:12,14`; final-latent relative error is
    the latent-space proxy the reference's own loss pipeline uses,
    `/root/reference/hyvideo/diffusion/pipelines/
    pipeline_hunyuan_video_loss.py:962-1058`),
  * decoded VBench-protocol sample files via ``jenga_tpu.batch``
    (`{prompt}-{i}.mp4` naming, `/root/reference/jenga_wan.py:950-972`),
  * a ``golden_report.json`` with the numbers, next to the videos.

Gate variables (see RUNBOOK.md for the checkpoint dir layouts):
  JENGA_WAN_CKPT_DIR   Wan2.1-T2V-1.3B dir (DiT .pth/.safetensors +
                       Wan2.1_VAE.pth + models_t5_umt5-xxl-enc-bf16.pth)
  JENGA_HY_CKPT_DIR    HunyuanVideo root (transformers/ + vae/ +
                       text_encoder/ + text_encoder_2/). NOTE: the 13B
                       DiT needs ~26GB HBM in bf16 — one v5e (16GB)
                       cannot hold it; run on v5p or with sp_degree > 1.
  JENGA_GOLDEN_OUT     artifact dir (default: ./golden_out)
"""

import json
import os

import numpy as np
import pytest

WAN_DIR = os.environ.get("JENGA_WAN_CKPT_DIR")
HY_DIR = os.environ.get("JENGA_HY_CKPT_DIR")
OUT_DIR = os.environ.get("JENGA_GOLDEN_OUT", "golden_out")

PROMPT = ("Two anthropomorphic cats in comfy boxing gear and bright "
          "gloves fight intensely on a spotlighted stage.")

# production quality bar: the paper reports VBench within ~1% of dense;
# final-latent relative error at matched seeds runs ~2% even with RANDOM
# weights (FIDELITY.json) and real checkpoints' peaked local attention
# should land lower. 10% is the loud-failure bound, not the expectation.
REL_ERR_BOUND = 0.10


def _report(name: str, payload: dict):
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, "golden_report.json")
    rows = []
    if os.path.exists(path):
        rows = [json.loads(l) for l in open(path) if l.strip()]
    rows.append({"test": name, **payload})
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


@pytest.mark.skipif(not WAN_DIR, reason="JENGA_WAN_CKPT_DIR not set")
def test_wan_1_3b_real_weights_fidelity_and_vbench_outputs():
    import dataclasses

    import jax.numpy as jnp

    from jenga_tpu.batch import vbench_filename
    from jenga_tpu.configs.presets import get_wan_preset
    from jenga_tpu.pipelines.loss_eval import carving_fidelity_report
    from jenga_tpu.runtime import WAN_DEFAULT_NEGATIVE_PROMPT, WanSampler
    from jenga_tpu.utils.video import save_video

    sampler = WanSampler.from_pretrained("t2v-1.3B", WAN_DIR)
    assert sampler.t5 is not None, "T5 checkpoint missing from ckpt dir"
    assert sampler.vae_params is not None, "VAE checkpoint missing"

    ctx = sampler.encode_prompt(PROMPT)
    ctx_null = sampler.encode_prompt(WAN_DEFAULT_NEGATIVE_PROMPT)

    # reduced size/steps: quality evidence, not a benchmark
    base = get_wan_preset("1.3b-base", size=(480, 272), frame_num=33,
                          sampling_steps=20, seed=7, teacache_thresh=None)
    carved = dataclasses.replace(base)
    dense = dataclasses.replace(base, sa_drop_rates=(0.0, 0.0))

    rep = carving_fidelity_report(sampler.pipeline, None, ctx, ctx_null,
                                  carved, dense)
    rep["config"] = ("wan-1.3b REAL weights 480x272x33f 20 steps, "
                     "Jenga-Base carving vs dense, matched seed 7")
    _report("wan_1.3b_fidelity", rep)
    assert np.isfinite(rep["final_mse"])
    assert rep["relative_error"] < REL_ERR_BOUND, rep

    # VBench-protocol artifact: decode the carved run, protocol naming
    video = sampler.pipeline.generate(ctx, ctx_null, carved, decode=True)
    video = np.asarray(video, np.float32)
    assert np.isfinite(video).all()
    os.makedirs(OUT_DIR, exist_ok=True)
    out = os.path.join(OUT_DIR, vbench_filename(PROMPT, 0))
    save_video(out, video, fps=16)
    assert os.path.getsize(out) > 0
    _report("wan_1.3b_vbench_sample", {"file": out,
                                       "frames": int(video.shape[1])})


@pytest.mark.skipif(not HY_DIR, reason="JENGA_HY_CKPT_DIR not set")
def test_hy_real_weights_fidelity_and_vbench_outputs():
    import dataclasses

    from jenga_tpu.batch import vbench_filename
    from jenga_tpu.configs.presets import get_hy_preset
    from jenga_tpu.runtime import HunyuanVideoSampler
    from jenga_tpu.utils.video import save_video

    sp = int(os.environ.get("JENGA_SP_DEGREE", "1"))
    sampler = HunyuanVideoSampler.from_pretrained(HY_DIR, sp_degree=sp)
    assert sampler.text_encoder is not None, "text_encoder/ missing"

    # reduced geometry (540x320x33f); Base carving vs dense, matched seed
    base = get_hy_preset("base", size=(544, 320), video_length=33,
                         num_inference_steps=20, seed=7)
    carved = dataclasses.replace(base)
    dense = dataclasses.replace(base, sa_drop_rates=(0.0, 0.0),
                                enable_skip=False)

    enc = sampler.encode_prompt(PROMPT)
    lat_c = sampler.predict(*enc, carved, decode=False)
    lat_d = sampler.predict(*enc, dense, decode=False)
    lat_c, lat_d = np.asarray(lat_c, np.float32), np.asarray(lat_d,
                                                             np.float32)
    rel = float(np.linalg.norm(lat_c - lat_d)
                / (np.linalg.norm(lat_d) + 1e-8))
    rep = {"relative_error": rel,
           "final_mse": float(np.mean((lat_c - lat_d) ** 2)),
           "config": "hyvideo REAL weights 544x320x33f 20 steps, "
                     "Jenga-Base carving+skip vs dense, matched seed 7"}
    _report("hy_fidelity", rep)
    assert np.isfinite(rel) and rel < REL_ERR_BOUND, rep

    video = sampler.decode_latents(lat_c)
    os.makedirs(OUT_DIR, exist_ok=True)
    out = os.path.join(OUT_DIR, vbench_filename(PROMPT, 0))
    save_video(out, np.asarray(video, np.float32), fps=24)
    assert os.path.getsize(out) > 0
    _report("hy_vbench_sample", {"file": out})
