"""Command-line entry points (reference scripts ``jenga_hyvideo.py``,
``jenga_wan.py``, ``jenga_hyi2v.py`` + the argparse groups of
`/root/reference/hyvideo/config.py:7-485` and
`/root/reference/jenga_wan.py:697-869`), rebuilt around the typed preset
registry.

Usage:
  python -m jenga_tpu.cli hyvideo-t2v --prompt "..." --preset turbo \
      --ckpt-dir /path/to/ckpts --save-path out.mp4
  python -m jenga_tpu.cli wan-t2v --task t2v-1.3B --preset 1.3b-turbo ...

Without --ckpt-dir the models run from random init (smoke/benchmark mode —
this image carries no checkpoints; converters handle the real ones).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time


def _q_group_arg(s: str) -> int:
    """--q-group validator: joint selection (the default) supports up to
    16 rows per group; per-row selection (--no-joint-sel) is capped at 8
    by the membership words (sparse/planner.py pack_block_lists_grouped).
    The 8 < q_group <= 16 + --no-joint-sel combination is rejected at
    pipeline build. 0 or negative values would reach the group math as
    q_rows=0."""
    v = int(s)
    if not 1 <= v <= 16:
        raise argparse.ArgumentTypeError(
            f"--q-group must be in [1, 16], got {v}")
    return v


def _common(p: argparse.ArgumentParser):
    p.add_argument("--prompt", type=str, default="A cat walks on the grass")
    p.add_argument("--prompt-file", type=str, default=None,
                   help="JSON (VBench prompt_en/id) or txt prompt list")
    p.add_argument("--remain-list", type=str, default=None,
                   help="JSON list of ids to (re-)generate (resume filter)")
    p.add_argument("--chunk-num", type=int, default=1,
                   help="shard the prompt list across this many hosts")
    p.add_argument("--cur-id", type=int, default=0,
                   help="this host's shard index")
    p.add_argument("--out-dir", type=str, default="outputs",
                   help="directory for id-stamped batch outputs")
    p.add_argument("--vbench", action="store_true",
                   help="treat --prompt-file as a VBench full_info.json and "
                        "emit the evaluation protocol's naming: "
                        "{prompt}-{i}.mp4, --vbench-samples per prompt")
    p.add_argument("--vbench-samples", type=int, default=5,
                   help="samples per prompt under --vbench (protocol: 5)")
    p.add_argument("--vbench-dimension", type=str, default=None,
                   help="only generate prompts tagged with this VBench "
                        "dimension")
    p.add_argument("--neg-prompt", type=str, default=None)
    p.add_argument("--ckpt-dir", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save-path", type=str, default="output.mp4")
    p.add_argument("--infer-steps", type=int, default=None)
    p.add_argument("--video-size", type=int, nargs=2, default=None,
                   metavar=("W", "H"))
    p.add_argument("--video-length", type=int, default=None)
    p.add_argument("--sa-drop-rates", type=float, nargs="*", default=None)
    p.add_argument("--p-remain-rates", type=float, default=None)
    p.add_argument("--curve-type", type=str, default=None,
                   choices=["gilbert", "sliced", "transposed"],
                   help="space-filling curve for token reordering")
    p.add_argument("--q-group", type=_q_group_arg, default=None,
                   help="shared-gather attention: this many query blocks "
                        "share one KV gather (presets default to 8 — the "
                        "benchmarked production config; with joint "
                        "selection the gather bytes drop q_group x, "
                        "measured 567->327 ms/layer at Jenga-Base "
                        "density. 1 = reference-exact per-row kernel)")
    p.add_argument("--no-joint-sel", action="store_true",
                   help="with --q-group > 1: keep the reference's exact "
                        "per-128-row block selection (union-list gather + "
                        "per-row masking) instead of the TPU-tuned joint "
                        "group selection (one pooled selection per group)")
    p.add_argument("--latents-only", action="store_true",
                   help="skip VAE decode, dump latents .npy")
    p.add_argument("--tiny", action="store_true",
                   help="tiny random model (CI smoke runs)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend")
    p.add_argument("--compile-cache-dir", type=str, default=None,
                   help="persistent XLA compile cache directory (default "
                        "~/.cache/jenga_tpu/xla or $JENGA_COMPILE_CACHE; "
                        "makes the second run skip the minutes-long stage "
                        "compiles — see COMPILE.json / RUNBOOK.md)")
    p.add_argument("--no-compile-cache", action="store_true",
                   help="disable the persistent compile cache")
    p.add_argument("--ulysses-degree", type=int, default=1,
                   help="sequence-parallel degree (mesh over the first N "
                        "devices; Ulysses attention + FSDP params)")
    p.add_argument("--ring-degree", type=int, default=1,
                   help="outer ring-attention axis: uses "
                        "ring_degree x ulysses_degree devices (dense "
                        "attention only — carving needs --ring-degree 1; "
                        "reference world == ring x ulysses contract)")
    p.add_argument("--prompt-extend-model", type=str, default=None,
                   help="HF dir of a llama/Qwen2 LM used to expand the "
                        "prompt before encoding (reference "
                        "--use_prompt_extend)")
    p.add_argument("--prompt-extend-mode", default="t2v",
                   choices=["t2v", "i2v", "vl", "rewrite", "master"],
                   help="'vl' loads a llava-format dir and grounds the "
                        "expansion in the conditioning image "
                        "(--i2v-image-path; reference QwenVL expander)")
    p.add_argument("--prompt-extend-method", default="local",
                   choices=["local", "api"],
                   help="'api' posts to an OpenAI/DashScope-compatible "
                        "chat endpoint (env DASH_API_KEY, "
                        "PROMPT_EXTEND_API_URL) instead of loading a "
                        "local model — the reference's dashscope expander")
    p.add_argument("--prompt-extend-api-model", default="qwen-plus",
                   help="remote model name for --prompt-extend-method api")


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser("jenga_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    h = sub.add_parser("hyvideo-t2v", help="HunyuanVideo text-to-video")
    _common(h)
    h.add_argument("--preset", default="base",
                   choices=["base", "turbo", "flash", "3stage", "accvideo"])
    h.add_argument("--embedded-cfg-scale", type=float, default=6.0)
    h.add_argument("--use-fp8", action="store_true")
    h.add_argument("--use-cpu-offload", action="store_true",
                   help="keep VAE + text-encoder weights in host RAM and "
                        "run those stages on CPU (reference "
                        "--use-cpu-offload)")

    i = sub.add_parser("hyvideo-i2v", help="HunyuanVideo image-to-video")
    _common(i)
    i.add_argument("--preset", default="base", choices=["base"])
    i.add_argument("--i2v-image-path", type=str, required=False)
    i.add_argument("--i2v-condition-type", default="token_replace",
                   choices=["token_replace", "latent_concat"])
    i.add_argument("--i2v-stability", action="store_true", default=True)
    i.add_argument("--i2v-resolution", default="720p",
                   choices=["720p", "540p", "360p"],
                   help="aspect-ratio bucket base when --video-size is "
                        "not given")
    i.add_argument("--lora-path", type=str, default=None,
                   help="kohya LoRA safetensors to merge into the DiT")
    i.add_argument("--use-cpu-offload", action="store_true",
                   help="keep VAE + text-encoder weights in host RAM "
                        "(see hyvideo-t2v)")

    w = sub.add_parser("wan-t2v", help="Wan2.1 text-to-video")
    _common(w)
    w.add_argument("--task", default="t2v-1.3B",
                   choices=["t2v-1.3B", "t2v-14B"])
    w.add_argument("--preset", default="1.3b-base",
                   choices=["1.3b-base", "1.3b-turbo", "14b-base",
                            "14b-turbo"])
    w.add_argument("--sample-shift", type=float, default=None)
    w.add_argument("--t5-cpu", action="store_true",
                   help="keep the UMT5 encoder on host CPU")
    w.add_argument("--enable-turbo", action="store_true")
    w.add_argument("--teacache-thresh", type=float, default=None)
    w.add_argument("--sample-solver", default=None,
                   choices=["unipc", "dpm++"])

    wi = sub.add_parser("wan-i2v", help="Wan2.1 image-to-video")
    _common(wi)
    wi.add_argument("--image", type=str, required=False)
    wi.add_argument("--max-area", type=int, default=720 * 1280)

    return ap


def _save_output(path, out, latents_only=False):
    import numpy as np
    if latents_only or out.ndim != 4 or out.shape[0] != 3:
        path = path.rsplit(".", 1)[0] + ".npy"
        np.save(path, np.asarray(out))
        print(f"saved latents to {path}")
    else:
        from .utils.video import save_video
        path = save_video(path, np.asarray(out))
        print(f"saved video to {path}")
    return path


def _save(args, out):
    _save_output(args.save_path, out, args.latents_only)


def _maybe_extend_prompt(args, prompt):
    use_api = getattr(args, "prompt_extend_method", "local") == "api"
    if not args.prompt_extend_model and not use_api:
        return prompt
    from .text.prompt_extend import (APIExpander, LocalLLMExpander,
                                     LocalVLExpander, PromptExpander)
    if args.prompt_extend_mode == "vl":
        image = getattr(args, "i2v_image_path", None) \
            or getattr(args, "image", None)
        if not image:
            raise SystemExit("--prompt-extend-mode vl needs an input "
                             "image (--i2v-image-path / --image)")
        chat = (APIExpander(model=args.prompt_extend_api_model) if use_api
                else LocalVLExpander(args.prompt_extend_model))
        expander = PromptExpander(chat_fn=chat, mode="vl")
        extended = expander(prompt, image=image)
    else:
        chat = (APIExpander(model=args.prompt_extend_api_model) if use_api
                else LocalLLMExpander(args.prompt_extend_model))
        expander = PromptExpander(chat_fn=chat,
                                  mode=args.prompt_extend_mode)
        extended = expander(prompt)
    print(f"extended prompt: {extended}")
    return extended


def _maybe_run_batch(args, generate_fn):
    """If --prompt-file was given, run the batch loop and return True.

    Default: the reference's id-stamped naming + resume
    (`/root/reference/jenga_wan.py:947-981`). With --vbench: the VBench
    evaluation protocol — full_info.json input, {prompt}-{i}.mp4 naming,
    --vbench-samples per prompt with per-sample seeds."""
    if not args.prompt_file:
        return False
    suffix = ".npy" if args.latents_only else ".mp4"
    if getattr(args, "vbench", False):
        from .batch import load_vbench_info, run_vbench_batch
        infos = load_vbench_info(args.prompt_file,
                                 dimension=args.vbench_dimension,
                                 chunk_num=args.chunk_num,
                                 cur_id=args.cur_id)
        print(f"vbench: {len(infos)} prompts x {args.vbench_samples} "
              f"samples (shard {args.cur_id}/{args.chunk_num})")
        run_vbench_batch(
            infos, lambda p, s: generate_fn(p, seed=s),
            lambda p, o: _save_output(p, o, args.latents_only),
            args.out_dir, samples_per_prompt=args.vbench_samples,
            suffix=suffix, seed=args.seed)
        return True
    from .batch import load_prompt_list, run_batch
    items = load_prompt_list(args.prompt_file, args.remain_list,
                             args.chunk_num, args.cur_id)
    print(f"batch: {len(items)} prompts "
          f"(shard {args.cur_id}/{args.chunk_num})")
    run_batch(items, generate_fn,
              lambda p, o: _save_output(p, o, args.latents_only),
              args.out_dir, suffix=suffix, seed=args.seed)
    return True


def _apply_backend(args):
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    # persistent XLA compile cache: every ProRes stage is its own (up to
    # 115k-token) program, minutes cold / seconds warm — COMPILE.json has
    # the measured per-program deltas. On by default; --no-compile-cache
    # or JENGA_COMPILE_CACHE=off disables.
    if getattr(args, "no_compile_cache", False):
        from .utils.compile_cache import disable_compile_cache
        disable_compile_cache()   # pin the decision so the sampler's
        #                           ensure_compile_cache() stays a no-op
    else:
        from .utils.compile_cache import enable_compile_cache
        enable_compile_cache(getattr(args, "compile_cache_dir", None))


def run_hyvideo_t2v(args):
    _apply_backend(args)
    import dataclasses as _dc
    import jax.numpy as jnp
    from .configs.presets import get_hy_preset
    from .runtime import HunyuanVideoSampler

    over = {}
    if args.infer_steps:
        over["num_inference_steps"] = args.infer_steps
    if args.video_size:
        over["size"] = tuple(args.video_size)
    if args.video_length:
        over["video_length"] = args.video_length
    if args.sa_drop_rates:
        over["sa_drop_rates"] = tuple(args.sa_drop_rates)
    if args.p_remain_rates is not None:
        over["p_remain"] = args.p_remain_rates
    if args.curve_type:
        over["curve"] = args.curve_type
    if args.q_group is not None:
        over["q_group"] = args.q_group
    if args.no_joint_sel:
        over["joint_sel"] = False
    over["seed"] = args.seed
    over["embedded_guidance_scale"] = args.embedded_cfg_scale
    opts = get_hy_preset(args.preset, **over)

    sampler = _hy_sampler(args, i2v=False)

    def gen(prompt, seed=None):
        o = opts if seed is None else _dc.replace(opts, seed=seed)
        if sampler.text_encoder is not None:
            return sampler.predict_prompt(prompt=prompt, opts=o,
                                          negative_prompt=args.neg_prompt,
                                          decode=not args.latents_only)
        # no encoder checkpoints: zero embeddings (smoke mode)
        txt, mask, txt2 = _zero_hy_text(sampler.cfg)
        return sampler.predict(txt, mask, txt2, o,
                               decode=not args.latents_only)

    if _maybe_run_batch(args, gen):
        return
    t0 = time.time()
    out = gen(_maybe_extend_prompt(args, args.prompt))
    print(json.dumps({"gen_time_s": round(time.time() - t0, 2)}))
    _save(args, out)


def _hy_sampler(args, i2v: bool):
    from .runtime import HunyuanVideoSampler
    if args.tiny:
        from .models.hyvideo import HYVideoConfig, init_hyvideo_params
        import jax as _jax
        cfg = HYVideoConfig(hidden_size=128, heads_num=2, double_blocks=1,
                            single_blocks=1, rope_dim_list=(16, 24, 24),
                            text_states_dim=64, text_states_dim_2=24,
                            refiner_depth=1, dtype="float32",
                            i2v_condition_type=("token_replace" if i2v
                                                else None))
        mesh = None
        ring = getattr(args, "ring_degree", 1)
        if args.ulysses_degree > 1 or ring > 1:
            from .parallel.mesh import make_sp_mesh
            mesh = make_sp_mesh(
                _jax.devices()[:args.ulysses_degree * ring], ring=ring)
        return HunyuanVideoSampler(
            cfg, init_hyvideo_params(_jax.random.PRNGKey(args.seed), cfg),
            i2v=i2v, mesh=mesh)
    return HunyuanVideoSampler.from_pretrained(
        args.ckpt_dir, i2v=i2v, seed=args.seed,
        use_fp8=getattr(args, "use_fp8", False),
        lora_path=getattr(args, "lora_path", None),
        sp_degree=args.ulysses_degree,
        ring_degree=getattr(args, "ring_degree", 1),
        use_cpu_offload=getattr(args, "use_cpu_offload", False))


def _zero_hy_text(cfg, length=256):
    import jax.numpy as jnp
    return (jnp.zeros((length, cfg.text_states_dim)),
            jnp.ones((length,), jnp.int32),
            jnp.zeros((cfg.text_states_dim_2,)))


def run_hyvideo_i2v(args):
    _apply_backend(args)
    import jax.numpy as jnp
    import numpy as np
    from .configs.presets import get_hy_preset
    from .pipelines.hyvideo_i2v import HYI2VOptions

    over = {"seed": args.seed,
            "i2v_condition_type": args.i2v_condition_type,
            "i2v_stability": args.i2v_stability}
    if args.infer_steps:
        over["num_inference_steps"] = args.infer_steps
    if args.video_size:
        over["size"] = tuple(args.video_size)
    if args.video_length:
        over["video_length"] = args.video_length
    if args.sa_drop_rates:
        over["sa_drop_rates"] = tuple(args.sa_drop_rates)
    if args.p_remain_rates is not None:
        over["p_remain"] = args.p_remain_rates
    if args.q_group is not None:
        over["q_group"] = args.q_group
    if args.no_joint_sel:
        over["joint_sel"] = False
    import dataclasses as _dc
    base = get_hy_preset(args.preset)
    i2v_fields = {f.name for f in _dc.fields(HYI2VOptions)}
    merged = {f.name: getattr(base, f.name) for f in _dc.fields(base)
              if f.name in i2v_fields}
    merged.update(over)
    opts = HYI2VOptions(**merged)

    sampler = _hy_sampler(args, i2v=True)

    image = None
    if args.i2v_image_path:
        from .runtime import load_image
        image = load_image(args.i2v_image_path)
        if not args.video_size:
            # aspect-ratio bucketing (reference
            # `/root/reference/jenga_hyi2v.py:284-297`)
            from .pipelines.hyvideo_i2v import (generate_crop_size_list,
                                                get_closest_ratio)
            bucket_base = {"720p": 960, "540p": 720, "360p": 480}[
                args.i2v_resolution]
            buckets = generate_crop_size_list(bucket_base, 32)
            ratios = [round(float(h) / float(w), 5) for h, w in buckets]
            (w, h), _ = get_closest_ratio(image.shape[1], image.shape[2],
                                          ratios, buckets)
            merged["size"] = (w, h)
            opts = HYI2VOptions(**merged)
    shapes = sampler.pipeline._stage_shapes(opts)
    if image is not None:
        if sampler.vae_params is not None:
            # per-stage conditioning latents at each stage's LATENT dims
            image_latents = [
                np.asarray(sampler.encode_image_latent(image, lat[1],
                                                       lat[2]))
                for (lat, _) in shapes]
        else:
            print("no VAE in ckpt dir: zero conditioning latents "
                  "(smoke mode)")
            image_latents = [np.zeros((16, 1, lat[1], lat[2]), np.float32)
                             for (lat, _) in shapes]
    else:
        if not args.tiny:
            raise SystemExit("hyvideo-i2v requires --i2v-image-path "
                             "(or --tiny for a smoke run)")
        image_latents = [np.zeros((16, 1, lat[1], lat[2]), np.float32)
                         for (lat, _) in shapes]

    prompt = _maybe_extend_prompt(args, args.prompt)
    if sampler.text_encoder is not None:
        lparams = sampler.text_encoder[2]
        if image is not None and "llm" in lparams:
            # full llava path: the prompt encoding sees the image
            txt, mask, txt2 = sampler.encode_prompt_i2v(
                prompt, image, mode="video",
                i2v_condition_type=args.i2v_condition_type)
        else:
            txt, mask, txt2 = sampler.encode_prompt(prompt, mode="image")
    else:
        txt, mask, txt2 = _zero_hy_text(sampler.cfg)
    t0 = time.time()
    out = sampler.pipeline.generate_i2v(
        image_latents, txt, mask, txt2, opts,
        decode=not args.latents_only)
    print(json.dumps({"gen_time_s": round(time.time() - t0, 2)}))
    _save(args, out)


def run_wan_t2v(args):
    _apply_backend(args)
    import jax.numpy as jnp
    from .configs.presets import get_wan_preset
    from .runtime import WanSampler

    over = {"seed": args.seed}
    if args.infer_steps:
        over["sampling_steps"] = args.infer_steps
    if args.video_size:
        over["size"] = tuple(args.video_size)
    if args.video_length:
        over["frame_num"] = args.video_length
    if args.sa_drop_rates:
        over["sa_drop_rates"] = tuple(args.sa_drop_rates)
    if args.p_remain_rates is not None:
        over["p_remain"] = args.p_remain_rates
    if args.curve_type:
        over["curve"] = args.curve_type
    if args.sample_shift is not None:
        over["shift"] = args.sample_shift
    if args.q_group is not None:
        over["q_group"] = args.q_group
    if args.no_joint_sel:
        over["joint_sel"] = False
    if args.enable_turbo:
        over["enable_turbo"] = True
    if args.teacache_thresh is not None:
        over["teacache_thresh"] = args.teacache_thresh
    if getattr(args, "sample_solver", None):
        over["solver"] = args.sample_solver
    opts = get_wan_preset(args.preset, **over)

    sampler = _wan_sampler(args, i2v=False)

    def gen(prompt, seed=None):
        import dataclasses as _dc
        o = opts if seed is None else _dc.replace(opts, seed=seed)
        if sampler.t5 is not None:
            return sampler.generate_prompt(
                prompt, o, negative_prompt=args.neg_prompt or "",
                decode=not args.latents_only)
        ctx = jnp.zeros((64, sampler.cfg.text_dim))
        return sampler.generate(ctx, jnp.zeros_like(ctx), o,
                                decode=not args.latents_only)

    if _maybe_run_batch(args, gen):
        return
    t0 = time.time()
    out = gen(_maybe_extend_prompt(args, args.prompt))
    print(json.dumps({"gen_time_s": round(time.time() - t0, 2)}))
    _save(args, out)


def _wan_sampler(args, i2v: bool):
    from .runtime import WanSampler
    if args.tiny:
        from .models.wan import WanConfig, init_wan_params
        import jax as _jax
        cfg = WanConfig(dim=128, ffn_dim=256, freq_dim=32, num_heads=2,
                        num_layers=2, text_dim=64, text_len=16,
                        dtype="float32",
                        model_type="i2v" if i2v else "t2v",
                        in_dim=36 if i2v else 16)
        return WanSampler(cfg, init_wan_params(
            _jax.random.PRNGKey(args.seed), cfg))
    task = getattr(args, "task", "i2v-14B" if i2v else "t2v-1.3B")
    if i2v:
        task = "i2v-14B"
    return WanSampler.from_pretrained(
        task, args.ckpt_dir, seed=args.seed,
        t5_on_host=getattr(args, "t5_cpu", False),
        sp_degree=args.ulysses_degree,
        ring_degree=getattr(args, "ring_degree", 1))


def run_wan_i2v(args):
    _apply_backend(args)
    import numpy as np
    import jax.numpy as jnp
    from .pipelines.wan_i2v import WanI2VOptions, i2v_latent_size

    # wan-i2v has no named preset; default to the same q_group=8
    # production config the presets carry (configs/presets.py docstring)
    over = {"seed": args.seed, "max_area": args.max_area, "q_group": 8}
    if args.q_group is not None:
        over["q_group"] = args.q_group
    if args.no_joint_sel:
        over["joint_sel"] = False
    if args.max_area <= 832 * 480:
        # reference drops the flow shift to 3.0 for 480p-class sizes
        # (`/root/reference/jenga_wan.py:677-679`)
        over["shift"] = 3.0
    if args.infer_steps:
        over["sampling_steps"] = args.infer_steps
    if args.video_length:
        over["frame_num"] = args.video_length
    if args.sa_drop_rates:
        over["sa_drop_rates"] = tuple(args.sa_drop_rates)
    if args.p_remain_rates is not None:
        over["p_remain"] = args.p_remain_rates
    opts = WanI2VOptions(**over)

    sampler = _wan_sampler(args, i2v=True)
    t0 = time.time()
    if args.image and sampler.t5 is not None:
        from .runtime import load_image
        out = sampler.generate_image(load_image(args.image),
                                     _maybe_extend_prompt(args,
                                                          args.prompt),
                                     opts,
                                     negative_prompt=args.neg_prompt or "",
                                     decode=not args.latents_only)
    else:
        if not args.tiny:
            raise SystemExit("wan-i2v requires --image and a ckpt dir with "
                             "T5 + CLIP (or --tiny for a smoke run)")
        # smoke: synthetic conditioning at a small latent size
        lat_h, lat_w = 16, 16
        frame_num = args.video_length or 9
        img_lat = np.zeros((16, (frame_num - 1) // 4 + 1, lat_h, lat_w),
                           np.float32)
        clip_fea = np.zeros((257, 1280), np.float32)
        ctx = jnp.zeros((64, sampler.cfg.text_dim))
        opts = WanI2VOptions(**{**over, "frame_num": frame_num})
        out = sampler.pipeline.generate_i2v(
            img_lat, clip_fea, ctx, jnp.zeros_like(ctx), frame_num,
            lat_h, lat_w, opts, decode=not args.latents_only)
    print(json.dumps({"gen_time_s": round(time.time() - t0, 2)}))
    _save(args, out)


def main(argv=None):
    args = build_parser().parse_args(argv)
    from .utils.logging import get_logger, log_args
    # rank-gating uses the env var so logging needs no backend init (the
    # --cpu flag must be applied before the first jax call)
    import os as _os
    logger = get_logger(rank=int(_os.environ.get("JAX_PROCESS_INDEX", "0")))
    log_args(logger, args)
    if args.cmd == "hyvideo-t2v":
        run_hyvideo_t2v(args)
    elif args.cmd == "hyvideo-i2v":
        run_hyvideo_i2v(args)
    elif args.cmd == "wan-t2v":
        run_wan_t2v(args)
    elif args.cmd == "wan-i2v":
        run_wan_i2v(args)


if __name__ == "__main__":
    main()
