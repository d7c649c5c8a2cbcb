"""CLI smoke tests (tiny models, CPU backend)."""

import os
import subprocess
import sys


def _run(args, n_devices: int = 1):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    if n_devices > 1:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                            f" --xla_force_host_platform_device_count="
                            f"{n_devices}")
    return subprocess.run(
        [sys.executable, "-m", "jenga_tpu.cli", *args],
        capture_output=True, text=True, env=env, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_wan_t2v_tiny(tmp_path):
    out = str(tmp_path / "v.npy")
    r = _run(["wan-t2v", "--tiny", "--cpu", "--video-size", "96", "64",
              "--video-length", "9", "--infer-steps", "2",
              "--latents-only", "--save-path", out])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out)


def test_hyvideo_t2v_tiny(tmp_path):
    out = str(tmp_path / "v.npy")
    r = _run(["hyvideo-t2v", "--tiny", "--cpu", "--preset", "base",
              "--video-size", "96", "64", "--video-length", "5",
              "--infer-steps", "2", "--latents-only", "--save-path", out])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out)


def test_hyvideo_i2v_tiny(tmp_path):
    out = str(tmp_path / "v.npy")
    r = _run(["hyvideo-i2v", "--tiny", "--cpu",
              "--video-size", "96", "64", "--video-length", "5",
              "--infer-steps", "2", "--latents-only", "--save-path", out])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out)


def test_hyvideo_t2v_tiny_ring_ulysses(tmp_path):
    """--ring-degree x --ulysses-degree composes the 2-D dense
    ring x ulysses mesh through the CLI (reference world == ring x
    ulysses contract, hyvideo/config.py:451-468); 4 of 8 CPU devices."""
    out = str(tmp_path / "v.npy")
    r = _run(["hyvideo-t2v", "--tiny", "--cpu", "--preset", "base",
              "--video-size", "96", "64", "--video-length", "5",
              "--infer-steps", "2", "--latents-only", "--save-path", out,
              "--ulysses-degree", "2", "--ring-degree", "2"],
             n_devices=8)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out)


def test_wan_i2v_tiny(tmp_path):
    out = str(tmp_path / "v.npy")
    r = _run(["wan-i2v", "--tiny", "--cpu", "--video-length", "9",
              "--infer-steps", "2", "--latents-only", "--save-path", out])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out)


def test_wan_t2v_tiny_vbench(tmp_path):
    import json
    info = tmp_path / "full_info.json"
    info.write_text(json.dumps([
        {"prompt_en": "a red cube", "dimension": ["subject_consistency"]},
        {"prompt_en": "skip me", "dimension": ["other_dim"]},
    ]))
    out_dir = str(tmp_path / "vids")
    r = _run(["wan-t2v", "--tiny", "--cpu", "--video-size", "96", "64",
              "--video-length", "9", "--infer-steps", "2",
              "--latents-only", "--prompt-file", str(info),
              "--vbench", "--vbench-samples", "2",
              "--vbench-dimension", "subject_consistency",
              "--out-dir", out_dir])
    assert r.returncode == 0, r.stderr[-2000:]
    # protocol naming: {prompt}-{i}.npy, one per sample, filtered dimension
    assert os.path.exists(os.path.join(out_dir, "a red cube-0.npy"))
    assert os.path.exists(os.path.join(out_dir, "a red cube-1.npy"))
    assert not os.path.exists(os.path.join(out_dir, "skip me-0.npy"))
