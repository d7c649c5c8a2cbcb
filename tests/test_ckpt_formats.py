"""Checkpoint-format loaders: sharded safetensors, fp8 + scale map, LoRA
merge — each against a synthetic file in the exact reference layout."""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from jenga_tpu.convert import (load_fp8_state_dict, merge_lora,
                               load_safetensors_state_dict)


def test_safetensors_single_file(tmp_path):
    from safetensors.numpy import save_file
    sd = {"a.weight": np.random.randn(4, 3).astype(np.float32),
          "b.bias": np.zeros(7, np.float32)}
    fp = str(tmp_path / "model.safetensors")
    save_file(sd, fp)
    out = load_safetensors_state_dict(fp)
    assert set(out) == set(sd)
    np.testing.assert_array_equal(out["a.weight"], sd["a.weight"])
    # directory form
    out2 = load_safetensors_state_dict(str(tmp_path))
    assert set(out2) == set(sd)


def test_safetensors_sharded_index(tmp_path):
    """Wan-14B style: diffusion_pytorch_model-0000x-of-0000y.safetensors +
    index json."""
    from safetensors.numpy import save_file
    shard1 = {"blocks.0.w": np.ones((2, 2), np.float32)}
    shard2 = {"blocks.1.w": np.full((2, 2), 2.0, np.float32)}
    f1 = "diffusion_pytorch_model-00001-of-00002.safetensors"
    f2 = "diffusion_pytorch_model-00002-of-00002.safetensors"
    save_file(shard1, str(tmp_path / f1))
    save_file(shard2, str(tmp_path / f2))
    index = {"metadata": {}, "weight_map": {"blocks.0.w": f1,
                                            "blocks.1.w": f2}}
    with open(tmp_path / "diffusion_pytorch_model.safetensors.index.json",
              "w") as f:
        json.dump(index, f)
    out = load_safetensors_state_dict(str(tmp_path))
    assert out["blocks.0.w"][0, 0] == 1.0
    assert out["blocks.1.w"][0, 0] == 2.0


def test_fp8_checkpoint_roundtrip(tmp_path):
    """fp8 ckpt (*_fp8.pt weights + *_fp8_map.pt scales) dequantizes to the
    original values within e4m3 precision (reference layout,
    `/root/reference/hyvideo/modules/fp8_optimization.py:82-102`)."""
    torch.manual_seed(0)
    w = torch.randn(8, 8) * 3.0
    maxval = 448.0
    scale = w.abs().max() / maxval
    w8 = (w / scale).to(torch.float8_e4m3fn)
    sd = {"double_blocks.0.img_attn_qkv.weight": w8,
          "double_blocks.0.img_attn_qkv.bias": torch.zeros(8)}
    fp8_map = {"double_blocks.0.img_attn_qkv": scale}
    dit = str(tmp_path / "pytorch_model_fp8.pt")
    torch.save(sd, dit)
    torch.save(fp8_map, str(tmp_path / "pytorch_model_fp8_map.pt"))
    out = load_fp8_state_dict(dit)
    deq = out["double_blocks.0.img_attn_qkv.weight"]
    assert deq.dtype == torch.float32
    rel = (deq - w).abs().max() / w.abs().max()
    assert float(rel) < 0.07  # e4m3 has ~2 mantissa bits


def test_fp8_missing_map_raises(tmp_path):
    dit = str(tmp_path / "model_fp8.pt")
    torch.save({"w": torch.zeros(2)}, dit)
    with pytest.raises(FileNotFoundError):
        load_fp8_state_dict(dit)


def test_lora_merge_kohya():
    torch.manual_seed(1)
    w = torch.randn(12, 8)
    sd = {"double_blocks.0.img_attn_qkv.weight": w.clone()}
    rank = 2
    down = torch.randn(rank, 8)
    up = torch.randn(12, rank)
    lora = {
        "Hunyuan_video_I2V_lora_double_blocks_0_img_attn_qkv"
        ".lora_down.weight": down,
        "Hunyuan_video_I2V_lora_double_blocks_0_img_attn_qkv"
        ".lora_up.weight": up,
        "Hunyuan_video_I2V_lora_double_blocks_0_img_attn_qkv"
        ".alpha": torch.tensor(4.0),
    }
    merged = merge_lora(sd, lora, alpha=1.0, prefix="Hunyuan_video_I2V")
    expected = w + (4.0 / rank) * (up @ down)
    np.testing.assert_allclose(
        merged["double_blocks.0.img_attn_qkv.weight"].numpy(),
        expected.numpy(), atol=1e-5)


def test_lora_merge_unknown_target_raises():
    lora = {"lora_nonexistent_layer.lora_down.weight": torch.zeros(1, 4),
            "lora_nonexistent_layer.lora_up.weight": torch.zeros(4, 1)}
    with pytest.raises(KeyError):
        merge_lora({"a.weight": torch.zeros(4, 4)}, lora)
