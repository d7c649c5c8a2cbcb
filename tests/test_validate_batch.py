"""Input validation + batched prompt-list runner tests."""

import dataclasses
import json
import os

import numpy as np
import pytest

from jenga_tpu.batch import load_prompt_list, run_batch
from jenga_tpu.configs.validate import (ValidationError, validate_hy_options,
                                        validate_wan_options)
from jenga_tpu.pipelines.hyvideo_t2v import HYT2VOptions
from jenga_tpu.pipelines.wan_t2v import WanT2VOptions


class TestValidateHY:
    def test_defaults_pass(self):
        validate_hy_options(HYT2VOptions())

    @pytest.mark.parametrize("bad", [
        dict(video_length=10),                       # not 4k+1
        dict(size=(1281, 720)),                      # not /16
        dict(num_inference_steps=0),
        dict(res_rate_list=(0.5, 1.0), step_rate_list=(1.0,)),
        dict(res_rate_list=(1.0, 0.5)),              # last stage not full
        dict(step_rate_list=(1.0, 0.5)),             # not ascending
        dict(sa_drop_rates=()),
        dict(sa_drop_rates=(1.0,)),                  # drop >= 1
        dict(p_remain=0.0),
        dict(txt_block_num=0),
    ])
    def test_bad_options_raise(self, bad):
        with pytest.raises(ValidationError):
            validate_hy_options(dataclasses.replace(HYT2VOptions(), **bad))

    def test_video_length_one_ok(self):
        validate_hy_options(dataclasses.replace(HYT2VOptions(),
                                                video_length=1))


class TestValidateWan:
    def test_defaults_pass(self):
        validate_wan_options(WanT2VOptions())

    @pytest.mark.parametrize("bad", [
        dict(frame_num=80),
        dict(size=(830, 480)),
        dict(sampling_steps=-1),
        dict(sa_drop_rates=(0.5, 1.5)),
        dict(p_remain=1.5),
        dict(guide_scale=-1.0),
        dict(enable_turbo=True, turbo_switch_step=100),
    ])
    def test_bad_options_raise(self, bad):
        with pytest.raises(ValidationError):
            validate_wan_options(dataclasses.replace(WanT2VOptions(), **bad))


class TestPromptList:
    def _write_json(self, tmp_path, items):
        p = tmp_path / "prompts.json"
        p.write_text(json.dumps(items))
        return str(p)

    def test_json_with_ids(self, tmp_path):
        path = self._write_json(tmp_path, [
            {"prompt_en": "a cat", "id": 3},
            {"prompt_en": "a dog", "id": 12},
        ])
        items = load_prompt_list(path)
        assert items == [("0003", "a cat"), ("0012", "a dog")]

    def test_json_without_ids_uses_index(self, tmp_path):
        path = self._write_json(tmp_path, [{"prompt_en": "x"},
                                           {"prompt_en": "y"}])
        assert load_prompt_list(path) == [("0000", "x"), ("0001", "y")]

    def test_remain_list_filters(self, tmp_path):
        path = self._write_json(tmp_path, [
            {"prompt_en": "a", "id": 1}, {"prompt_en": "b", "id": 2},
            {"prompt_en": "c", "id": 3}])
        remain = tmp_path / "remain.json"
        remain.write_text("[1, 3]")
        items = load_prompt_list(path, str(remain))
        assert [i for i, _ in items] == ["0001", "0003"]

    def test_txt_and_host_sharding(self, tmp_path):
        p = tmp_path / "prompts.txt"
        p.write_text("a\nb\nc\nd\n")
        shard0 = load_prompt_list(str(p), chunk_num=2, cur_id=0)
        shard1 = load_prompt_list(str(p), chunk_num=2, cur_id=1)
        assert shard0 == [("0000", "a"), ("0002", "c")]
        assert shard1 == [("0001", "b"), ("0003", "d")]


class TestRunBatch:
    def test_resume_skips_existing_and_isolates_failures(self, tmp_path):
        out_dir = str(tmp_path / "out")
        os.makedirs(out_dir)
        with open(os.path.join(out_dir, "0001.npy"), "w") as f:
            f.write("done")
        calls = []

        def gen(prompt):
            calls.append(prompt)
            if prompt == "boom":
                raise RuntimeError("boom")
            return np.zeros(3)

        def save(path, out):
            np.save(path, out)

        items = [("0001", "already"), ("0002", "boom"), ("0003", "fresh")]
        results = run_batch(items, gen, save, out_dir, suffix=".npy",
                            log=lambda *_: None)
        assert calls == ["boom", "fresh"]      # 0001 skipped
        assert results[0][2] == "skipped"
        assert results[1][2].startswith("error")
        assert results[2][2] == "ok"
        import glob
        # new outputs carry the id_time_seed_prompt stamp (reference
        # naming); the id prefix keeps resume deterministic
        assert glob.glob(os.path.join(out_dir, "0003_*seed0*.npy"))


class TestVBenchProtocol:
    def _write_info(self, tmp_path):
        p = tmp_path / "full_info.json"
        p.write_text(json.dumps([
            {"prompt_en": "a cat", "dimension": ["subject_consistency"]},
            {"prompt_en": "a dog running",
             "dimension": ["motion_smoothness", "subject_consistency"]},
            {"prompt_en": "static scene", "dimension": ["background"]},
        ]))
        return str(p)

    def test_load_vbench_info_and_dimension_filter(self, tmp_path):
        from jenga_tpu.batch import load_vbench_info
        path = self._write_info(tmp_path)
        infos = load_vbench_info(path)
        assert [i["prompt"] for i in infos] == [
            "a cat", "a dog running", "static scene"]
        assert infos[1]["dimensions"] == ["motion_smoothness",
                                          "subject_consistency"]
        only = load_vbench_info(path, dimension="subject_consistency")
        assert [i["prompt"] for i in only] == ["a cat", "a dog running"]
        shard = load_vbench_info(path, chunk_num=2, cur_id=1)
        assert [i["prompt"] for i in shard] == ["a dog running"]

    def test_vbench_naming_and_resume(self, tmp_path):
        from jenga_tpu.batch import run_vbench_batch, vbench_filename
        # the protocol's exact name: prompt text verbatim + "-{i}"
        assert vbench_filename("a cat", 0) == "a cat-0.mp4"
        assert vbench_filename("w/slash", 2, ".npy") == "w slash-2.npy"

        out_dir = str(tmp_path / "vids")
        os.makedirs(out_dir)
        with open(os.path.join(out_dir, "a cat-0.npy"), "w") as f:
            f.write("done")
        seeds = []

        def gen(prompt, seed):
            seeds.append((prompt, seed))
            return np.zeros(2)

        def save(path, out):
            np.save(path + ".tmp.npy", out)
            os.replace(path + ".tmp.npy", path)

        results = run_vbench_batch(
            [{"prompt": "a cat", "dimensions": []}], gen, save, out_dir,
            samples_per_prompt=3, suffix=".npy", log=lambda *_: None,
            seed=7)
        # sample 0 skipped (resume), 1 and 2 generated with seed 7+i
        assert [r[2] for r in results] == ["skipped", "ok", "ok"]
        assert seeds == [("a cat", 8), ("a cat", 9)]
        assert os.path.exists(os.path.join(out_dir, "a cat-1.npy"))
        assert os.path.exists(os.path.join(out_dir, "a cat-2.npy"))


class TestVBenchCLIEndToEnd:
    def test_vbench_path_produces_protocol_layout(self, tmp_path):
        """The full --vbench CLI path (VERDICT r4 item 7): tiny random
        model, 2 prompts x 2 samples, latents-only — asserts the exact
        file layout `vbench evaluate` ingests ({prompt}-{i}.npy verbatim
        prompt text, all samples present) and that a re-run resumes by
        skipping every existing file. Anchor:
        /root/reference/jenga_wan.py:950-972."""
        import numpy as np

        from jenga_tpu.cli import main

        info = [
            {"prompt_en": "a dog runs", "dimension": ["subject_consistency"]},
            {"prompt_en": "city at night", "dimension": ["scene"]},
        ]
        pf = tmp_path / "full_info.json"
        pf.write_text(json.dumps(info))
        out_dir = tmp_path / "videos"
        argv = ["wan-t2v", "--tiny", "--cpu", "--latents-only",
                "--infer-steps", "2", "--video-size", "64", "64",
                "--video-length", "9", "--vbench",
                "--vbench-samples", "2",
                "--prompt-file", str(pf), "--out-dir", str(out_dir)]
        main(argv)

        expect = {f"{p['prompt_en']}-{i}.npy"
                  for p in info for i in range(2)}
        got = set(os.listdir(out_dir))
        assert got == expect
        for name in expect:
            arr = np.load(out_dir / name)
            assert np.isfinite(arr).all() and arr.size > 0

        # resume: second invocation must skip all existing files
        # (overwrite mtimes would change if it regenerated)
        mtimes = {n: os.path.getmtime(out_dir / n) for n in expect}
        main(argv)
        assert {n: os.path.getmtime(out_dir / n) for n in expect} == mtimes

    def test_vbench_dimension_filter_via_cli(self, tmp_path):
        from jenga_tpu.cli import main

        info = [
            {"prompt_en": "a dog runs", "dimension": ["subject_consistency"]},
            {"prompt_en": "city at night", "dimension": ["scene"]},
        ]
        pf = tmp_path / "full_info.json"
        pf.write_text(json.dumps(info))
        out_dir = tmp_path / "videos"
        main(["wan-t2v", "--tiny", "--cpu", "--latents-only",
              "--infer-steps", "2", "--video-size", "64", "64",
              "--video-length", "9", "--vbench", "--vbench-samples", "1",
              "--vbench-dimension", "scene",
              "--prompt-file", str(pf), "--out-dir", str(out_dir)])
        assert set(os.listdir(out_dir)) == {"city at night-0.npy"}


def test_artifact_summary_reads_committed_artifacts():
    """tools/artifact_summary.py parses every committed BENCH artifact
    into well-formed rows (vs_baseline present, preset labels attached
    for multi-row files)."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tools.artifact_summary import rows
    rs = rows()
    assert rs, "no artifacts found"
    labels = {r["artifact"] for r in rs}
    assert any(l.startswith("PRORES:") for l in labels)
    for r in rs:
        assert isinstance(r["vs_baseline"], (int, float))
