"""Named carving presets as typed data.

The reference encodes Base/Turbo/Flash/3Stage only in shell scripts
(`/root/reference/scripts/*.sh` — see BASELINE.md's table); here they are
first-class values consumed by the pipelines and the CLI.

All presets carry ``q_group=8`` (joint 8-row group selection feeding the
vectorized all-member shared-gather kernel) — the TPU production config
every committed BENCH artifact measures, with its granularity cost
pinned at zero added deviation in FIDELITY.json on EVERY production
family that ships the pick: Wan-1.3B Base (832x480x33f), the
Wan-14B architecture (5120x40h at 4/40 trunk, q8-vs-per-row 1.47%
matching per-row's own 1.50% deviation from dense), the HY ProRes
Turbo trajectory across the stage switch with text_amp + fixed-skip
(960x512x33f, q8-vs-per-row rel err 0.86%, below both arms' ~1.1%
deviation from dense), and HY-I2V token_replace with first-frame
conditioning (q8 0.96% vs per-row 1.04% from dense).
``--q-group 1`` / ``--no-joint-sel`` restore the reference-exact
per-128-row selection.
"""

from __future__ import annotations

import dataclasses

from ..pipelines.hyvideo_t2v import HYT2VOptions
from ..pipelines.wan_t2v import WanT2VOptions

__all__ = ["HY_PRESETS", "WAN_PRESETS", "get_hy_preset", "get_wan_preset"]


# HunyuanVideo presets (`/root/reference/scripts/hyvideo_jenga_*.sh:10-24`)
HY_PRESETS: dict[str, HYT2VOptions] = {
    "base": HYT2VOptions(
        q_group=8, sa_drop_rates=(0.75, 0.85), p_remain=0.3,
        res_rate_list=(1.0, 1.0), step_rate_list=(0.5, 1.0),
        scheduler_shift_list=(7.0, 7.0)),
    "turbo": HYT2VOptions(
        q_group=8, sa_drop_rates=(0.7, 0.8), p_remain=0.3,
        res_rate_list=(0.75, 1.0), step_rate_list=(0.5, 1.0),
        scheduler_shift_list=(7.0, 9.0)),
    "flash": HYT2VOptions(
        q_group=8, sa_drop_rates=(0.8, 0.95), p_remain=0.5,
        res_rate_list=(0.75, 1.0), step_rate_list=(0.5, 1.0),
        scheduler_shift_list=(7.0, 9.0)),
    "3stage": HYT2VOptions(
        q_group=8, sa_drop_rates=(0.75, 0.85, 0.85), p_remain=0.3,
        res_rate_list=(0.5, 0.75, 1.0), step_rate_list=(0.3, 0.5, 1.0),
        scheduler_shift_list=(7.0, 9.0, 11.0)),
    # distilled AccVideo: 5 steps, no CFG, turbo-style carving
    # (`/root/reference/scripts/accvideo_jenga.sh:12-30`)
    "accvideo": HYT2VOptions(
        q_group=8, num_inference_steps=5, sa_drop_rates=(0.7, 0.8),
        p_remain=0.3,
        res_rate_list=(0.75, 1.0), step_rate_list=(0.5, 1.0),
        scheduler_shift_list=(7.0, 9.0), enable_skip=False),
}

# Wan presets (`/root/reference/scripts/wan_*_jenga_*.sh`)
WAN_PRESETS: dict[str, WanT2VOptions] = {
    "1.3b-base": WanT2VOptions(
        q_group=8, sa_drop_rates=(0.75, 0.85), p_remain=0.9, shift=8.0,
        teacache_thresh=0.15, use_ret_steps=True),
    "1.3b-turbo": WanT2VOptions(
        q_group=8, sa_drop_rates=(0.75, 0.85), p_remain=0.9, shift=8.0,
        enable_turbo=True, teacache_thresh=0.15, use_ret_steps=True),
    "14b-base": WanT2VOptions(
        q_group=8, size=(1280, 720), sa_drop_rates=(0.7, 0.8), p_remain=0.8,
        shift=8.0, teacache_thresh=0.15, use_ret_steps=True),
    "14b-turbo": WanT2VOptions(
        q_group=8, size=(1280, 720), sa_drop_rates=(0.5, 0.9), p_remain=0.9,
        shift=8.0, enable_turbo=True, teacache_thresh=0.15,
        use_ret_steps=True),
}


def get_hy_preset(name: str, **overrides) -> HYT2VOptions:
    return dataclasses.replace(HY_PRESETS[name.lower()], **overrides)


def get_wan_preset(name: str, **overrides) -> WanT2VOptions:
    return dataclasses.replace(WAN_PRESETS[name.lower()], **overrides)
