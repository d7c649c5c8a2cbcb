#!/usr/bin/env bash
# HunyuanVideo T2V, Jenga-Base preset (reference scripts/hyvideo_jenga_base.sh)
python -m jenga_tpu.cli hyvideo-t2v --preset base \
    --video-size 1280 720 --video-length 125 --infer-steps 50 "$@"
