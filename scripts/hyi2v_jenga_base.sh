#!/usr/bin/env bash
# HunyuanVideo I2V, Jenga-Base (reference scripts/hyi2v_jenga_base.sh)
python -m jenga_tpu.cli hyvideo-i2v --preset base \
    --i2v-resolution 720p --video-length 125 --infer-steps 50 "$@"
