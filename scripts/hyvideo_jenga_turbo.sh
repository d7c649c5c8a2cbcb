#!/usr/bin/env bash
python -m jenga_tpu.cli hyvideo-t2v --preset turbo \
    --video-size 1280 720 --video-length 125 --infer-steps 50 "$@"
