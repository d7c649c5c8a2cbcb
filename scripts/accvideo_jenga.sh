#!/usr/bin/env bash
# AccVideo distilled checkpoint: 5 steps, turbo-style carving
python -m jenga_tpu.cli hyvideo-t2v --preset accvideo \
    --video-size 1280 720 --video-length 125 "$@"
