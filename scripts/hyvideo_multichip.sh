#!/usr/bin/env bash
# 8-chip Ulysses sequence parallelism (reference jenga_hyvideo_multigpu.py)
python -m jenga_tpu.cli hyvideo-t2v --preset base --ulysses-degree 8 \
    --video-size 1280 720 --video-length 125 --infer-steps 50 "$@"
