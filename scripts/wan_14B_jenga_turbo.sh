#!/usr/bin/env bash
python -m jenga_tpu.cli wan-t2v --task t2v-14B --preset 14b-turbo \
    --enable-turbo --t5-cpu --video-size 1280 720 --video-length 81 "$@"
