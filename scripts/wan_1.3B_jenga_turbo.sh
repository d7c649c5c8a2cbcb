#!/usr/bin/env bash
python -m jenga_tpu.cli wan-t2v --task t2v-1.3B --preset 1.3b-turbo \
    --enable-turbo --video-size 832 480 --video-length 81 "$@"
