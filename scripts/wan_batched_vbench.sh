#!/usr/bin/env bash
# VBench-style batched generation with resume
# usage: scripts/wan_batched_vbench.sh prompts.json outputs/ [extra flags]
PROMPTS=$1; OUT=$2; shift 2
python -m jenga_tpu.cli wan-t2v --task t2v-1.3B --preset 1.3b-base \
    --prompt-file "$PROMPTS" --out-dir "$OUT" "$@"
