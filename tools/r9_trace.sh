#!/bin/sh
# Round-4 (session 2) opening profile: op-level trace of the two heavy
# presets at the shipped defaults (leaf 12, CHUNK_TRIS 11264, fused
# epilogue, light shadow order, per-scene skybox layout). One process per
# preset. Output -> /tmp/r9_trace_{config4,config5,reference}.log
set -x
cd "$(dirname "$0")/.."
for P in config4 config5; do
  TRACE_PRESET=$P timeout 1800 python tools/r4_profile_trace.py \
    > /tmp/r9_trace_$P.log 2>&1
done
echo DONE
