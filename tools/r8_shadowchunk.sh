#!/bin/sh
# Anyhit chunk-size sweep at leaf 12 (closest set just moved 9216 ->
# 11264): the no-normals anyhit tables cost ~45B/tri at leaf 12, SMEM
# model cap ~21.8k tris. 13824 was the leaf-4-era 1.5x value.
# Then: reference at the new CHUNK_TRIS=11264 default, and the stage
# decomposition at final defaults.
set -x
cd /root/repo
for sh in 16896 20480; do
  RAYTPU_CHUNK_TRIS_SHADOW=$sh \
    timeout 2400 python tools/r7_skyquad_ab.py config4 asbuilt
done
timeout 2400 python tools/r7_skyquad_ab.py reference asbuilt
R7_SELFTEST=0 timeout 3600 python tools/r7_state.py
