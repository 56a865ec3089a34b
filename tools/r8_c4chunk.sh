#!/bin/sh
# config4 chunk_tris re-sweep at leaf 7: CHUNK_TRIS=9216 was sized for
# leaf-4 node-heavy trees; at leaf 7 smem_bytes(nodes(T), T) stays under
# budget to ~11.5k tris. One process, shapes differ per leg (fresh
# executables); 9216 rides along as the same-session baseline.
set -x
cd /root/repo
C5_PRESET=config4 C5_CHUNKS=6144,9216,11264 C5_FRAMES=24 \
  timeout 3600 python tools/r7_c5chunk.py
