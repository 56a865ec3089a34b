#!/bin/sh
# Leaf-12 default regression check on the remaining presets (coherent
# small scenes were neutral across 4->7; confirm at 12), then the
# config4 chunk re-sweep at the new leaf.
set -x
cd /root/repo
for preset in reference config2 config3 config1; do
  timeout 2400 python tools/r7_skyquad_ab.py "$preset" asbuilt
done
C5_PRESET=config4 C5_CHUNKS=6144,9216,11264 C5_FRAMES=24 \
  timeout 3600 python tools/r7_c5chunk.py
