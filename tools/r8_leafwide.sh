#!/bin/sh
# Leaf sizes past 7, unlocked by the 4-bit cnt repack (swap bit 26 -> 27).
# One process per leg (leaf size changes table shapes -> fresh
# executables); gate first at the widest leaf, then frame legs.
set -x
cd /root/repo
RAYTPU_LEAF_SIZE=10 timeout 2400 python bench.py --selftest
for leaf in 8 10; do
  for preset in config4 config5; do
    RAYTPU_LEAF_SIZE=$leaf \
      timeout 2400 python tools/r7_skyquad_ab.py "$preset" asbuilt
  done
done
