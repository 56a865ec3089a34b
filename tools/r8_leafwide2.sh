#!/bin/sh
# Leaf densification continued: 8/10 kept winning (config4 110.87 ->
# 107.66 -> 104.1; config5 17.43 -> 17.06 -> 16.92), so probe 12 and the
# 4-bit-field cap 15. Gate first at 15.
set -x
cd /root/repo
RAYTPU_LEAF_SIZE=15 timeout 2400 python bench.py --selftest
for leaf in 12 15; do
  for preset in config4 config5; do
    RAYTPU_LEAF_SIZE=$leaf \
      timeout 2400 python tools/r7_skyquad_ab.py "$preset" asbuilt
  done
done
