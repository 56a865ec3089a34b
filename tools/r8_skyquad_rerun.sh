#!/bin/sh
# Clean re-run of the split-vs-stacked skybox_quad A/B (one leg per
# process, idle host). The first config4 split leg (/tmp/r7_skyquad.log)
# took 1858 s and read 116.4 ms -- contention-suspect; the traced
# relayout fusion it removes is only 1.9 ms/frame.
set -x
cd /root/repo
for leg in stacked split; do
  for preset in config4 config5 reference; do
    timeout 2400 python tools/r7_skyquad_ab.py "$preset" "$leg"
  done
done
