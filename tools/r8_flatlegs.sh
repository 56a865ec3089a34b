#!/bin/sh
# Flat-layout legs of the skybox_quad A/B (third variant: one (3*6HW,)
# input, channel-offset indexing — no per-frame relayout, no tuple).
set -x
cd /root/repo
for preset in config4 config5 reference; do
  timeout 2400 python tools/r7_skyquad_ab.py "$preset" flat
done
