#!/bin/sh
# Round-4 TPU batch: EMIT_STATE / BP knob sweep on the fused path.
# One process per leg (env knobs are trace-time constants).
cd "$(dirname "$0")/.." || exit 1
for leg in "" "RAYTPU_EPI_STATE=1" "RAYTPU_EPI_BP=16" "RAYTPU_EPI_STATE=1 RAYTPU_EPI_BP=16"; do
  echo "=== leg: [$leg] ==="
  env $leg timeout 3600 python tools/r6_epi_time.py; echo "rc=$?"
done
