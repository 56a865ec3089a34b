#!/bin/sh
# Round-4 TPU batch 1: fused epilogue A/B, then light-centric shadow A/B.
cd "$(dirname "$0")/.." || exit 1
echo "=== r6_fused_ab ==="
timeout 5400 python tools/r6_fused_ab.py; echo "rc=$?"
echo "=== r6_shadow_ab ==="
timeout 5400 python tools/r6_shadow_ab.py; echo "rc=$?"
