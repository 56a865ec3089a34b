#!/bin/sh
# Round-4 TPU batch 1: fused epilogue + shadow ordering, correctness first.
# One serial queue — a single chip, and concurrent host load contaminates
# timing legs (docs/roadmap.md measurement lessons).
cd "$(dirname "$0")/.." || exit 1
echo "=== selftest (tier bit-identity with fused epilogue) ==="
timeout 2400 python bench.py --selftest; echo "rc=$?"
echo "=== fused A/B ==="
FUSED_AB_PRESETS=config4,config5,reference,config2 timeout 5400 python tools/r6_fused_ab.py; echo "rc=$?"
echo "=== shadow order A/B ==="
SHADOW_AB_PRESETS=config4,config5,reference timeout 4800 python tools/r6_shadow_ab.py; echo "rc=$?"
