#!/bin/sh
# Round-4 TPU batch 2: op traces at current defaults + ray-count sidecar.
cd "$(dirname "$0")/.." || exit 1
echo "=== raycount sidecar population ==="
timeout 3600 python tools/r6_counts.py; echo "rc=$?"
echo "=== op trace config4 ==="
TRACE_PRESET=config4 timeout 2400 python tools/r4_profile_trace.py; echo "rc=$?"
echo "=== op trace config5 ==="
TRACE_PRESET=config5 timeout 2400 python tools/r4_profile_trace.py; echo "rc=$?"
echo "=== op trace config5 floor (0 bounces) ==="
TRACE_PRESET=config5 TRACE_MB=0 timeout 2400 python tools/r4_profile_trace.py; echo "rc=$?"
