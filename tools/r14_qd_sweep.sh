#!/bin/sh
# Deferred-leaf queue depth sweep (one process per leg; see r14_qd_leg.py)
for qd in 4 6 8; do
  RAYTPU_QD=$qd python "$(dirname "$0")/r14_qd_leg.py"
done
