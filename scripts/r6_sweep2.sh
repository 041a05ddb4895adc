#!/bin/bash
# Final round-3 TPU slot: second phases×unroll sweep (untried corners +
# int8-weight composition) after the r6 post-measurements release the chip.
set -u
cd /root/repo
LOG=/tmp/r6_sweep2.log
mark() { echo "$(date -u +%H:%M:%S) $*" >> "$LOG"; }

while ! grep -q "R6 POST DONE" /tmp/r6_post.log 2>/dev/null; do sleep 60; done

mark "sweep2 start"
timeout 1800 python -u scripts/bench_phase_sweep2.py >> "$LOG" 2>&1
mark "R6 SWEEP2 DONE"
