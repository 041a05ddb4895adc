#!/bin/bash
# Round-deadline guard for the flagship retrain: if training has not
# printed its completion marker by the deadline, stop the watchdog and
# SIGTERM the trainer. The PreemptionGuard then writes a final atomic
# checkpoint and cli.train still prints "done; checkpoints", so the
# r5 chain proceeds onto evals/benches with the last checkpoint instead
# of starving them of wall-clock.
#
# Usage: deadline_cut.sh <deadline_epoch> <train_log> <pidfile>
set -u
DEADLINE=$1; LOG=$2; PIDF=$3

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  grep -q "done; checkpoints" "$LOG" 2>/dev/null && exit 0
  sleep 60
done

grep -q "done; checkpoints" "$LOG" 2>/dev/null && exit 0
echo "$(date) deadline_cut: cutting training" >> /tmp/watchdog.log
touch /tmp/stop_watchdog
sleep 2
PID=$(cat "$PIDF" 2>/dev/null) || exit 0
kill "$PID" 2>/dev/null   # SIGTERM -> preemption checkpoint + marker
