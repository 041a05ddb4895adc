#!/bin/bash
# Watchdog for long TPU training runs on this host: the axon tunnel can
# wedge (client blocks on a futex with ~0 CPU forever). Detection = no
# process CPU accumulation over 90 s AND a stale log; recovery = kill by
# exact PID (never by pattern) and relaunch with --resume.
#
# Usage: train_watchdog.sh <run_dir> <log> <pidfile> -- <train args...>
set -u
RUN="$1"; LOG="$2"; PIDF="$3"; shift 3
[ "$1" = "--" ] && shift

LAUNCH_TS=0

launch() {
  local resume=""
  [ -d "$RUN/last/params" ] && resume="--resume $RUN/last"
  nohup python -u -m yourmt3_tpu.cli.train "$@" $resume >> "$LOG" 2>&1 &
  echo $! > "$PIDF"
  LAUNCH_TS=$(date +%s)
  echo "$(date) watchdog: launched pid $(cat $PIDF) resume='$resume'" >> /tmp/watchdog.log
}

if [ -f "$PIDF" ] && kill -0 "$(cat $PIDF)" 2>/dev/null; then
  LAUNCH_TS=$(stat -c %Y "/proc/$(cat $PIDF)" 2>/dev/null || date +%s)
else
  launch "$@"
fi

while [ ! -f /tmp/stop_watchdog ]; do
  PID=$(cat "$PIDF" 2>/dev/null)
  if ! kill -0 "$PID" 2>/dev/null; then
    if grep -q "done; checkpoints" "$LOG" 2>/dev/null; then
      echo "$(date) watchdog: training complete" >> /tmp/watchdog.log
      break
    fi
    echo "$(date) watchdog: process dead; relaunching" >> /tmp/watchdog.log
    launch "$@"; sleep 60; continue
  fi
  CPU1=$(awk '{print $14+$15}' "/proc/$PID/stat" 2>/dev/null || echo "")
  sleep 90
  CPU2=$(awk '{print $14+$15}' "/proc/$PID/stat" 2>/dev/null || echo "")
  AGE=$(( $(date +%s) - $(stat -c %Y "$LOG" 2>/dev/null || echo 0) ))
  # During axon compiles the client futex-waits with ~0 host CPU — exactly
  # the wedge signature — so each launch gets a long startup grace period
  # (first compile has taken up to ~25 min on this host).
  SINCE_LAUNCH=$(( $(date +%s) - LAUNCH_TS ))
  THRESH=300
  [ "$SINCE_LAUNCH" -lt 2400 ] && THRESH=2100
  if [ -n "$CPU1" ] && [ -n "$CPU2" ] && [ $((CPU2 - CPU1)) -lt 50 ] && [ "$AGE" -gt "$THRESH" ]; then
    echo "$(date) watchdog: wedged (cpuΔ=$((CPU2-CPU1)) ticks/90s, log age ${AGE}s, since_launch ${SINCE_LAUNCH}s); restarting" >> /tmp/watchdog.log
    kill "$PID"; sleep 10; kill -9 "$PID" 2>/dev/null; sleep 30
    launch "$@"
  fi
  sleep 30
done
