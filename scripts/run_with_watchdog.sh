#!/bin/bash
# Babysit a long on-chip train.py run: restart (--resume) if the log goes
# silent for too long (axon tunnel hang mode: device call never returns,
# no exception for --auto_retry to catch). Kills by exact PID only.
#
# Gives up after MAX_FAST_EXITS consecutive child exits within FAST_S
# seconds (a deterministic startup failure — bad flag, missing config —
# would otherwise relaunch forever, each relaunch paying the 30-120 s TPU
# tunnel start on the single-tenant worker).
#
# Usage: scripts/run_with_watchdog.sh <output_path> <logfile> <stall_s> \
#            -- <train.py args...>
set -u
OUT=$1; LOG=$2; STALL=$3; shift 3
[ "$1" = "--" ] && shift

MAX_FAST_EXITS=${WATCHDOG_MAX_FAST_EXITS:-4}
FAST_S=${WATCHDOG_FAST_S:-300}
FAST_EXITS=0

launch() {
  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u train.py "$@" \
      >> "$LOG" 2>&1 &
  CHILD=$!
  LAUNCH_T=$(date +%s)
  echo "[watchdog] launched pid $CHILD $(date +%H:%M:%S)" >> "$LOG.wd"
  echo "PID: $CHILD" > "$OUT.pid"
}

finished() {
  tail -8 "$LOG" | grep -q -e "phase timing" -e "finish!"
}

relaunch_or_give_up() {
  LIVED=$(( $(date +%s) - LAUNCH_T ))
  if [ "$LIVED" -lt "$FAST_S" ]; then
    FAST_EXITS=$(( FAST_EXITS + 1 ))
  else
    FAST_EXITS=0
  fi
  if [ "$FAST_EXITS" -ge "$MAX_FAST_EXITS" ]; then
    echo "[watchdog] giving up: $FAST_EXITS consecutive exits < ${FAST_S}s" \
        >> "$LOG.wd"
    echo "[watchdog] log tail:" >> "$LOG.wd"
    tail -20 "$LOG" >> "$LOG.wd"
    exit 1
  fi
  case " $* " in *" --resume "*) launch "$@" ;; *) launch "$@" --resume ;; esac
}

launch "$@"
while true; do
  sleep 60
  if ! kill -0 "$CHILD" 2>/dev/null; then
    # finished or crashed on its own: if train printed its end-of-run
    # marker, we're done; otherwise restart with --resume
    if finished; then
      echo "[watchdog] run finished $(date +%H:%M:%S)" >> "$LOG.wd"
      exit 0
    fi
    echo "[watchdog] child died; resuming $(date +%H:%M:%S)" >> "$LOG.wd"
    relaunch_or_give_up "$@"
    continue
  fi
  AGE=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
  if [ "$AGE" -gt "$STALL" ]; then
    echo "[watchdog] stalled ${AGE}s; killing $CHILD $(date +%H:%M:%S)" >> "$LOG.wd"
    kill "$CHILD" 2>/dev/null; sleep 20
    kill -0 "$CHILD" 2>/dev/null && kill -9 "$CHILD"; sleep 40
    relaunch_or_give_up "$@"
  fi
done
