#!/bin/bash
# Babysit a long on-chip train.py run: restart (--resume) if the log goes
# silent for too long (axon tunnel hang mode: device call never returns,
# no exception for --auto_retry to catch). Kills by exact PID only.
#
# Usage: scripts/run_with_watchdog.sh <output_path> <logfile> <stall_s> \
#            -- <train.py args...>
set -u
OUT=$1; LOG=$2; STALL=$3; shift 3
[ "$1" = "--" ] && shift

launch() {
  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u train.py "$@" \
      >> "$LOG" 2>&1 &
  CHILD=$!
  echo "[watchdog] launched pid $CHILD $(date +%H:%M:%S)" >> "$LOG.wd"
  echo "PID: $CHILD" > "$OUT.pid"
}

launch "$@"
while true; do
  sleep 60
  if ! kill -0 "$CHILD" 2>/dev/null; then
    # finished or crashed on its own: if train printed its end-of-run
    # timing, we're done; otherwise restart with --resume
    if tail -5 "$LOG" | grep -q "phase timing"; then
      echo "[watchdog] run finished $(date +%H:%M:%S)" >> "$LOG.wd"
      exit 0
    fi
    echo "[watchdog] child died; resuming $(date +%H:%M:%S)" >> "$LOG.wd"
    case " $* " in *" --resume "*) launch "$@" ;; *) launch "$@" --resume ;; esac
    continue
  fi
  AGE=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
  if [ "$AGE" -gt "$STALL" ]; then
    echo "[watchdog] stalled ${AGE}s; killing $CHILD $(date +%H:%M:%S)" >> "$LOG.wd"
    kill "$CHILD" 2>/dev/null; sleep 20
    kill -0 "$CHILD" 2>/dev/null && kill -9 "$CHILD"; sleep 40
    case " $* " in *" --resume "*) launch "$@" ;; *) launch "$@" --resume ;; esac
  fi
done
