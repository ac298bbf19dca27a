#!/bin/bash
# Round-4 chip measurement window. Run ONLY after the flagship run (and
# every other TPU process) is stopped — the tunnel chip is single-tenant.
# Serializes every bench mode with its own timeout and tees one JSON line
# per mode into results/chip_window_r4.jsonl.
set -u
cd "$(dirname "$0")/.."
OUT=results/chip_window_r4.jsonl
: > "$OUT"

run() {
  local name=$1; shift
  echo "[chip] $name $(date +%H:%M:%S)" >&2
  local line
  line=$(timeout 590 python bench.py "$@" 2>/dev/null | grep '^{' | tail -1)
  rc=$?
  if [ -n "$line" ]; then
    echo "$line" | python3 -c "import json,sys; d=json.loads(sys.stdin.read()); d['_mode']='$name'; print(json.dumps(d))" >> "$OUT"
  else
    echo "{\"_mode\": \"$name\", \"_error\": \"rc=$rc no output\"}" >> "$OUT"
  fi
  # let the tunnel settle between process starts
  sleep 20
}

run default
run trace --trace
run trace_dedup --trace --reeval-compact=0.5
run trace_dedup_both --trace --reeval-compact=0.5 --march-compact=0.5
run ba_bisect --ba-bisect
run scattersplit --scattersplit
echo "[chip] done $(date +%H:%M:%S)" >&2
cat "$OUT"
