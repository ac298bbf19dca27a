#!/bin/bash
# Round-5 second chip window: BA-step accounting after the rad-freeze.
# Run ONLY with no other TPU process (single-tenant tunnel).
set -u
cd "$(dirname "$0")/.."
OUT=results/chip_window2_r5.jsonl
: > "$OUT"
run() {
  local name=$1; shift
  echo "[chip2] $name $(date +%H:%M:%S)" >&2
  local line
  line=$(timeout 590 python bench.py "$@" 2>/dev/null | grep '^{' | tail -1)
  rc=$?
  if [ -n "$line" ]; then
    echo "$line" | python3 -c "import json,sys; d=json.loads(sys.stdin.read()); d['_mode']='$name'; print(json.dumps(d))" >> "$OUT"
  else
    echo "{\"_mode\": \"$name\", \"_error\": \"rc=$rc no output\"}" >> "$OUT"
  fi
  sleep 20
}
run default
run ba --ba
run ba_bisect --ba-bisect
echo "[chip2] done $(date +%H:%M:%S)" >&2
cat "$OUT"
