#!/bin/bash
# Multi-seed bf16-vs-f32 hash-table A/B on the real chip (ADVICE r2 /
# VERDICT r3 item 8: the round-2 A/B was n=1 per arm; rotation error at
# fast budget is dominated by run-to-run trajectory variance, so a real
# bf16 penalty smaller than that variance was invisible).
#
# Protocol: same as results/ab_bf16_vs_f32.md (synthprep scan1,
# fast budget, 3 views, ba 250 iters), but N seeds per arm. Runs
# SEQUENTIALLY (one TPU process at a time). Each run is independent and
# skipped when its metrics file already exists, so the sweep is
# interruptible/resumable.
#
# Usage: scripts/ab_bf16_seeds.sh [n_seeds] [max_views]
#   AB_CPU=1  — run the sweep on the CPU backend instead (the bf16
#   quality question is about bf16 ROUNDING in the table reads, which
#   the CPU path reproduces bit-faithfully; use when the chip is
#   occupied by a long run). CPU arms get a suffixed output dir.
set -u
N=${1:-3}
VIEWS=${2:-3}
CPUFLAG=""
SUFFIX=""
if [ "${AB_CPU:-0}" = "1" ]; then CPUFLAG="--cpu"; SUFFIX="_cpu"; fi
cd "$(dirname "$0")/.."
for seed in $(seq 0 $((N - 1))); do
  for arm in bf16 f32; do
    out="output/ab_${arm}_s${seed}${SUFFIX}"
    if [ -f "$out/metrics.jsonl" ] && grep -q '"view"' "$out/metrics.jsonl"; then
      echo "[ab] $out exists; skipping"
      continue
    fi
    extra=""
    [ "$arm" = f32 ] && extra="--SDF.Hash_config.compute_dtype=float32"
    echo "[ab] running $out $(date +%H:%M:%S)"
    PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 python train.py $CPUFLAG \
        --yaml=configs/synthprep.yaml --sfm_mode=fast \
        --max_views="$VIEWS" --optim.ba.max_iter=250 --seed="$seed" \
        $extra --output_path="$out" >> "$out.log" 2>&1
    echo "[ab] $out rc=$? $(date +%H:%M:%S)"
  done
done
python - <<'EOF'
import glob, json, math, statistics as st
rows = {}
for p in sorted(glob.glob("output/ab_*_s*/metrics.jsonl")):
    arm = "bf16" if "_bf16_" in p or "/ab_bf16" in p else "f32"
    last = None
    for l in open(p):
        r = json.loads(l)
        if "view" in r:
            last = r
    if last:
        rows.setdefault(arm, []).append(
            (p.split("/")[1], last["rot_err_deg"], last["reproj_px"],
             last["ate"]))
print("| run | rot err (deg) | reproj px | ATE |")
print("|---|---|---|---|")
for arm in ("bf16", "f32"):
    for name, rot, rep, ate in rows.get(arm, []):
        print(f"| {name} | {rot:.3f} | {rep:.3f} | {ate:.4f} |")
for arm in ("bf16", "f32"):
    xs = [r[1] for r in rows.get(arm, []) if math.isfinite(r[1])]
    ys = [r[2] for r in rows.get(arm, []) if math.isfinite(r[2])]
    if xs:
        sd = st.stdev(xs) if len(xs) > 1 else float("nan")
        print(f"{arm}: rot {st.mean(xs):.3f} +- {sd:.3f} deg "
              f"(n={len(xs)}); reproj {st.mean(ys):.3f} px")
EOF
