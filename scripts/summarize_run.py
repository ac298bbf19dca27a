"""Render a results markdown table from a run's metrics.jsonl.

Usage: python scripts/summarize_run.py output/synthhard_full [--csv]
Prints the per-view pose/reproj table (the format of
results/synthprep_full_r2.md) plus summary stats and wall-clock gaps
between consecutive registrations.
"""
import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--csv", action="store_true")
    args = ap.parse_args()
    path = os.path.join(args.run_dir, "metrics.jsonl")
    rows = []
    with open(path) as f:
        for line in f:
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "view" in r:
                rows.append(r)
    if not rows:
        print("no view rows in", path)
        sys.exit(1)
    depth_rows = [json.loads(l) for l in open(path)
                  if "depth_abs_rel" in l]
    if args.csv:
        print("step,view,n_cams,n_points,reproj_px,rot_err_deg,t_err,ate,dt_min")
    else:
        print("| view | cams | points | reproj px | rot err (deg) | t err | ATE | min/view |")
        print("|---|---|---|---|---|---|---|---|")
    prev_t = None
    for r in rows:
        dt = (r["t"] - prev_t) / 60.0 if prev_t is not None else float("nan")
        prev_t = r["t"]
        vals = (r["view"], r["n_cams"], r["n_points"], r["reproj_px"],
                r["rot_err_deg"], r["t_err"], r["ate"])
        if args.csv:
            print(f"{r['step']},{vals[0]},{vals[1]},{vals[2]},"
                  f"{vals[3]:.4f},{vals[4]:.3f},{vals[5]:.4f},{vals[6]:.4f},"
                  f"{dt:.1f}")
        else:
            print(f"| {vals[0]} | {vals[1]} | {vals[2]} | {vals[3]:.3f} "
                  f"| {vals[4]:.2f} | {vals[5]:.4f} | {vals[6]:.4f} "
                  f"| {dt:.1f} |")
    n = len(rows)
    import math
    import statistics as st

    def finite(xs):
        return [x for x in xs if isinstance(x, (int, float))
                and math.isfinite(x)]

    rot, rep, ate = ([r[k] for r in rows]
                     for k in ("rot_err_deg", "reproj_px", "ate"))
    rot_f, rep_f, ate_f = finite(rot), finite(rep), finite(ate)
    n_nan = sum(1 for xs in (rot, rep, ate) for x in xs
                if not (isinstance(x, (int, float)) and math.isfinite(x)))
    if n_nan:
        bad_steps = sorted({r.get("step") for r in rows
                            if any(not (isinstance(r[k], (int, float))
                                        and math.isfinite(r[k]))
                                   for k in ("rot_err_deg", "reproj_px",
                                             "ate"))})
        print(f"\nWARNING: {n_nan} non-finite metric value(s) at step(s) "
              f"{bad_steps} — excluded from the summary below")
    ate_last = ate_f[-1] if ate_f else float("nan")
    print(f"\nviews registered: {n};  rot err mean "
          f"{st.mean(rot_f):.3f} deg (max {max(rot_f):.3f})  "
          f"[{len(rot_f)}/{n} finite];  reproj mean {st.mean(rep_f):.4f} px "
          f"(max {max(rep_f):.4f});  final ATE {ate_last:.4f} "
          f"(max {max(ate_f):.4f})" if rot_f and rep_f and ate_f else
          f"\nviews registered: {n}; no finite metric rows")
    skipped = [json.loads(l) for l in open(path) if "skipped_views" in l]
    for s in skipped:
        print(f"skipped views (failed registration after retries): "
              f"{s['skipped_views']}")
    span_min = (rows[-1]["t"] - rows[0]["t"]) / 60.0
    if n > 1:
        print(f"wall-clock: {span_min:.1f} min over {n-1} registrations "
              f"({span_min/(n-1):.1f} min/view)")
    for d in depth_rows:
        print(f"depth eval: abs_rel={d['depth_abs_rel']:.4f} "
              f"rmse={d['depth_rmse']:.4f} n_px={d['depth_px']}")


if __name__ == "__main__":
    main()
