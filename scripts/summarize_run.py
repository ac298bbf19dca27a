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
    import statistics as st
    rot = [r["rot_err_deg"] for r in rows]
    rep = [r["reproj_px"] for r in rows]
    ate = [r["ate"] for r in rows]
    print(f"\nviews registered: {n};  rot err mean {st.mean(rot):.3f} deg "
          f"(max {max(rot):.3f});  reproj mean {st.mean(rep):.4f} px "
          f"(max {max(rep):.4f});  final ATE {ate[-1]:.4f} (max {max(ate):.4f})")
    span_min = (rows[-1]["t"] - rows[0]["t"]) / 60.0
    if n > 1:
        print(f"wall-clock: {span_min:.1f} min over {n-1} registrations "
              f"({span_min/(n-1):.1f} min/view)")
    for d in depth_rows:
        print(f"depth eval: abs_rel={d['depth_abs_rel']:.4f} "
              f"rmse={d['depth_rmse']:.4f} n_px={d['depth_px']}")


if __name__ == "__main__":
    main()
