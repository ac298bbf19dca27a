"""Parse a timestamped flagship log (output/*.tlog) into per-view phase
durations. Usage: python scripts/parse_tlog.py output/synthhard_full.tlog"""
import re
import sys
from datetime import datetime, timedelta


def main():
    path = sys.argv[1]
    events = []
    for line in open(path, errors="replace"):
        m = re.match(r"^(\d\d:\d\d:\d\d) (.*)", line)
        if not m:
            continue
        t = datetime.strptime(m.group(1), "%H:%M:%S")
        if events and t < events[-1][0]:
            t = t + timedelta(days=1)  # wrapped past midnight
        txt = m.group(2)
        tag = None
        if "best view next id" in txt:
            tag = "VIEW " + txt.split("is")[-1].strip(" -")
        elif txt.startswith("PnP:"):
            tag = "pnp_done"
        elif "'phase': 'geoinit'" in txt:
            tag = "geoinit_phase"
        elif "triangulation ratio" in txt:
            tag = "geoinit_final"
        elif "'phase': 'local_ba'" in txt and "PSNR" in txt:
            tag = "sfm_refine"
        elif "'phase': 'local_ba'" in txt:
            tag = "local_ba"
        elif "'phase': 'global_ba'" in txt:
            tag = "global_ba"
        elif "'phase': 'refine'" in txt:
            tag = "refine"
        elif "'phase': 'init'" in txt:
            tag = "init"
        if tag:
            events.append((t, tag))
    prev = None
    for t, tag in events:
        if tag.startswith("VIEW"):
            print(f"\n== {tag} (at {t.time()})")
            prev = t
            continue
        if prev is not None:
            dt = (t - prev).total_seconds()
            # collapse consecutive geoinit_final lines
            print(f"  {tag:14s} +{dt:7.1f}s")
            prev = t


if __name__ == "__main__":
    main()
