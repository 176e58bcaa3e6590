"""Summarize a jax.profiler chrome trace (trace.json.gz): top device ops by
total duration, grouped by fusion/op name family.

Usage: python tools/trace_summary.py /tmp/prof_protein [top_n]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys


def load_latest(outdir: str):
    paths = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace under {outdir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        return json.load(f), path


def family(name: str) -> str:
    # strip trailing .N / digits to group repeated instances
    return re.sub(r"[.\d]+$", "", name)


def main():
    outdir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    trace, path = load_latest(outdir)
    events = trace["traceEvents"]
    # device lanes: pid whose process_name metadata mentions TPU/device
    pid_name = {}
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_name.items()
                   if "TPU" in n or "/device" in n.lower()}
    if not device_pids:
        print("process names:", sorted(set(pid_name.values())))
        device_pids = set(pid_name)
    dur_by_fam = collections.Counter()
    n_by_fam = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        lane = tid_name.get((e["pid"], e["tid"]), "")
        if "step" in lane.lower():  # steps lane double-counts
            continue
        d = e.get("dur", 0)
        fam = family(e["name"])
        dur_by_fam[fam] += d
        n_by_fam[fam] += 1
        total += d
    print(f"trace: {path}")
    print(f"total device op time: {total/1e3:.2f} ms "
          f"(all captured steps, lanes={len(device_pids)} pids)")
    for fam, d in dur_by_fam.most_common(top_n):
        print(f"{d/total*100:6.2f}%  {d/1e3:9.3f} ms  n={n_by_fam[fam]:<5d} {fam}")


if __name__ == "__main__":
    main()
