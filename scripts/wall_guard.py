#!/usr/bin/env python3
"""Suite-wall drift gate (round-9 verdict ask #7): fail loudly when the
like-for-like bench total drifts >10% from the last committed round's,
printing the top per-query movers — the r7->r8 inflation and the r9
x_split_cluster_aware spike each cost a manual adjudication pass; this
turns that discipline into an automatic gate at round close.

Usage: wall_guard.py CURRENT.json [REFERENCE.json]
  CURRENT    a graft.Bench full map ({"queries": {name: sec}, ...})
  REFERENCE  same shape; default = `git show HEAD:BENCH_LOCAL.json`
             (the last committed full map)

Exit 1 on drift (set WALL_GUARD_OK=1 to acknowledge a diagnosed drift
and proceed — record the adjudication in BASELINE.md first, the r9
convention). Exit 0 when inside the envelope or no reference exists.
"""
import json
import os
import subprocess
import sys

THRESHOLD = 0.10
TOP_MOVERS = 10


def load_current(path):
    with open(path) as f:
        return json.load(f)["queries"]


def load_reference(argv):
    if len(argv) > 2:
        with open(argv[2]) as f:
            return json.load(f)["queries"], argv[2]
    try:
        out = subprocess.run(
            ["git", "show", "HEAD:BENCH_LOCAL.json"],
            capture_output=True, text=True, check=True).stdout
        return json.loads(out)["queries"], "HEAD:BENCH_LOCAL.json"
    except (subprocess.CalledProcessError, json.JSONDecodeError, KeyError):
        return None, None


def main():
    cur = load_current(sys.argv[1])
    ref, ref_name = load_reference(sys.argv)
    if not ref:
        print("wall_guard: no committed reference map — skipping (first round?)")
        return 0
    common = sorted(set(cur) & set(ref))
    if len(common) < 20:
        print(f"wall_guard: only {len(common)} common queries — skipping "
              "(partial/filtered bench run is not a like-for-like total)")
        return 0
    cur_total = sum(cur[q] for q in common)
    ref_total = sum(ref[q] for q in common)
    drift = cur_total / ref_total - 1.0
    print(f"wall_guard: like-for-like {len(common)} queries: "
          f"{ref_total:.1f}s ({ref_name}) -> {cur_total:.1f}s "
          f"({drift:+.1%})")
    if abs(drift) <= THRESHOLD:
        return 0
    movers = [q for q in sorted(common, key=lambda q: abs(cur[q] - ref[q]),
                                reverse=True)
              if abs(cur[q] - ref[q]) > 0.2][:TOP_MOVERS]
    print(f"wall_guard: DRIFT >{THRESHOLD:.0%} — top movers:")
    for q in movers:
        print(f"  {q:40s} {ref[q]:7.2f}s -> {cur[q]:7.2f}s "
              f"({cur[q] - ref[q]:+.2f}s)")
    if os.environ.get("WALL_GUARD_OK") == "1":
        print("wall_guard: WALL_GUARD_OK=1 — drift acknowledged, proceeding")
        return 0
    print("wall_guard: attribute the drift (isolated re-runs, bisect, or a "
          "BASELINE.md adjudication), then re-run with WALL_GUARD_OK=1")
    return 1


if __name__ == "__main__":
    sys.exit(main())
