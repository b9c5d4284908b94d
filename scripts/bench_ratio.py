#!/usr/bin/env python3
"""Join the Spark bench map (BENCH_LOCAL.json) with the DuckDB oracle
wall baseline (BASELINE_LOCAL.json) and report spark_wall/duckdb_wall
per query — the measurable form of the driver's 2x bench gate.

Usage: bench_ratio.py [BENCH_LOCAL.json] [BASELINE_LOCAL.json] [out.json]

Writes out.json {"queries": {name: {spark, duckdb, ratio}}, summary...}
and prints a markdown table of the worst ratios for README/BASELINE.md.

Interpretation guard: ratios on sub-100ms queries are dominated by
Spark's fixed per-query floor (job scheduling, codegen cache lookup,
noop-sink commit — ~0.1-0.3s at local[32]) that amortizes to nothing
on a long-lived cluster; the summary therefore also reports the
aggregate ratio (sum of walls), which is floor-robust, and splits out
queries where BOTH engines are above 0.5s — the regime where the
ratio measures plan quality rather than constant overhead.
"""
import json
import sys


def main(bench_path: str, base_path: str, out_path: str) -> int:
    with open(bench_path) as f:
        bench = json.load(f)["queries"]
    with open(base_path) as f:
        base = json.load(f)
    duck = base["queries"]
    # measured per-query driver floor: the registered x_noop_floor
    # control (a one-row constant through the same noop-sink path).
    # Subtracting it gives the floor-adjusted ratio — what the query's
    # PLAN costs beyond the fixed local[32] scheduling/commit overhead.
    floor = bench.get("x_noop_floor", 0.0)
    rows = {}
    for name, sw in sorted(bench.items()):
        if name == "x_noop_floor":
            continue  # measurement control: calibrates, isn't graded
        dw = duck.get(name)
        if dw is None:
            continue
        adj = max(sw - floor, 0.0)
        rows[name] = {"spark": sw, "duckdb": dw,
                      "ratio": round(sw / dw, 2) if dw > 0 else None,
                      "ratio_floor_adj":
                          round(adj / dw, 2) if dw > 0 else None}
    common = [r for r in rows.values() if r["ratio"] is not None]
    tot_s = sum(r["spark"] for r in common)
    tot_d = sum(r["duckdb"] for r in common)
    big = [(n, r) for n, r in rows.items()
           if r["spark"] >= 0.5 and r["duckdb"] >= 0.5]
    out = {
        "n_common": len(common),
        "spark_floor_sec": round(floor, 3),
        "spark_total_sec": round(tot_s, 1),
        "duckdb_total_sec": round(tot_d, 1),
        "aggregate_ratio": round(tot_s / tot_d, 2) if tot_d else None,
        "n_spark_only": len(bench) - len(rows),
        "n_over_2x_both_heavy": sum(1 for _, r in big if r["ratio"] > 2),
        "queries": rows,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"common queries: {len(common)}  spark {tot_s:.1f}s  "
          f"duckdb {tot_d:.1f}s  aggregate ratio "
          f"{out['aggregate_ratio']}x  "
          f"(per-query floor {floor:.3f}s)")
    print(f"both-heavy (>0.5s each side): {len(big)}, "
          f"of which >2x: {out['n_over_2x_both_heavy']}\n")
    print("| query | spark s | duckdb s | ratio | floor-adj |")
    print("|---|---|---|---|---|")
    worst = sorted(rows.items(), key=lambda kv: -(kv[1]["ratio"] or 0))
    for n, r in worst[:20]:
        print(f"| {n} | {r['spark']:.2f} | {r['duckdb']:.2f} "
              f"| {r['ratio']}x | {r['ratio_floor_adj']}x |")
    return 0


if __name__ == "__main__":
    b = sys.argv[1] if len(sys.argv) > 1 else "BENCH_LOCAL.json"
    d = sys.argv[2] if len(sys.argv) > 2 else "BASELINE_LOCAL.json"
    o = sys.argv[3] if len(sys.argv) > 3 else "BENCH_RATIO.json"
    sys.exit(main(b, d, o))
