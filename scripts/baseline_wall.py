#!/usr/bin/env python3
"""Per-query DuckDB wall-time baseline — the measurable denominator for
the driver's "within 2x of baseline" bench gate.

BASELINE.md documents that the reference publishes no timings, so the
only same-hardware, same-data, same-semantics denominator available is
the oracle itself: every registered query carries DuckDB SQL that
check.py already executes for correctness. This script times those
executions (min-of-3, materializing the full result) over the SAME
parquet tables the Spark bench reads, and writes a per-query map:

    {"sf": "...", "duckdb_threads": N,
     "queries": {"q_a1_pricing_summary": 0.012, ...}}

Usage: baseline_wall.py <sfDir> <oracle_sql.json> <out.json>

Methodology notes (mirrors graft.Bench):
  - min-of-3: same robust-to-host-noise estimator Bench uses
    (min-of-2 there; the oracle runs are cheaper so 3 is affordable).
  - one untimed warmup run per query first: DuckDB's buffer pool and
    the OS page cache then serve the parquet bytes for the timed runs,
    matching Bench's warmed steady-state regime.
  - .fetchall() materializes every row — comparable work to Bench's
    noop sink, which fully executes the Spark plan.
  - DuckDB runs with its default thread count (all host cores), same
    hardware budget as Bench's local[32].
"""
import json
import sys
import time

import duckdb

# One pathological oracle must not stall the whole baseline: queries
# slower than this per RUN are recorded at the cap (a floor value for
# the ratio -- Spark can only look better than reported).
PER_RUN_TIMEOUT_S = 120.0

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, oracle_json: str, out_path: str) -> int:
    import os
    with open(oracle_json) as f:
        oracles = json.load(f)
    if not oracles:
        print("NO ORACLES — empty oracle_sql.json", file=sys.stderr)
        return 1
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    threads = con.execute("SELECT current_setting('threads')").fetchone()[0]
    walls = {}
    errs = {}
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            t0 = time.perf_counter()
            con.execute(sql).fetchall()  # warmup: page cache + plan
            warm = time.perf_counter() - t0
            if warm > PER_RUN_TIMEOUT_S:
                walls[name] = round(warm, 4)
                print(f"{name}: {warm:.4f}s (single run -- over cap)")
                continue
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            walls[name] = round(best, 4)
            print(f"{name}: {best:.4f}s")
        except Exception as e:
            errs[name] = str(e).split("\n")[0]
            print(f"ERR {name}: {errs[name]}", file=sys.stderr)
    out = {"sf": sf_dir, "duckdb_threads": int(threads),
           "nqueries": len(walls), "errors": errs, "queries": walls}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"\nwrote {out_path}: {len(walls)} queries, "
          f"total {sum(walls.values()):.1f}s, threads={threads}")
    return 1 if errs else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    oj = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
    out = sys.argv[3] if len(sys.argv) > 3 else "BASELINE_LOCAL.json"
    sys.exit(main(sf, oj, out))
