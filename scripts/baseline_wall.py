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
     "queries": {"q_a1_pricing_summary": 0.012, ...},
     "capped": ["x_slow_one", ...]}

Usage: baseline_wall.py <sfDir> <oracle_sql.json> <out.json>

Methodology notes (mirrors graft.Bench):
  - min-of-3 timed runs after one warmup: the warmup pays DuckDB's
    buffer-pool/page-cache fill so timed runs measure steady state,
    matching Bench's warmed regime; min is the host-noise-robust
    estimator Bench uses.
  - .fetchall() materializes every row — comparable work to Bench's
    noop sink, which fully executes the Spark plan.
  - DuckDB runs with its default thread count (all host cores), same
    hardware budget as Bench's local[32].
  - EVERY run (warmup included) is hard-capped via con.interrupt()
    from a watchdog thread: a recursive-closure oracle that DuckDB
    grinds on for an hour must not stall the whole baseline (the
    first cut hung >70 CPU-minutes in one warmup). A capped query is
    recorded AT the cap and listed in "capped" — a FLOOR for the
    denominator, so Spark's ratio can only look worse than reality,
    never better.
  - the output map is rewritten after every query, and a rerun skips
    queries already present — kill-safe and resumable.
"""
import hashlib
import json
import os
import sys
import threading
import time

import duckdb

PER_RUN_CAP_S = 60.0

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def capped_run(con, sql):
    """Run sql with a hard wall cap; returns (seconds, was_capped)."""
    timer = threading.Timer(PER_RUN_CAP_S, con.interrupt)
    timer.start()
    t0 = time.perf_counter()
    try:
        con.execute(sql).fetchall()
        return time.perf_counter() - t0, False
    except Exception as e:
        msg = str(e).upper()
        if "INTERRUPT" in msg:
            return PER_RUN_CAP_S, True
        raise
    finally:
        timer.cancel()


def main(sf_dir: str, oracle_json: str, out_path: str) -> int:
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
    def sha(sql):
        return hashlib.sha256(sql.encode()).hexdigest()[:16]

    walls, capped, errs, shas = {}, [], {}, {}
    if os.path.exists(out_path):  # resume: keep finished queries
        try:
            prev = json.load(open(out_path))
            # a wall measured under a DIFFERENT cap is not comparable
            # (capped floors would mix cap values) — invalidate wholesale
            if (prev.get("sf") == sf_dir
                    and prev.get("per_run_cap_s") == PER_RUN_CAP_S):
                walls = prev.get("queries", {})
                capped = prev.get("capped", [])
                shas = prev.get("sql_sha", {})
                # re-time queries whose oracle SQL changed since the
                # prior run (or predate sha tracking) — the incremental
                # refresh close_round.sh relies on
                stale = [n for n in walls
                         if shas.get(n) != sha(oracles.get(n, ""))]
                for n in stale:
                    walls.pop(n, None)
                    shas.pop(n, None)
                capped = [n for n in capped if n in walls]
                if stale:
                    print(f"resume: re-timing {len(stale)} stale "
                          f"queries", flush=True)
        except Exception:
            pass

    def dump():
        out = {"sf": sf_dir, "duckdb_threads": int(threads),
               "per_run_cap_s": PER_RUN_CAP_S, "nqueries": len(walls),
               "capped": sorted(set(capped)), "errors": errs,
               "sql_sha": shas, "queries": walls}
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)

    todo = [n for n in sorted(oracles) if n not in walls]
    for i, name in enumerate(todo):
        sql = oracles[name]
        try:
            warm, was_capped = capped_run(con, sql)
            if was_capped:
                walls[name] = PER_RUN_CAP_S
                shas[name] = sha(sql)
                capped.append(name)
                print(f"[{i+1}/{len(todo)}] {name}: CAPPED at "
                      f"{PER_RUN_CAP_S}s", flush=True)
                dump()
                continue
            # adaptive repeat count: noise matters most on sub-second
            # queries (min-of-3); a 15s query re-run 3x would quadruple
            # the suite wall for a denominator already far above noise
            n_runs = 3 if warm < 2.0 else (2 if warm < 10.0 else 1)
            best = None
            for _ in range(n_runs):
                dt, c2 = capped_run(con, sql)
                best = dt if best is None else min(best, dt)
                if c2:
                    # a timed run hit the cap after a sub-cap warmup:
                    # the recorded wall is a FLOOR — list it as capped
                    # so the JSON's caveat holds for every floor value
                    capped.append(name)
                    break
            walls[name] = round(best, 4)
            shas[name] = sha(sql)
            print(f"[{i+1}/{len(todo)}] {name}: {best:.4f}s", flush=True)
        except Exception as e:
            errs[name] = str(e).split("\n")[0]
            print(f"ERR {name}: {errs[name]}", file=sys.stderr, flush=True)
        dump()
    dump()
    print(f"\nwrote {out_path}: {len(walls)} queries, "
          f"total {sum(walls.values()):.1f}s, threads={threads}, "
          f"capped={len(set(capped))}")
    return 1 if errs else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    oj = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
    out = sys.argv[3] if len(sys.argv) > 3 else "BASELINE_LOCAL.json"
    sys.exit(main(sf, oj, out))
