#!/usr/bin/env python3
"""Self-test pinning scripts/check.py's compare contract.

One tiny generated fixture per failure class the driver compare has
actually bitten on; check.py must REJECT each. If a future edit loosens
a rule, the corresponding case here goes green-when-it-should-be-red
and this script exits nonzero.

Classes pinned:
  1. HUGEINT tell — oracle uncast integer SUM comes back float64 while
     Spark emits int64; the driver hashes "420.0" vs "420" (r5 bug).
  2. Array/struct Spark output — crashes the driver's row sort
     ("unhashable type"); must be flattened to a CSV string (r5 bug).
  3. NULL-vs-value divergence — a NULL on one side where the other has
     a value must fail even though both stringify non-crashing.
  4. Genuine value mismatch (control for the compare itself).
  5. Row-count mismatch.
  6. Empty oracle_sql.json must not read as success (r3 bug: stale
     classes + a filter matching nothing printed a vacuous ALL GREEN).
  7. Column-name mismatch (unaliased aggregate tell).
And one positive control: an exactly-matching query must PASS.

Run: python3 scripts/check_selftest.py   (exit 0 = contract intact)
"""
import io
import json
import os
import shutil
import sys
import tempfile
from contextlib import redirect_stdout

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check  # noqa: E402


def write_spark_like(out_dir, name, df):
    """Emulate a Verify dump: a directory holding one parquet part."""
    d = os.path.join(out_dir, name)
    os.makedirs(d, exist_ok=True)
    df.to_parquet(os.path.join(d, "part-00000.parquet"), index=False)


def run_check(sf_dir, out_dir):
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = check.main(sf_dir, out_dir)
    return rc, buf.getvalue()


def main():
    tmp = tempfile.mkdtemp(prefix="check_selftest_")
    try:
        sf = os.path.join(tmp, "sf")
        out = os.path.join(tmp, "out")
        os.makedirs(sf)
        os.makedirs(out)
        # minimal testdata stand-ins (check.py creates views for all
        # TABLES; give each one a tiny file)
        con = duckdb.connect()
        for t in check.TABLES:
            if t == "events":
                con.execute(f"""COPY (SELECT 1::BIGINT AS event_id,
                    TIMESTAMP '2024-01-01' AS ts, 1::BIGINT AS user_id,
                    'click' AS event_type, 1.0 AS value, '{{}}' AS props)
                    TO '{sf}/{t}.parquet' (FORMAT PARQUET)""")
            else:
                con.execute(f"""COPY (SELECT 1::BIGINT AS id,
                    42::BIGINT AS v UNION ALL SELECT 2, 378)
                    TO '{sf}/{t}.parquet' (FORMAT PARQUET)""")

        oracles = {
            # 1. uncast SUM -> DuckDB HUGEINT -> pandas float64
            "f1_hugeint": "SELECT sum(v) AS s FROM part",
            # 2. spark side will hold an array column
            "f2_array": "SELECT 'a,b' AS arr_csv",
            # 3. NULL-vs-value divergence
            "f3_null": "SELECT CAST(NULL AS BIGINT) AS x",
            # 4. value mismatch
            "f4_value": "SELECT 42::BIGINT AS v",
            # 5. row-count mismatch
            "f5_rows": "SELECT id FROM part",
            # 7. column-name mismatch (unaliased aggregate)
            "f7_cols": "SELECT sum(v) FROM part",
            # positive control
            "p_ok": "SELECT CAST(sum(v) AS BIGINT) AS s FROM part",
        }
        with open(os.path.join(out, "oracle_sql.json"), "w") as f:
            json.dump(oracles, f)

        write_spark_like(out, "f1_hugeint",
                         pd.DataFrame({"s": pd.array([420], "int64")}))
        write_spark_like(out, "f2_array",
                         pd.DataFrame({"arr_csv": [["a", "b"]]}))
        write_spark_like(out, "f3_null",
                         pd.DataFrame({"x": pd.array([7], "int64")}))
        write_spark_like(out, "f4_value",
                         pd.DataFrame({"v": pd.array([43], "int64")}))
        write_spark_like(out, "f5_rows",
                         pd.DataFrame({"id": pd.array([1], "int64")}))
        write_spark_like(out, "f7_cols",
                         pd.DataFrame({"s": pd.array([420.0], "float64")}))
        write_spark_like(out, "p_ok",
                         pd.DataFrame({"s": pd.array([420], "int64")}))

        rc, log = run_check(sf, out)
        failures = []

        def expect(cond, what):
            if not cond:
                failures.append(what)

        expect(rc != 0, "overall rc should be nonzero")
        expect("FAIL f1_hugeint" in log and "HUGEINT" in log,
               "f1: HUGEINT float64-vs-int rule lost")
        expect("FAIL f2_array" in log and "array/struct" in log,
               "f2: array/struct output rule lost")
        expect("FAIL f3_null" in log, "f3: NULL-vs-value rule lost")
        expect("FAIL f4_value" in log, "f4: value compare lost")
        expect("FAIL f5_rows" in log, "f5: row-count compare lost")
        expect("FAIL f7_cols" in log, "f7: column-name compare lost")
        expect("OK   p_ok" in log, "positive control did not pass")

        # 6. empty oracle map must fail
        out2 = os.path.join(tmp, "out2")
        os.makedirs(out2)
        with open(os.path.join(out2, "oracle_sql.json"), "w") as f:
            json.dump({}, f)
        rc2, log2 = run_check(sf, out2)
        expect(rc2 != 0 and "NO QUERIES CHECKED" in log2,
               "f6: empty-oracle-map guard lost")

        if failures:
            print("SELFTEST FAILURES:")
            for w in failures:
                print(f"  - {w}")
            print("\n--- check.py output ---")
            print(log)
            return 1
        print("check.py contract intact: 7 failure classes rejected, "
              "positive control green")
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
