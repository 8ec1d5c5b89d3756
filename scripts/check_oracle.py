"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.01, compare row count, schema width, and an order-insensitive
value comparison (columns sorted by name, rows sorted, values
stringified). Exit non-zero on any mismatch.

Usage: python scripts/check_oracle.py [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
SF_DIR = "/root/testdata/sf0.01"


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_sig(cols: list[str], rows: list[tuple]) -> tuple:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = tuple(cols[i] for i in order)
    body = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return names, body


def main() -> int:
    import __spark_entry__ as entry_mod
    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.session import (
        get_spark,
        quiet_bounded_window_warns,
    )

    spark = get_spark(app_name="oracle-check")
    quiet_bounded_window_warns(spark)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    only = set(sys.argv[1:])
    failures, n_checked, n_rows_only = [], 0, 0

    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {type(e).__name__}: {e}"))
            print(f"FAIL  {name}: spark error {e}")
            continue
        if name not in oracles:
            n_rows_only += 1
            print(f"rows  {name}: {len(srows)} rows, {len(scols)} cols "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.sql(oracles[name])
            dcols = list(res.columns)
            drows = res.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {type(e).__name__}: {e}"))
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        n_checked += 1
        s_sig = table_sig(scols, srows)
        d_sig = table_sig(dcols, drows)
        status = []
        if len(srows) != len(drows):
            status.append(f"rowcount {len(srows)} vs {len(drows)}")
        if s_sig[0] != d_sig[0]:
            status.append(f"schema {s_sig[0]} vs {d_sig[0]}")
        elif s_sig[1] != d_sig[1]:
            bad = next(
                (i, a, b)
                for i, (a, b) in enumerate(zip(s_sig[1], d_sig[1]))
                if a != b
            ) if len(s_sig[1]) == len(d_sig[1]) else None
            status.append(f"values differ (first: {bad})")
        if status:
            failures.append((name, "; ".join(status)))
            print(f"FAIL  {name}: {'; '.join(status)}")
        else:
            print(f"ok    {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")

    print(
        f"\n{n_checked} oracle-checked, {n_rows_only} rows-only, "
        f"{len(failures)} failures"
    )
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
