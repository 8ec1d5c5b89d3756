"""Synthesize an N-times-scaled copy of a testdata sf directory (default
10x sf0.1 -> ~sf1) with CONSISTENT key offsetting, for scaling-slope
measurements: each copy k shifts every primary/foreign key by
k * ceil(domain), so referential joins stay valid, id-selective filters
(vec_id = 0) keep hitting copy 0, and no artificial exact duplicates
are created. Dimension tables (region, nation) stay single-copy.

Usage: python scripts/make_scaled_data.py [src_sf_dir] [dst_dir] [K]
Then:  SPARK_GRAFT_SF_DIR=<dst_dir> python bench.py
"""

from __future__ import annotations

import os
import sys

import duckdb

PLANS = {
    "region": None,
    "nation": None,
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

DOMAIN = {
    "c_custkey": "customer.c_custkey",
    "o_custkey": "customer.c_custkey",
    "user_id": "customer.c_custkey",
    "s_suppkey": "supplier.s_suppkey",
    "l_suppkey": "supplier.s_suppkey",
    "p_partkey": "part.p_partkey",
    "l_partkey": "part.p_partkey",
    "o_orderkey": "orders.o_orderkey",
    "l_orderkey": "orders.o_orderkey",
    "event_id": "events.event_id",
    "doc_id": "documents.doc_id",
    "vec_id": "embeddings.vec_id",
}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfx10"
    k_copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    ceil = {}
    for d in set(DOMAIN.values()):
        t, c = d.split(".")
        m = con.execute(f"SELECT max({c})+1 FROM '{src}/{t}.parquet'").fetchone()[0]
        ceil[d] = int(m)
    for t, key_cols in PLANS.items():
        srcf, dstf = f"{src}/{t}.parquet", f"{dst}/{t}.parquet"
        if key_cols is None:
            con.execute(f"COPY (SELECT * FROM '{srcf}') TO '{dstf}' (FORMAT PARQUET)")
            continue
        cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM '{srcf}'").fetchall()]
        parts = []
        for k in range(k_copies):
            exprs = [
                f"{c} + {k * ceil[DOMAIN[c]]} AS {c}" if c in key_cols else c
                for c in cols
            ]
            parts.append(f"SELECT {', '.join(exprs)} FROM '{srcf}'")
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{dstf}' "
            "(FORMAT PARQUET, ROW_GROUP_SIZE 200000)"
        )
        n = con.execute(f"SELECT count(*) FROM '{dstf}'").fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
