"""Synthesize an N-times-scaled copy of a testdata sf directory (default
10x sf0.1 -> ~sf1) with CONSISTENT key offsetting, for scaling-slope
measurements: each copy k shifts every primary/foreign key by
k * ceil(domain), so referential joins stay valid and id-selective
filters (vec_id = 0) keep hitting copy 0. Dimension tables (region,
nation) stay single-copy.

CONTENT columns are perturbed per copy so the scaled corpus is not
duplicate-saturated (copying text/vectors verbatim would hand every
dedup/LSH query K exact duplicates per original and inflate candidate
pair volume ~K^2 — an unrepresentative workload):

- documents.text: a copy-tag token is interleaved every 3 tokens, so
  every 3-gram shingle of copy k differs from copy 0's (Jaccard ~ 0
  between copies) while length/language statistics stay comparable;
- embeddings.embedding: the vector is rotated by k mod dim positions
  (sign-flipped past one full turn), preserving norm and distribution
  while decorrelating copies (random vectors under rotation are
  near-orthogonal).

K is capped at 2*dim (128) by the rotation scheme.

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
    if k_copies > 128:
        raise SystemExit("K > 128 defeats the rotation decorrelation scheme")
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
            exprs = []
            for c in cols:
                if c in key_cols:
                    exprs.append(f"{c} + {k * ceil[DOMAIN[c]]} AS {c}")
                elif t == "documents" and c == "text" and k > 0:
                    # interleave a copy-tag token every 3 tokens: every
                    # 3-gram shingle changes, so copies are NOT near-dups
                    exprs.append(
                        "array_to_string(flatten(list_transform("
                        "generate_series(1, len(regexp_split_to_array(trim(text), '\\s+')), 3), "
                        "i -> list_concat("
                        "regexp_split_to_array(trim(text), '\\s+')[i:least(i+2, len(regexp_split_to_array(trim(text), '\\s+')))], "
                        f"['k{k}q']))), ' ') AS text"
                    )
                elif t == "embeddings" and c == "embedding" and k > 0:
                    r = k % 64
                    sgn = -1.0 if k >= 64 else 1.0
                    if r == 0:
                        exprs.append(
                            f"list_transform(embedding, x -> CAST({sgn} * x AS FLOAT)) AS embedding"
                        )
                    else:
                        exprs.append(
                            f"list_transform(list_concat(embedding[{r + 1}:], "
                            f"embedding[1:{r}]), x -> CAST({sgn} * x AS FLOAT)) AS embedding"
                        )
                else:
                    exprs.append(c)
            parts.append(f"SELECT {', '.join(exprs)} FROM '{srcf}'")
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{dstf}' "
            "(FORMAT PARQUET, ROW_GROUP_SIZE 200000)"
        )
        n = con.execute(f"SELECT count(*) FROM '{dstf}'").fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
