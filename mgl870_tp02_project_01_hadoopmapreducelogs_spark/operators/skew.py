"""Skew-handling operators (SURVEY §4.2 / SCALE_NOTES).

Template-size distributions are heavy-tailed (BASELINE.md: one cluster
of 3198 against a tail of 1s; at 100 TB the hot template can be 10⁹
lines). Plain hash aggregation already absorbs count-like skew through
map-side partials, and AQE splits skewed join partitions at runtime —
but two shapes still need explicit salting:

1. aggregations whose per-key state is NOT partial-aggregatable
   (collect_list/percentile-style) — ``salted_agg`` spreads one hot
   key over ``n_salts`` reducers, then merges the per-salt results;
2. non-broadcastable joins against a skewed key column where AQE's
   split threshold is too coarse — ``salted_join`` replicates the
   small side per salt.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, col: str = "__salt") -> DataFrame:
    """Uniform random salt in [0, n_salts) — nondeterministic by design
    (load balancing, not identity)."""
    return df.withColumn(col, (F.rand(seed=42) * n_salts).cast("int"))


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: list[tuple[str, str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` is a list of (col, fn, alias) with fn ∈ {sum, count, max,
    min} — functions with an associative merge, aggregated first per
    (key, salt) and then re-aggregated per key. One hot key becomes
    ``n_salts`` first-stage groups instead of one straggler reducer.
    """
    merge_fn = {"sum": "sum", "count": "sum", "max": "max", "min": "min"}
    stage1 = [getattr(F, fn)(c).alias(alias) for c, fn, alias in aggs]
    stage2 = [
        getattr(F, merge_fn[fn])(alias).alias(alias) for _, fn, alias in aggs
    ]
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*key_cols, "__salt").agg(*stage1)
    return partial.groupBy(*key_cols).agg(*stage2)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side
    across all salts (explode over a salt sequence), join on
    (key, salt). Use when the small side is too big to broadcast and
    the big side's key distribution is heavy-tailed."""
    big_s = with_salt(big, n_salts)
    small_r = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = big_s.join(small_r, [on, "__salt"], how)
    return out.drop("__salt")


def cap_hot_keys(
    df: DataFrame, key_col: str, max_per_key: int, order_col: str | None = None
) -> DataFrame:
    """Document-frequency cap (the stop-shingle filter from
    SCALE_NOTES): keep at most ``max_per_key`` rows per key, dropping
    the rest deterministically. Bounds the blow-up of inverted-index
    candidate joins (dedup) when a key is pathologically hot."""
    from pyspark.sql import Window

    order = order_col or key_col
    w = Window.partitionBy(key_col).orderBy(order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_per_key)
        .drop("__rn")
    )
