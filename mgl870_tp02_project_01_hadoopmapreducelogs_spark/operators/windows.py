"""W1/W2 + time windows — windowed feature construction.

Reference: tumbling row-buckets ``Window_ID = arange(len(X)) // 5`` then
``groupby(Window_ID).sum()`` for features and ``.max()`` for the label
(process_logs_v10.py:262-265). Row-position windows only exist because
the reference destroyed its timestamps; this engine provides BOTH the
faithful row-bucket form and the time-based ``window(ts, ...)`` form the
data actually supports (the scale-correct one: no global ordering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rn",
    num_buckets: int | None = None,
) -> DataFrame:
    """Scale-safe global ``row_number() OVER (ORDER BY key)`` for a
    numeric order key.

    ``Window.orderBy`` with no partitionBy funnels the whole table into
    one partition ("Moving all data to a single partition") — the #1
    scale killer flagged in round 1. This is the zipWithIndex idiom in
    DataFrame form, made deterministic by deriving the bucket from the
    key VALUE rather than from ``repartitionByRange`` placement (whose
    sampled boundaries differ between jobs, so spark_partition_id is
    not stable across the two passes):

    1. one tiny agg for (min, max) of the key → a monotonic bucket
       function ``_b = clamp(floor((key - min) / width))``;
    2. per-bucket counts → cumulative offsets, computed on the driver
       (≤ num_buckets rows) and shipped back as a flat literal-map
       lookup — no single-partition WindowExec anywhere in the plan;
    3. local ``row_number`` per bucket (shuffle on ``_b``, parallel
       sort within buckets), plus the bucket's offset.

    Equivalent to the single-partition form when the key is unique
    and non-null (the bucket function is monotonic, so cross-bucket
    order is preserved). Three column-pruned scans of one column
    instead of a full-table single-partition sort.
    """
    if len(order_cols) != 1:
        raise ValueError("global_row_number needs exactly one numeric order column")
    key = order_cols[0]
    n = num_buckets or df.sparkSession.sparkContext.defaultParallelism
    lo, hi = df.agg(F.min(key), F.max(key)).first()
    if lo is None:  # empty input
        return df.withColumn(out_col, F.lit(None).cast("long"))
    width = max(1, (int(hi) - int(lo) + n) // n)
    bucket = F.least(
        F.lit(n - 1), F.floor((F.col(key) - F.lit(int(lo))) / F.lit(width))
    ).cast("int")
    with_b = df.withColumn("_b", bucket)
    counts = {
        r["_b"]: r["_n"]
        for r in with_b.groupBy("_b").agg(F.count(F.lit(1)).alias("_n")).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    # flat map literal, not a chained when().otherwise(): a chain is an
    # O(num_buckets)-deep nested expression that risks codegen limits at
    # cluster-width bucket counts; create_map is one flat expression and
    # the lookup is a hash probe (pinned at ~2000 buckets in
    # test_windows.py::test_global_row_number_many_buckets).
    # try_element_at, not element_at: under ANSI mode (Spark 4 default)
    # element_at throws on a missing key, which would make the
    # coalesce-to-0 fallback unreachable.
    off_map = F.create_map(
        *[F.lit(x) for b, off in offsets.items() for x in (b, off)]
    )
    off_expr = F.coalesce(F.try_element_at(off_map, F.col("_b")), F.lit(0))
    w_local = Window.partitionBy("_b").orderBy(key)
    return (
        with_b.withColumn(
            out_col, (F.row_number().over(w_local) + off_expr).cast("long")
        )
        .drop("_b")
    )


def add_row_buckets(
    df: DataFrame,
    order_cols: list[str],
    window_size: int = 5,
    out_col: str = "window_id",
) -> DataFrame:
    """W1 — tumbling count windows: floor(row_position / size)
    (process_logs_v10.py:262-263).

    Needs a total order (``order_cols``) to be well-defined in a
    distributed setting — the reference's implicit RangeIndex made that
    invisible. Row position comes from ``global_row_number`` (range-
    partitioned, no single-partition sort); for time-keyed data prefer
    ``add_time_windows``.
    """
    numbered = global_row_number(df, order_cols, out_col="_rn")
    return numbered.withColumn(
        out_col,
        F.floor((F.col("_rn") - F.lit(1)) / F.lit(window_size)).cast("long"),
    ).drop("_rn")


def aggregate_windows(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str | None = None,
    window_col: str = "window_id",
) -> DataFrame:
    """A4+A5 — per-window SUM of features and MAX of the label ("window
    is anomalous if any line is", process_logs_v10.py:264-265)."""
    aggs = [F.sum(c).alias(c) for c in feature_cols]
    if label_col is not None:
        aggs.append(F.max(label_col).alias(label_col))
    return df.groupBy(window_col).agg(*aggs)


def add_time_windows(
    df: DataFrame, ts_col: str = "ts", duration: str = "5 minutes"
) -> DataFrame:
    """Time-based tumbling windows over the parsed timestamp — the
    scalable replacement for W1 (shuffle by window start, no global
    sort), and the form Structured Streaming shares.
    """
    return df.withColumn("window", F.window(F.col(ts_col), duration)).withColumn(
        "window_start", F.col("window.start")
    )
