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
    invisible. The global ``row_number`` is a single-partition sort:
    fine for the windowed-feature matrices this feeds (already
    aggregated, small), documented as non-scalable for raw lines — use
    ``add_time_windows`` there.
    """
    w = Window.orderBy(*order_cols)
    return df.withColumn(
        out_col,
        F.floor((F.row_number().over(w) - F.lit(1)) / F.lit(window_size)).cast("long"),
    )


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
