"""K1-K4 — sorts, limits, top-k.

Reference: abs-descending coefficient sort (process_logs_v10.py:393-394),
``nlargest(10)`` feature importances (process_logs_v10.py:306-307),
ascending id sort (process_logs.py:75), head() previews. ``orderBy +
limit`` compiles to TakeOrderedAndProject — per-partition heaps, no
global sort — which is the 100 TB-safe top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sort_by_magnitude(df: DataFrame, col: str, ascending: bool = False) -> DataFrame:
    """K1 — order by |col| (process_logs_v10.py:393-394)."""
    key = F.abs(F.col(col))
    return df.orderBy(key.asc() if ascending else key.desc())


def top_k(df: DataFrame, col: str, k: int = 10, by_magnitude: bool = False) -> DataFrame:
    """K2 — nlargest(k) (process_logs_v10.py:306-307) →
    TakeOrderedAndProject."""
    key = F.abs(F.col(col)) if by_magnitude else F.col(col)
    return df.orderBy(key.desc()).limit(k)


def top_k_per_group(df: DataFrame, group_cols: list[str], order_col: str, k: int) -> DataFrame:
    """Grouped top-k (beyond-reference, the distributed idiom): window
    rank within group, filter ≤ k. One shuffle on the group key."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
