"""A2-A11 — statistics operators.

Reference: column sums + failure filter (process_logs_v10.py:168-179,
stat_calculation.py:1-9), Pearson correlation pruning
(process_logs_v10.py:253-257, 325-328), class histogram
(process_logs_v10.py:334-335), describe/info dumps
(process_logs_v10.py:229-231). All are single hash-aggregates or one
pass of ``ml.stat.Correlation`` here; the correlation matrix itself is
k×k (k = #events, small) so the threshold scan runs on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def numeric_totals(df: DataFrame, cols: list[str]) -> DataFrame:
    """A2+A3 — column-wise sums with null-on-error numeric coercion
    (``pd.to_numeric(errors='coerce')``, process_logs_v10.py:168-169):
    ``try_cast`` yields NULL for non-numeric values exactly like coerce.
    """
    return df.select(
        *[F.sum(F.col(c).try_cast("double")).alias(c) for c in cols]
    )


def class_histogram(df: DataFrame, label_col: str = "label") -> DataFrame:
    """A6 — ``np.bincount(y)`` (process_logs_v10.py:334-335)."""
    return df.groupBy(label_col).agg(F.count(F.lit(1)).alias("n")).orderBy(label_col)


def correlation_matrix(df: DataFrame, cols: list[str]):
    """A9 — Pearson correlation matrix over feature columns in ONE pass
    (``X.corr().abs()``, process_logs_v10.py:254). Returns a numpy array
    (k×k, driver-side — k is the pruned event count, small by design).
    """
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.stat import Correlation

    assembled = VectorAssembler(
        inputCols=cols, outputCol="__corr_features", handleInvalid="keep"
    ).transform(df.select(cols))
    mat = Correlation.corr(assembled, "__corr_features").head()[0]
    return mat.toArray()


def correlated_columns(
    df: DataFrame, cols: list[str], threshold: float = 0.7
) -> list[str]:
    """A10 — upper-triangle scan: columns whose |corr| with an *earlier*
    column exceeds ``threshold`` (np.triu mask + any(), thresholds 0.7
    for the LR pass and 0.9 for the RF pass,
    process_logs_v10.py:253-257,325-328).
    """
    import numpy as np

    corr = np.abs(correlation_matrix(df, cols))
    k = len(cols)
    drop = []
    for j in range(k):
        for i in range(j):
            if not np.isnan(corr[i, j]) and corr[i, j] > threshold:
                drop.append(cols[j])
                break
    return drop


def describe(df: DataFrame) -> DataFrame:
    """A11 — df.head()/df.info() analogue (process_logs_v10.py:229-231)."""
    return df.describe()
