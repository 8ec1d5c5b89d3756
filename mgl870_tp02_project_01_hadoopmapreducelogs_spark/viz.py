"""V1-V4 — visualization/presentation edge (SURVEY §2.11).

The reference blocks inside matplotlib (`plt.show()`,
process_logs_v10.py:186-217,306-309,443-447). In a distributed engine
plotting is strictly an EDGE concern: each helper below reduces the
distributed result to the small plot-ready pandas frame (bounded rows —
collect is safe by construction), and the actual drawing is gated
behind a matplotlib import so headless/production environments pay
nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def failure_distribution_data(event_counts: DataFrame, max_events: int = 500):
    """V1 — bar-chart data: per-event totals for events with ≥1
    occurrence, id-ordered (plot_failure_distribution,
    process_logs_v10.py:186-217). Bounded by the catalog size."""
    return (
        event_counts.filter(F.col("total") > 0)
        .orderBy("cluster_id")
        .limit(max_events)
        .toPandas()
    )


def topk_coefficients_data(importances: list[tuple[str, float]], k: int = 10):
    """V2 — top-k horizontal-bar data from an importance ranking
    (process_logs_v10.py:306-309). Driver-side input: rankings are
    k-sized already."""
    import pandas as pd

    return pd.DataFrame(importances[:k], columns=["feature", "importance"])


def pca_scatter_data(projected: DataFrame, sample: int = 5000, seed: int = 42):
    """V3 — PCA scatter data: sampled 2-D projection + label
    (process_logs_v10.py:443-447). Sampling keeps the collect bounded
    at any corpus size."""
    from pyspark.ml.functions import vector_to_array

    arr = vector_to_array("pca_features")
    frac_df = projected.select(
        arr.getItem(0).alias("pc1"), arr.getItem(1).alias("pc2"), "label"
    )
    n = frac_df.count()
    if n > sample:
        frac_df = frac_df.sample(fraction=sample / n, seed=seed)
    return frac_df.toPandas()


def plot_failure_distribution(pdf, ax=None):
    """V1 rendering — requires matplotlib (not present in headless
    environments; the data helper above is the engine surface)."""
    try:
        import matplotlib.pyplot as plt
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "matplotlib is not available in this environment; "
            "use failure_distribution_data() and plot elsewhere"
        ) from e
    ax = ax or plt.gca()
    ax.bar(pdf["cluster_id"].astype(str), pdf["total"])
    # x-tick thinning to multiples of 5, 45° rotation — the reference's
    # presentation quirk (process_logs_v10.py:198-213), indexed correctly
    ticks = [i for i in range(len(pdf)) if i % 5 == 0]
    ax.set_xticks(ticks)
    ax.tick_params(axis="x", rotation=45)
    ax.set_xlabel("Event ID")
    ax.set_ylabel("Occurrences")
    return ax
