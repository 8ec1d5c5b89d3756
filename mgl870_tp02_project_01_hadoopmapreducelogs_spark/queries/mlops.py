"""M1-M10 ML analytics as driver-checkable queries.

Model outputs are not ANSI-SQL-expressible, so these register with
``oracle=None`` (the driver's rows-only check); numeric determinism
(fixed seeds, coarse rounding) plus the pytest suite carry correctness.
The windowed dataset builder itself IS SQL-expressible and registered
with a full oracle (``ml_windowed_dataset``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ml import anomaly, pipeline
from . import load, register

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
FEATURES = [f"n_{t}" for t in EVENT_TYPES] + ["sum_value"]


def _windowed(spark: SparkSession, sf_dir: str, window_size: int = 5) -> DataFrame:
    """W1+A4+A5+A7 composed: tumbling 5-row windows over events, per-
    window event-type counts + value sum as features, 'any error in
    window' as the label (reference windowing process_logs_v10.py:262-265
    with v9's column-label semantics, process_logs_v9.py:255-256)."""
    from ..operators.windows import add_row_buckets

    ev = load(spark, sf_dir, "events")
    b = add_row_buckets(ev, ["event_id"], window_size=window_size).select(
        "window_id",
        "event_type",
        F.floor(F.col("value") * 1000).alias("v"),
    )
    aggs = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")
        for t in EVENT_TYPES
    ]
    return b.groupBy("window_id").agg(
        *aggs,
        F.sum("v").alias("sum_value"),
        F.max(F.when(F.col("event_type") == "error", 1.0).otherwise(0.0)).alias(
            "label"
        ),
    )


_WINDOWED_SQL = """
    SELECT CAST(FLOOR((ROW_NUMBER() OVER (ORDER BY event_id) - 1) / 5) AS BIGINT)
             AS window_id,
           event_type, CAST(FLOOR(value*1000) AS BIGINT) AS v
    FROM events
"""


@register(
    "ml_windowed_dataset",
    f"""
    SELECT window_id,
           CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
           CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
           CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
           CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
           CAST(SUM(v) AS BIGINT) AS sum_value,
           MAX(CASE WHEN event_type = 'error' THEN CAST(1.0 AS DOUBLE)
               ELSE CAST(0.0 AS DOUBLE) END) AS label
    FROM ({_WINDOWED_SQL})
    GROUP BY window_id
    """,
    doc="D7/D8: the windowed feature+label matrix feeding every ML "
    "operator (process_logs_v10.py:262-265) — fully oracle-checked.",
)
def ml_windowed_dataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _windowed(spark, sf_dir)


@register(
    "ml_stratified_split_counts",
    None,
    doc="M1: stratified train/test split (train_test_split(stratify=y), "
    "process_logs_v10.py:272-273) — per-split class histograms. "
    "Rows-only: distributed sampling is seeded but engine-specific.",
)
def ml_stratified_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _windowed(spark, sf_dir)
    train, test = pipeline.stratified_split(df, test_frac=0.2, seed=42)
    t1 = train.groupBy("label").agg(F.count(F.lit(1)).alias("n")).withColumn(
        "split", F.lit("train")
    )
    t2 = test.groupBy("label").agg(F.count(F.lit(1)).alias("n")).withColumn(
        "split", F.lit("test")
    )
    return t1.unionByName(t2).select("split", "label", "n")


@register(
    "ml_logistic_regression",
    None,
    doc="M2+M4+M5: LogisticRegression(maxIter=1000) on the windowed "
    "matrix; returns evaluation metrics + |coef|-ranked features "
    "(process_logs_v10.py:279-309).",
)
def ml_logistic_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _windowed(spark, sf_dir)
    assembled = pipeline.assemble(df, FEATURES)
    train, test = pipeline.stratified_split(assembled, test_frac=0.2, seed=42)
    model = pipeline.fit_logistic_regression(train)
    metrics = pipeline.evaluate_classifier(model.transform(test))
    imps = pipeline.lr_importances(model, FEATURES)
    rows = [("metric:" + k, float(round(v, 3)) if v is not None else None)
            for k, v in sorted(metrics.items())]
    rows += [("coef:" + name, float(round(c, 2))) for name, c in imps]
    return spark.createDataFrame(rows, "item string, value double")


@register(
    "ml_random_forest",
    None,
    doc="M3+M4+M6: RandomForestClassifier(numTrees=100, seed=42) + "
    "impurity importances (process_logs_v10.py:338-416).",
)
def ml_random_forest(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _windowed(spark, sf_dir)
    assembled = pipeline.assemble(df, FEATURES)
    train, test = pipeline.stratified_split(assembled, test_frac=0.2, seed=42)
    model = pipeline.fit_random_forest(train)
    metrics = pipeline.evaluate_classifier(model.transform(test))
    imps = pipeline.rf_importances(model, FEATURES)
    rows = [("metric:" + k, float(round(v, 3)) if v is not None else None)
            for k, v in sorted(metrics.items())]
    rows += [("importance:" + name, float(round(v, 2))) for name, v in imps[:5]]
    return spark.createDataFrame(rows, "item string, value double")


@register(
    "ml_correlation_pruner",
    None,
    doc="M9: correlation-pruning selector at threshold 0.9 on the "
    "windowed features (process_logs_v10.py:325-328) — emits kept "
    "columns. (The oracle-checked variant is a10_correlation_pruning.)",
)
def ml_correlation_pruner(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _windowed(spark, sf_dir)
    _, kept = pipeline.prune_correlated(df, FEATURES, threshold=0.9)
    return spark.createDataFrame([(c,) for c in sorted(kept)], "kept string")


@register(
    "ml_pca_projection",
    None,
    doc="M8: PCA(k=2) over the windowed matrix; explained variance per "
    "component (process_logs_v10.py:436-447). Rows-only: eigenvector "
    "sign/ordering is implementation-specific.",
)
def ml_pca_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _windowed(spark, sf_dir)
    assembled = pipeline.assemble(df, FEATURES)
    model = pipeline.fit_pca(assembled, k=2)
    ev = [round(float(v), 3) for v in model.explainedVariance]
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(ev)], "component int, explained_variance double"
    )


@register(
    "ml_isolation_forest",
    None,
    doc="M7: isolation-forest anomaly detection (IsolationForest("
    "contamination=0.1), process_logs_v10.py:419-433) — pure-numpy "
    "trees fit on a driver sample, scored via Arrow-batched pandas_udf; "
    "returns anomaly count and score stats (seeded, deterministic).",
)
def ml_isolation_forest(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _windowed(spark, sf_dir)
    scored = anomaly.score_isolation_forest(
        df, FEATURES, contamination=0.1, n_trees=50, seed=42
    )
    return scored.agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum("is_anomaly").alias("n_anomalies"),
        F.round(F.avg("anomaly_score"), 2).alias("mean_score"),
    )


@register(
    "ml_pca_anomaly_scores",
    None,
    doc="M7 scale path: PCA-reconstruction-error anomaly scoring — no "
    "Python in the scoring path (SURVEY §4.2).",
)
def ml_pca_anomaly_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _windowed(spark, sf_dir)
    scored = anomaly.pca_reconstruction_error(df, FEATURES, k=2, contamination=0.1)
    return scored.groupBy("is_anomaly").agg(F.count(F.lit(1)).alias("n"))
