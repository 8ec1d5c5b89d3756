"""M1-M10 — the reference's sklearn surface re-expressed on spark.ml.

Reference (process_logs_v10.py:220-447 / v9:240-330, whose semantics are
canonical where v10 is buggy — SURVEY.md §2.13): stratified split, logistic
regression (max_iter=1000), random forest (100 trees, seed 42), precision/
recall/accuracy/AUC with a single-class guard, coefficient / importance
rankings, correlation pruning, PCA(2). Everything here is distributed
(spark.ml estimators over VectorUDT columns); only the k×k correlation
threshold scan runs on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble(df: DataFrame, feature_cols: list[str], out: str = "features") -> DataFrame:
    """M10 — explicit vector assembly (implicit in pandas/sklearn)."""
    from pyspark.ml.feature import VectorAssembler

    va = VectorAssembler(inputCols=feature_cols, outputCol=out, handleInvalid="keep")
    return va.transform(df)


def prune_correlated(
    df: DataFrame, feature_cols: list[str], threshold: float = 0.7
) -> tuple[DataFrame, list[str]]:
    """M9 — correlation-pruning feature selector (A9+A10 as a step;
    thresholds 0.7 LR / 0.9 RF, process_logs_v10.py:253-257,325-328).
    Returns (pruned df, kept columns)."""
    from ..operators import stats

    drop = stats.correlated_columns(df, feature_cols, threshold)
    kept = [c for c in feature_cols if c not in drop]
    return df.drop(*drop), kept


def stratified_split(
    df: DataFrame, label_col: str = "label", test_frac: float = 0.2, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """M1 — stratified train/test split (train_test_split(stratify=y),
    process_logs_v10.py:272-273). ``sampleBy`` keeps per-class fractions
    (approximate, like any distributed sampler); the test side is the
    anti-join remainder, so the split is a partition of the input.
    """
    labels = [r[0] for r in df.select(label_col).distinct().collect()]
    fractions = {lab: 1.0 - test_frac for lab in labels}
    key = [c for c in df.columns]
    train = df.stat.sampleBy(label_col, fractions, seed)
    test = df.join(train, on=key, how="left_anti")
    return train, test


def three_way_split(
    df: DataFrame,
    label_col: str = "label",
    fractions: tuple[float, float, float] = (0.6, 0.2, 0.2),
    seed: int = 42,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """M1 — the reference's 60/20/20 train/val/test split
    (process_logs_v10.py:272-273 applies train_test_split twice).
    Stratified: the first cut is sampleBy, the remainder splits again.
    """
    train_f, val_f, test_f = fractions
    train, rest = stratified_split(df, label_col, 1.0 - train_f, seed)
    val, test = stratified_split(rest, label_col, test_f / (val_f + test_f), seed + 1)
    return train, val, test


def fit_logistic_regression(train: DataFrame, max_iter: int = 1000, **kw):
    """M2 — LogisticRegression(max_iter=1000) (process_logs_v10.py:279)."""
    from pyspark.ml.classification import LogisticRegression

    lr = LogisticRegression(
        maxIter=max_iter, featuresCol="features", labelCol="label", **kw
    )
    return lr.fit(train)


def fit_random_forest(train: DataFrame, num_trees: int = 100, seed: int = 42, **kw):
    """M3 — RandomForestClassifier(n_estimators=100, random_state=42)
    (process_logs_v10.py:338-343)."""
    from pyspark.ml.classification import RandomForestClassifier

    rf = RandomForestClassifier(
        numTrees=num_trees, seed=seed, featuresCol="features", labelCol="label", **kw
    )
    return rf.fit(train)


def evaluate_classifier(predictions: DataFrame) -> dict[str, float | None]:
    """M4 — precision/recall/accuracy + AUC with the reference's
    single-class guard (process_logs_v10.py:286-303: AUC is skipped when
    the test labels are single-class)."""
    from pyspark.ml.evaluation import (
        BinaryClassificationEvaluator,
        MulticlassClassificationEvaluator,
    )

    labels = {r[0] for r in predictions.select("label").distinct().collect()}
    out: dict[str, float | None] = {}
    for metric, key in [
        ("accuracy", "accuracy"),
        ("precisionByLabel", "precision"),
        ("recallByLabel", "recall"),
    ]:
        if metric.endswith("ByLabel") and 1.0 not in labels:
            # positive class absent from the eval slice — metric undefined
            out[key] = None
            continue
        ev = MulticlassClassificationEvaluator(
            labelCol="label", predictionCol="prediction", metricName=metric
        )
        if metric.endswith("ByLabel"):
            ev.setMetricLabel(1.0)
        out[key] = ev.evaluate(predictions)
    n_classes = len(labels)
    if n_classes >= 2:
        out["auc"] = BinaryClassificationEvaluator(
            labelCol="label", rawPredictionCol="rawPrediction", metricName="areaUnderROC"
        ).evaluate(predictions)
    else:  # single-class guard (process_logs_v10.py:291-295)
        out["auc"] = None
    return out


def lr_importances(model, feature_cols: list[str]) -> list[tuple[str, float]]:
    """M5 — |coefficient|-ranked features (process_logs_v10.py:382-397)."""
    coefs = [float(c) for c in model.coefficients]
    pairs = list(zip(feature_cols, coefs))
    return sorted(pairs, key=lambda kv: (-abs(kv[1]), kv[0]))


def rf_importances(model, feature_cols: list[str]) -> list[tuple[str, float]]:
    """M6 — impurity importances sorted (process_logs_v10.py:400-416)."""
    imps = [float(v) for v in model.featureImportances.toArray()]
    pairs = list(zip(feature_cols, imps))
    return sorted(pairs, key=lambda kv: (-kv[1], kv[0]))


def fit_pca(df: DataFrame, k: int = 2, input_col: str = "features"):
    """M8 — PCA(n_components=2) (process_logs_v10.py:436-447)."""
    from pyspark.ml.feature import PCA

    return PCA(k=k, inputCol=input_col, outputCol="pca_features").fit(df)
