"""Command-line pipeline — the reference's one-command lifecycle.

The reference IS a script: ``python process_logs_v10.py`` over a log
directory runs ingest → Drain mining (with persisted state) → event
matrix CSV → failure stats → chart → windowed ML (LR/RF metrics,
importances, isolation forest, PCA). This module is the same user
contract on the Spark engine:

    python -m mgl870_tp02_project_01_hadoopmapreducelogs_spark LOGS_DIR \
        --out out/ [--method exact|drainish|drain] [--state state_dir] \
        [--ml --target-event N] [--window-size 5]

Outputs land in ``--out``:
  event_matrix_exec<timestamp>.csv   reference-named summary matrix
                                     (Cluster ID,Size,Template — header
                                     and naming of the reference golden
                                     event_matrix_exec202411200106PM.csv,
                                     process_logs_v10.py:126-162)
  failure_distribution.csv           bar-chart data (V1 edge extract)
  ml_report.txt, lr_coefficients.csv, rf_importances.csv,
  anomaly_scores.csv, pca_projection.csv        (--ml only)

``--state`` reproduces the drain3_state.bin accumulate-across-runs
semantics (process_logs_v10.py:39-40,120): the persisted catalog is
read, merged with this run's mining, written back, and the REPORTED
matrix carries the accumulated sizes — exactly how the reference's
golden CSV sizes grow run over run (BASELINE.md: 1,984,400 →
6,716,120 over the same corpus).
"""

from __future__ import annotations

import argparse
import os
import sys
from datetime import datetime

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _global_line_order(parsed: DataFrame) -> DataFrame:
    """Total line order (file, line_no) → one numeric ``_line_idx``.

    Per-file row_number (shuffle as wide as the file count) plus
    driver-computed cumulative file offsets — file COUNT is small even
    when files are not; no single-partition sort.
    """
    w = Window.partitionBy("file").orderBy("line_no")
    numbered = parsed.withColumn("_rn", F.row_number().over(w))
    sizes = sorted(
        (r["file"], r["n"])
        for r in parsed.groupBy("file").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offset, offsets = 0, {}
    for fname, n in sizes:
        offsets[fname] = offset
        offset += n
    off_col = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )[F.col("file")]
    return numbered.withColumn("_line_idx", F.col("_rn") + off_col).drop("_rn")


def _csv_single_file(df: DataFrame, path: str) -> None:
    """The reference's literal one-file ``to_csv`` convention: write the
    (catalog-sized) frame through the CSV sink, then promote the single
    part file to ``path`` itself."""
    import glob
    import shutil

    from .sources import sinks

    tmp = path + ".spark-tmp"
    sinks.write_csv(df, tmp, single_file=True)
    part = glob.glob(os.path.join(tmp, "part-*.csv"))[0]
    shutil.move(part, path)
    shutil.rmtree(tmp)


def run(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="mgl870_tp02_project_01_hadoopmapreducelogs_spark",
        description="Log-analytics pipeline (reference process_logs_v10.py parity)",
    )
    ap.add_argument("logs_dir", help="directory tree of container_*.log files")
    ap.add_argument("--out", default="out", help="output directory")
    ap.add_argument(
        "--method", default="exact", choices=["exact", "drainish", "drain"],
        help="template mining method (exact=canonical, drain=faithful Drain)",
    )
    ap.add_argument("--state", default=None, help="catalog persistence dir "
                    "(drain3_state.bin accumulate-across-runs semantics)")
    ap.add_argument("--ml", action="store_true", help="run the windowed "
                    "LR/RF/IF/PCA analytics (process_logs_v10.py:220-447)")
    ap.add_argument("--target-event", type=int, default=None,
                    help="cluster_id of the failure event to predict "
                    "(default: rarest event, mirroring target_event=1020)")
    ap.add_argument("--window-size", type=int, default=5)
    ap.add_argument("--stream", action="store_true",
                    help="incremental mode: process only log files not "
                    "yet seen by the --state checkpoint (Structured "
                    "Streaming availableNow catch-up), update the "
                    "persisted catalog, and exit")
    ap.add_argument("--master", default=None, help="Spark master override")
    args = ap.parse_args(argv)
    if args.stream and not args.state:
        ap.error("--stream requires --state (checkpoint + catalog location)")

    from .operators import drain, matrix
    from .session import get_spark
    from .sources import logs, sinks
    from . import viz

    spark = get_spark(app_name="logspark-cli", master=args.master)
    os.makedirs(args.out, exist_ok=True)

    if args.stream:
        return _run_stream(spark, args)

    parsed = logs.parse_lines(logs.read_log_dir(spark, args.logs_dir)).cache()
    n_lines = parsed.count()
    n_files = parsed.select("file").distinct().count()
    print(f"[ingest] {n_lines} lines from {n_files} container_*.log files")

    if args.method == "drain":
        catalog = drain.fit_distributed(parsed)
        matched = drain.match_distributed(parsed, catalog)
        occ = matrix.occurrences_long(matched)
    else:
        catalog, occ = matrix.pipeline(parsed, method=args.method)
    catalog = catalog.cache()

    if args.state:
        cat_path = os.path.join(args.state, "catalog")
        if os.path.isdir(cat_path):
            old = sinks.read_catalog(spark, cat_path)
            # localCheckpoint: materialize BEFORE overwriting the very
            # parquet files the accumulation lazily reads from
            catalog = sinks.accumulate_catalog(old, catalog).localCheckpoint()
            print(f"[state] accumulated with persisted catalog at {cat_path}")
        sinks.write_catalog(catalog, cat_path)
        print(f"[state] catalog persisted to {cat_path}")

    stamp = datetime.now().strftime("%Y%m%d%I%M%p")
    matrix_path = os.path.join(args.out, f"event_matrix_exec{stamp}.csv")
    _csv_single_file(
        matrix.summary_matrix(catalog, reference_names=True), matrix_path
    )
    n_events = catalog.count()
    print(f"[matrix] {n_events} events -> {matrix_path}")

    counts = matrix.event_counts(occ).cache()
    failures = matrix.failure_events(counts)
    print("[stats] failure-event distribution (events with occurrences > 0):")
    for r in failures.orderBy(F.desc("total")).collect():
        print(f"    Event_{r.cluster_id}: {int(r.total)}")
    chart = viz.failure_distribution_data(counts)
    chart_path = os.path.join(args.out, "failure_distribution.csv")
    chart.to_csv(chart_path, index=False)
    print(f"[viz] chart data -> {chart_path}")

    if args.ml:
        _run_ml(spark, parsed, catalog, occ, args)

    spark.catalog.clearCache()
    return 0


def _run_stream(spark, args) -> int:
    """Incremental catch-up run: the streaming twin of ``--state``.

    The file-source checkpoint remembers which ``container_*.log``
    files earlier runs consumed; ``availableNow`` processes exactly the
    new ones, the state store carries running (template, size) counts
    across runs (the distributed drain3_state.bin), and the complete-
    mode sink overwrites the persisted catalog with the full updated
    view. Repeated runs over an unchanged directory are no-ops.
    """
    from .streaming import mining_stream as ms

    catalog_path = os.path.join(args.state, "stream_catalog")
    checkpoint = os.path.join(args.state, "checkpoint")
    raw = ms.read_log_stream(spark, args.logs_dir)
    templates = ms.mine_templates_stream(ms.parse_stream(raw))
    q = ms.write_catalog_stream(
        templates, catalog_path, checkpoint, mode="complete", available_now=True
    )
    q.awaitTermination()
    # dense ids at the export edge — catalog-sized input, same idiom as
    # mining._rank_templates (single-partition sort over ≤ #templates rows)
    cat = spark.read.parquet(catalog_path).withColumn(
        "cluster_id", F.row_number().over(Window.orderBy("template"))
    )
    stamp = datetime.now().strftime("%Y%m%d%I%M%p")
    matrix_path = os.path.join(args.out, f"event_matrix_exec{stamp}.csv")
    _csv_single_file(
        cat.select(
            F.col("cluster_id").alias("Cluster ID"),
            F.col("size").alias("Size"),
            F.col("template").alias("Template"),
        ),
        matrix_path,
    )
    rows = spark.read.parquet(catalog_path).agg(
        F.count(F.lit(1)), F.sum("size")
    ).first()
    print(f"[stream] catalog: {rows[0]} templates, {rows[1]} lines total "
          f"(accumulated across runs) -> {matrix_path}")
    return 0


def _run_ml(spark, parsed: DataFrame, catalog: DataFrame, occ: DataFrame, args) -> None:
    """Windowed failure-prediction analytics (process_logs_v10.py:220-447):
    wide one-hot → correlation pruning (>0.7) → 5-row tumbling windows
    (sum X / max y) → 60/20/20 stratified split → LR + RF metrics &
    importances → isolation forest → PCA(k=2)."""
    from .ml import anomaly, pipeline as mlp
    from .operators import matrix
    from . import viz

    event_ids = [r.cluster_id for r in catalog.select("cluster_id").collect()]
    target = args.target_event
    if target is None:
        # rarest event stands in for the reference's fixed failure id
        # (target_event=1020, process_logs_v10.py:245)
        target = catalog.orderBy("size", "cluster_id").first().cluster_id
    if target not in event_ids:
        print(f"[ml] target event {target} not in catalog — skipping ML")
        return
    print(f"[ml] target event: Event_{target}")

    wide = matrix.occurrences_wide(occ, event_ids=event_ids)
    feature_cols = [f"Event_{i}" for i in event_ids if i != target]
    label_col = f"Event_{target}"

    _, pruned_cols = mlp.prune_correlated(wide, feature_cols, threshold=0.7)
    dropped = sorted(set(feature_cols) - set(pruned_cols))
    if dropped:
        print(f"[ml] dropped for |corr|>0.7: {dropped}")

    ordered = _global_line_order(wide)
    win = ordered.withColumn(
        "window_id", F.floor((F.col("_line_idx") - 1) / args.window_size)
    )
    agg = win.groupBy("window_id").agg(
        *[F.sum(c).alias(c) for c in pruned_cols],
        F.max(label_col).alias("label"),
    )

    assembled = mlp.assemble(agg, pruned_cols)
    train, val, test = mlp.three_way_split(assembled, fractions=(0.6, 0.2, 0.2))
    report_lines = [
        f"windows: {agg.count()} (size={args.window_size})",
        f"features after pruning: {len(pruned_cols)}",
        f"split: train={train.count()} val={val.count()} test={test.count()}",
    ]

    lr = mlp.fit_logistic_regression(train)
    lr_val = mlp.evaluate_classifier(lr.transform(val))
    report_lines.append(f"logistic_regression(val): {lr_val}")
    lr_imp = mlp.lr_importances(lr, pruned_cols)
    viz.topk_coefficients_data(lr_imp).to_csv(
        os.path.join(args.out, "lr_coefficients.csv"), index=False
    )

    rf = mlp.fit_random_forest(train)
    rf_test = mlp.evaluate_classifier(rf.transform(test))
    report_lines.append(f"random_forest(test): {rf_test}")
    viz.topk_coefficients_data(mlp.rf_importances(rf, pruned_cols)).to_csv(
        os.path.join(args.out, "rf_importances.csv"), index=False
    )

    scored = anomaly.score_isolation_forest(assembled, pruned_cols)
    top = scored.orderBy(F.desc("anomaly_score")).select(
        "window_id", "anomaly_score"
    ).limit(20).toPandas()
    top.to_csv(os.path.join(args.out, "anomaly_scores.csv"), index=False)
    report_lines.append(
        f"isolation_forest: top score {top.anomaly_score.max():.3f} "
        f"(window {int(top.window_id.iloc[0])})"
    )

    pca_model = mlp.fit_pca(assembled, k=2)
    projected = pca_model.transform(assembled)
    viz.pca_scatter_data(projected).to_csv(
        os.path.join(args.out, "pca_projection.csv"), index=False
    )
    report_lines.append(
        f"pca: explained variance {[round(v, 4) for v in pca_model.explainedVariance]}"
    )

    report_path = os.path.join(args.out, "ml_report.txt")
    with open(report_path, "w") as f:
        f.write("\n".join(report_lines) + "\n")
    print("[ml] " + "; ".join(report_lines))
    print(f"[ml] report -> {report_path}")


if __name__ == "__main__":
    sys.exit(run())
