"""The ``spread()`` pre-widening decision (queries/__init__.py).

spread() exists ONLY because the local testdata tables are single-file,
single-row-group parquet, where a CPU-heavy narrow chain would otherwise
run on one core. On a real cluster layout (many files / many row
groups) the scan already yields >= defaultParallelism splits and the
repartition must NOT fire — that no-op decision path is what these
tests pin (VERDICT r3 item 6).
"""

from __future__ import annotations

import os

import pytest

from mgl870_tp02_project_01_hadoopmapreducelogs_spark import queries


@pytest.fixture(scope="module")
def multi_file_table(spark, tmp_path_factory):
    """A 2-file parquet table written the way a cluster job would."""
    root = tmp_path_factory.mktemp("spreaddata")
    df = spark.range(50_000).selectExpr("id", "id * 2 AS v")
    df.repartition(2).write.parquet(str(root / "mytbl.parquet"))
    return str(root)


def test_scan_partitions_walks_multi_file_dir(spark, multi_file_table):
    path = os.path.join(multi_file_table, "mytbl.parquet")
    files = [
        os.path.join(r, f)
        for r, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ]
    assert len(files) == 2, "fixture must produce a genuinely multi-file table"
    # default 128 MiB maxPartitionBytes: tiny files -> 1 split each,
    # but the estimator must still see BOTH files (sum over the walk)
    est = queries.scan_partitions(spark, multi_file_table, "mytbl")
    assert est >= 1
    # shrink maxPartitionBytes so each file spans multiple estimated
    # splits — the multi-row-group / many-files cluster layout in
    # miniature
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "8192")
        est_small = queries.scan_partitions(spark, multi_file_table, "mytbl")
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert est_small > est
    total_bytes = sum(os.path.getsize(f) for f in files)
    import math

    floor_est = max(1, math.ceil(total_bytes / 8192))
    # the walk also counts _SUCCESS/.crc sidecars — a deliberate
    # conservative overestimate (never underestimates real splits)
    assert floor_est <= est_small <= floor_est + 4, (est_small, floor_est)


def test_spread_is_noop_on_wide_scans(spark, multi_file_table):
    """est_partitions >= defaultParallelism -> the exact same DataFrame
    comes back (no repartition node, no shuffle) — the invariant that
    keeps spread() free on real cluster layouts."""
    df = spark.read.parquet(os.path.join(multi_file_table, "mytbl.parquet"))
    target = spark.sparkContext.defaultParallelism
    assert queries.spread(df, target) is df
    assert queries.spread(df, target + 100) is df


def test_spread_widens_narrow_scans(spark, multi_file_table):
    df = spark.read.parquet(os.path.join(multi_file_table, "mytbl.parquet"))
    target = spark.sparkContext.defaultParallelism
    out = queries.spread(df, 1)
    assert out is not df
    assert "Repartition" in out._jdf.queryExecution().logical().toString()
    # row preservation
    assert out.count() == df.count()
