from pyspark.sql import functions as F

from mgl870_tp02_project_01_hadoopmapreducelogs_spark.plans import plan_report
from mgl870_tp02_project_01_hadoopmapreducelogs_spark.sources import bucketing


def test_cobucketed_join_plans_no_shuffle(spark, tmp_path):
    # save/restore the PRIOR value (not a hardcoded default) — same
    # pattern as test_bucketed_index_anti_join_shuffles_batch_only below
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        left = spark.range(10_000).select(
            F.col("id").alias("k"), (F.col("id") % 100).alias("a")
        )
        right = spark.range(10_000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("b")
        )
        bucketing.write_bucketed(left, "t_bucket_left", "k", n_buckets=4)
        bucketing.write_bucketed(right, "t_bucket_right", "k", n_buckets=4)

        joined = bucketing.cobucketed_join(spark, "t_bucket_left", "t_bucket_right", "k")
        rep = plan_report(joined)
        assert rep["has_sort_merge_join"]
        assert rep["n_exchanges"] == 0, "co-bucketed join must not shuffle"
        assert joined.count() == 10_000

        # control: the same join on plain (unbucketed) frames DOES shuffle
        plain = left.join(right, "k")
        assert plan_report(plain)["n_exchanges"] > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS t_bucket_left")
        spark.sql("DROP TABLE IF EXISTS t_bucket_right")


def test_partitioned_sink_prunes_partitions(spark, tmp_path):
    """A filter on the partition column of a partitionBy() sink must
    become directory pruning (PartitionFilters on the scan), so
    non-matching partitions are never opened — the layout-level
    analogue of the P1 filename predicate."""
    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries import load
    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.sources import sinks

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    path = str(tmp_path / "docs_by_lang")
    sinks.write_partitioned(docs, path, ["lang"])

    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.plans.audit import (
        explain_str,
    )

    back = spark.read.parquet(path).filter(F.col("lang") == "en")
    plan = explain_str(back, "formatted")
    assert "PartitionFilters: [" in plan
    assert "lang" in plan.split("PartitionFilters:")[1].split("]")[0], plan
    # values round-trip for the selected partition
    want = docs.filter(F.col("lang") == "en").count()
    assert back.count() == want


def test_bucketed_index_anti_join_shuffles_batch_only(spark):
    """Pins dedup_incremental_index's 100 TB claim: with the persisted
    fingerprint index written bucketed on fp, the batch-vs-index
    LeftAnti join needs NO exchange on the index side — only the (much
    smaller) new batch moves. The index (the big side at scale) reads
    in place."""
    # save/restore the PRIOR value (not a hardcoded default) so a
    # session fixture with a non-default threshold isn't leaked into
    # later tests (the pattern test_spread.py uses for maxPartitionBytes)
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        idx = spark.range(20_000).select(
            F.md5(F.col("id").cast("string")).alias("fp")
        )
        bucketing.write_bucketed(idx, "t_fp_index", "fp", n_buckets=4)
        batch = spark.range(19_000, 21_000).select(
            F.md5(F.col("id").cast("string")).alias("fp"),
            F.col("id").alias("doc_id"),
        )
        kept = batch.join(spark.table("t_fp_index"), "fp", "left_anti")
        rep = plan_report(kept)
        # exactly one exchange: the batch side aligning to the index's
        # bucketing; a second would mean the index itself shuffled
        assert rep["n_exchanges"] == 1, rep
        assert kept.count() == 1_000  # 19000..19999 collide, 20000.. survive
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS t_fp_index")
