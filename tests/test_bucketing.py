from pyspark.sql import functions as F

from mgl870_tp02_project_01_hadoopmapreducelogs_spark.plans import plan_report
from mgl870_tp02_project_01_hadoopmapreducelogs_spark.sources import bucketing


def test_cobucketed_join_plans_no_shuffle(spark, tmp_path):
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
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS t_bucket_left")
        spark.sql("DROP TABLE IF EXISTS t_bucket_right")
