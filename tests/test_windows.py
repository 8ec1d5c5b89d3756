"""global_row_number: the scale-safe replacement for the single-
partition Window.orderBy row numbering (round-1 verdict item #2)."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from mgl870_tp02_project_01_hadoopmapreducelogs_spark.operators import windows


def test_global_row_number_matches_window_form(spark):
    # keys with gaps, negative values, unsorted input, many partitions
    keys = [7, -3, 1000, 42, 0, 999, -100, 17, 256, 3]
    df = spark.createDataFrame([(k,) for k in keys], "k long").repartition(5)
    got = {
        r.k: r.rn
        for r in windows.global_row_number(df, ["k"], out_col="rn").collect()
    }
    expect = {
        r.k: r.rn
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("k"))
        ).collect()
    }
    assert got == expect


def test_global_row_number_dense_and_complete(spark):
    n = 10000
    df = spark.range(n).select((F.col("id") * 13 % 99991).alias("k"))
    # keys here are unique (13 coprime with 99991); rn must be a
    # permutation of 1..n and monotone in k
    out = windows.global_row_number(df, ["k"]).collect()
    rns = sorted(r.rn for r in out)
    assert rns == list(range(1, n + 1))
    by_k = sorted((r.k, r.rn) for r in out)
    assert all(a[1] < b[1] for a, b in zip(by_k, by_k[1:]))


def test_add_row_buckets_sizes(spark):
    df = spark.range(23).select(F.col("id").alias("k"))
    out = windows.add_row_buckets(df, ["k"], window_size=5)
    sizes = {
        r.window_id: r.n
        for r in out.groupBy("window_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sizes == {0: 5, 1: 5, 2: 5, 3: 5, 4: 3}


def test_global_row_number_empty_input(spark):
    df = spark.range(0).select(F.col("id").alias("k"))
    assert windows.global_row_number(df, ["k"]).count() == 0


def test_global_row_number_many_buckets(spark):
    """Codegen-safety pin for the offset map at cluster-width bucket
    counts: the offsets used to ship as an O(buckets)-deep chained
    when().otherwise() expression that risks hitting codegen limits;
    they are now one flat create_map literal + element_at lookup.
    2000 buckets ~ a wide cluster's defaultParallelism."""
    n = 20000
    df = spark.range(n).select((F.col("id") * 7 % 199999).alias("k"))
    out = windows.global_row_number(df, ["k"], num_buckets=2000).collect()
    rns = sorted(r.rn for r in out)
    assert rns == list(range(1, n + 1))
    by_k = sorted((r.k, r.rn) for r in out)
    assert all(a[1] < b[1] for a, b in zip(by_k, by_k[1:]))
