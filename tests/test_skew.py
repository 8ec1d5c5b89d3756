from pyspark.sql import functions as F

from mgl870_tp02_project_01_hadoopmapreducelogs_spark.operators import skew


def _skewed(spark, n_hot=5000, n_tail=50):
    hot = spark.range(n_hot).select(
        F.lit("hot_key").alias("k"), (F.col("id") % 7).cast("double").alias("v")
    )
    tail = spark.range(n_tail).select(
        F.concat(F.lit("key_"), F.col("id")).alias("k"), F.lit(1.0).alias("v")
    )
    return hot.unionByName(tail)


def test_salted_agg_matches_plain_agg(spark):
    df = _skewed(spark)
    plain = {
        r.k: (r.s, r.n, r.mx)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("v").alias("n"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        r.k: (r.s, r.n, r.mx)
        for r in skew.salted_agg(
            df, ["k"], [("v", "sum", "s"), ("v", "count", "n"), ("v", "max", "mx")]
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain_join(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot_key", 100), ("key_1", 200), ("key_7", 300)], "k string, w int"
    )
    plain = big.join(small, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
    )
    salted = skew.salted_join(big, small, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_cap_hot_keys(spark):
    df = _skewed(spark, n_hot=100, n_tail=3)
    capped = skew.cap_hot_keys(df, "k", max_per_key=10, order_col="v")
    counts = {r.k: r.n for r in capped.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["hot_key"] == 10
    assert all(v == 1 for k, v in counts.items() if k != "hot_key")
