import math

from pyspark.sql import functions as F

from mgl870_tp02_project_01_hadoopmapreducelogs_spark.functions import vectors as V


def _pairs(spark, a, b, expr):
    df = spark.createDataFrame([(a, b)], ["a", "b"])
    return df.select(expr(F.col("a"), F.col("b")).alias("out")).collect()[0].out


def test_dot_and_norm(spark):
    assert _pairs(spark, [1.0, 2.0, 3.0], [4.0, 5.0, 6.0], V.dot) == 32.0
    df = spark.createDataFrame([([3.0, 4.0],)], ["a"])
    assert df.select(V.norm(F.col("a")).alias("n")).collect()[0].n == 5.0


def test_cosine(spark):
    assert _pairs(spark, [1.0, 0.0], [0.0, 1.0], V.cosine) == 0.0
    assert abs(_pairs(spark, [1.0, 1.0], [2.0, 2.0], V.cosine) - 1.0) < 1e-12
    # zero vector guarded
    assert _pairs(spark, [0.0, 0.0], [1.0, 1.0], V.cosine) == 0.0


def test_l2_and_unit(spark):
    assert _pairs(spark, [0.0, 0.0], [3.0, 4.0], V.l2_distance) == 5.0
    df = spark.createDataFrame([([3.0, 4.0],)], ["a"])
    u = df.select(V.unit(F.col("a")).alias("u")).collect()[0].u
    assert math.isclose(sum(x * x for x in u), 1.0, rel_tol=1e-12)
