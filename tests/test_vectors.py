import math

from pyspark.sql import functions as F

from mgl870_tp02_project_01_hadoopmapreducelogs_spark.functions import vectors as V
from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


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


def test_embedding_near_pairs_finds_planted_dups(spark):
    """8 bands x 8 bits near-dup config: planted near-identical vectors
    (cos > 0.99) must be recovered; unrelated vectors must not pair."""
    import random

    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries import vectorops

    rng = random.Random(11)
    base = [rng.gauss(0, 1) for _ in range(64)]
    near = [x + rng.gauss(0, 0.01) for x in base]  # tiny perturbation
    far1 = [rng.gauss(0, 1) for _ in range(64)]
    far2 = [rng.gauss(0, 1) for _ in range(64)]
    rows = [(0, base), (1, near), (2, far1), (3, far2)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: F.floor(x * 1000)).alias("e"),
    )
    out = vectorops.embedding_near_pairs(emb, bands=8, bits=8, threshold=0.95)
    pairs = {(r.vec_a, r.vec_b): r.cos for r in out.collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.99
    assert all(p == (0, 1) for p in pairs)


def test_quantized_topk_recall_vs_exact(spark):
    """Int8 quantization is a shortlist stage: its top-10 must recover
    most of the exact cosine top-10 (measured 9/10 at sf0.001, 10/10 at
    sf0.01; pinned at >=7 to absorb data regeneration)."""
    exact = {
        r.vec_id for r in REGISTRY["sim_cosine_topk"].run(spark, SF_DIR).collect()
    }
    quant = {
        r.vec_id
        for r in REGISTRY["sim_quantized_topk"].run(spark, SF_DIR).collect()
    }
    assert len(exact & quant) >= 7, (exact, quant)
