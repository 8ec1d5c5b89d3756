"""The bit-parity contract behind every vector oracle, property-tested.

All vector queries argue the same theorem: for integer-scaled
embeddings (|x| <= 1e6, dim <= 64), dot products and squared norms are
integers below 2^53, so float64 represents them EXACTLY under any
accumulation order — numpy/BLAS (the Arrow kernels), Catalyst's
sequential aggregate fold, and DuckDB's list_sum all produce the same
double, and a cosine formed with the one shared op order (sqrt,
multiply, divide, 0.0 on zero denominator) is bit-identical across all
three. Hypothesis hammers the numpy-vs-sequential half of that claim
directly (no Spark session needed — Catalyst and DuckDB are both
sequential folds); a fixed-seed Spark test covers the
anchor_cosine_scan plumbing against the interpreted expression chain
it replaced."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

#: |x| <= 1e6, dim <= 64 -> products <= 1e12, sums < 6.4e13 << 2^53.
#: The real embeddings are floor(x*1000) with |x| <= ~1, i.e. far
#: smaller; the strategy stresses the full exactness envelope.
_ints = st.integers(min_value=-1_000_000, max_value=1_000_000)
_vec_sets = st.integers(min_value=1, max_value=64).flatmap(
    lambda d: st.lists(
        st.lists(_ints, min_size=d, max_size=d), min_size=2, max_size=6
    )
)


def _seq_cos(a, b):
    """Sequential left-to-right fold — the op order of BOTH Catalyst's
    F.aggregate and DuckDB's list_sum(list_transform(...)), with the
    shared final op order (sqrt, multiply, divide)."""
    dot = 0.0
    for x, y in zip(a, b):
        dot += float(x * y)
    na = 0.0
    for x in a:
        na += float(x * x)
    nb = 0.0
    for y in b:
        nb += float(y * y)
    den = math.sqrt(na) * math.sqrt(nb)
    return 0.0 if den == 0 else dot / den


@given(_vec_sets)
@settings(max_examples=300)
def test_blas_cosine_bitwise_equals_sequential_fold(vs):
    """numpy matmul cosine (the kernel) == sequential-fold cosine (the
    engines) EXACTLY — no tolerance. The first row plays the anchor."""
    A = np.array(vs[:1], dtype="float64")
    U = np.array(vs[1:], dtype="float64")
    an = np.sqrt((A * A).sum(axis=1))
    n2 = (U * U).sum(axis=1)
    dots = U @ A.T
    den = np.sqrt(n2)[:, None] * an[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        cos = np.where(den == 0.0, 0.0, dots / den)
    for i, v in enumerate(vs[1:]):
        expect = _seq_cos(v, vs[0])
        assert cos[i, 0] == expect  # bitwise: both are the same double


@given(_vec_sets)
@settings(max_examples=100)
def test_integer_dots_are_order_independent(vs):
    """The exactness core: forward fold == reversed fold == numpy sum
    for every pairwise dot — any accumulation order hits the same
    integer, so no engine's summation strategy can diverge."""
    for a in vs:
        for b in vs:
            fwd = 0.0
            for x, y in zip(a, b):
                fwd += float(x * y)
            rev = 0.0
            for x, y in reversed(list(zip(a, b))):
                rev += float(x * y)
            npd = float(np.array(a, "float64") @ np.array(b, "float64"))
            assert fwd == rev == npd
            assert fwd == float(sum(x * y for x, y in zip(a, b)))


def test_anchor_cosine_scan_matches_expression_chain(spark):
    """Plumbing parity: the Arrow kernel's output equals the
    interpreted _cos_pre/_dot crossJoin formulation it replaced, on a
    seeded random corpus including zero vectors (the den==0 branch)."""
    import pyspark.sql.functions as F

    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries.vectorops import (
        _cos_pre,
        _norm,
        anchor_cosine_scan,
    )

    rng = np.random.default_rng(7)
    rows = [
        (int(i), [int(x) for x in rng.integers(-1000, 1001, size=16)])
        for i in range(40)
    ]
    rows.append((40, [0] * 16))  # zero vector -> cos defined as 0.0
    df = spark.createDataFrame(rows, "vec_id long, e array<long>")
    anchors = [(r[0], r[1]) for r in rows[:3]] + [(40, [0] * 16)]

    got = {
        (r.anchor_id, r.vec_id): r.cos
        for r in anchor_cosine_scan(df, anchors).collect()
    }

    adf = spark.createDataFrame(
        anchors, "anchor_id long, ae array<long>"
    ).withColumn("na", _norm(F.col("ae")))
    want = {
        (r.anchor_id, r.vec_id): r.cos
        for r in df.withColumn("nv", _norm(F.col("e")))
        .crossJoin(F.broadcast(adf))
        .select(
            "anchor_id",
            "vec_id",
            _cos_pre(
                F.col("e"), F.col("ae"), F.col("nv"), F.col("na")
            ).alias("cos"),
        )
        .collect()
    }
    assert got == want  # exact float equality, every pair
