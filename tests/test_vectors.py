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


def test_planted_dedup_lsh_candidate_volume_prunes(spark):
    """Evidence that dedup_embedding_planted's 8x8 band config GENUINELY
    prunes (the round-2 gap: the registered 16x4 config was
    near-brute-force by documented design): the number of candidate
    pairs the band buckets generate must be a small fraction of the
    all-pairs volume, while every planted pair still survives."""
    from pyspark.sql import functions as F

    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries.vectorops import (
        PLANT_BANDS,
        PLANT_BITS,
        PLANT_EVERY,
        PLANT_OFFSET,
        _int_emb,
        _with_planted,
    )
    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries import load

    sf_dir = "/root/testdata/sf0.01"
    b0 = load(spark, sf_dir, "embeddings").select(
        "vec_id", _int_emb(F.col("embedding")).alias("e")
    )
    base = _with_planted(b0)
    n = base.count()

    def bucket(b):
        return sum(
            F.when(
                F.element_at("e", b * PLANT_BITS + j + 1) >= 0, F.lit(2**j)
            ).otherwise(0)
            for j in range(PLANT_BITS)
        )

    banded = base.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band_id"), bucket(b).alias("bucket"))
                    for b in range(PLANT_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("vec_id", "bb.band_id", "bb.bucket")
    # distinct candidate pairs across all band buckets
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select("a.vec_id", "b.vec_id")
        .distinct()
        .count()
    )
    all_pairs = n * (n - 1) // 2
    assert cand < 0.25 * all_pairs, (
        f"LSH candidates {cand} not pruning vs {all_pairs} all-pairs"
    )
    # and recall stays total: every planted pair is in the result
    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries import REGISTRY

    found = {
        (r.vec_a, r.vec_b)
        for r in REGISTRY["dedup_embedding_planted"].run(spark, sf_dir).collect()
    }
    want = {
        (r.vec_id, r.vec_id + PLANT_OFFSET)
        for r in b0.filter(F.col("vec_id") % PLANT_EVERY == 0)
        .select("vec_id")
        .collect()
    }
    assert want <= found


def test_semdedup_matches_numpy_ground_truth(spark):
    """Full independent replication of SemDeDup at sf0.001: seeds by
    md5 order, argmax cell assignment, within-cell pairs >= threshold,
    keep-the-least-centroid-similar — all recomputed in plain
    numpy/hashlib, then compared to the Spark pipeline's drop set
    EXACTLY (the registered summary's counts cannot distinguish which
    pair member was dropped; this pins the keep rule itself)."""
    import hashlib
    import math

    import numpy as np

    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries.vectorops import (
        PLANT_EVERY,
        PLANT_OFFSET,
        SEM_COS_TH,
        SEM_K,
        semdedup_parts,
    )

    assigned, dropped = semdedup_parts(spark, SF_DIR)
    got_drops = {r.vec_id for r in dropped.collect()}
    got_cells = {r.vec_id: r.cluster for r in assigned.collect()}

    # --- ground truth, no Spark expressions reused ---
    raw = {
        r.vec_id: [math.floor(float(x) * 1000) for x in r.embedding]
        for r in spark.read.parquet(SF_DIR + "/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    }
    vecs = dict(raw)
    for vid in sorted(raw):
        if vid % PLANT_EVERY == 0:
            # the perturbation is derived from the PRE-offset id (the
            # engines disagree on whether a lambda's `vec_id` binds to a
            # sibling alias, so _with_planted computes it in an inner
            # select before applying the +PLANT_OFFSET twin id); i+1
            # mirrors DuckDB's 1-based lambda index
            vecs[vid + PLANT_OFFSET] = [
                x + ((vid + i + 1) % 3 - 1) for i, x in enumerate(raw[vid])
            ]
    seeds = sorted(
        raw, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v)
    )[:SEM_K]

    def cos(a, b):
        num = float(np.dot(np.array(a, "float64"), np.array(b, "float64")))
        den = math.sqrt(float(np.dot(np.array(a, "float64"), np.array(a, "float64")))) * math.sqrt(
            float(np.dot(np.array(b, "float64"), np.array(b, "float64")))
        )
        return 0.0 if den == 0 else num / den

    cell, cent = {}, {}
    for vid, e in vecs.items():
        best = max(
            ((cos(e, vecs[s]), -(r + 1)) for r, s in enumerate(seeds)),
        )
        cell[vid], cent[vid] = -best[1], best[0]
    assert cell == got_cells

    want_drops = set()
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if cell[a] == cell[b] and cos(vecs[a], vecs[b]) >= SEM_COS_TH:
                want_drops.add(b if cent[a] <= cent[b] else a)
    assert got_drops == want_drops
    assert want_drops, "planted duplicates must exercise the drop path"


def test_semdedup_kmeans_invariants_hold_at_other_scale(spark):
    """The dedup_semdedup_kmeans invariants are registered (and driver-
    hashed) at sf0.01; re-assert them at sf0.001 so they are properties
    of the ALGORITHM, not artifacts of one corpus — plus the STRONG
    drop property (exactly one drop per planted pair) that the
    registered invariant deliberately relaxes to stay robust against a
    KMeans cell boundary grazing a twin pair on some future corpus: a
    split pair should fail THIS test, not the driver's artifact."""
    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries import REGISTRY
    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries.vectorops import (
        PLANT_EVERY,
        PLANT_OFFSET,
        semdedup_kmeans_parts,
    )

    row = REGISTRY["dedup_semdedup_kmeans"].run(spark, SF_DIR).first()
    n_raw = spark.read.parquet(SF_DIR + "/embeddings.parquet").count()
    n_planted = (
        spark.read.parquet(SF_DIR + "/embeddings.parquet")
        .filter(f"vec_id % {PLANT_EVERY} = 0")
        .count()
    )
    assert row.n_vectors == n_raw + n_planted
    assert row.cells_at_most_k
    assert row.every_vector_assigned_once
    assert row.drops_only_planted_pair_members
    assert row.some_duplicates_dropped

    # strong form: on THIS corpus no cell boundary splits a twin pair,
    # so exactly one member of every planted pair drops
    _, dropped = semdedup_kmeans_parts(spark, SF_DIR)
    drops = {r.vec_id for r in dropped.collect()}
    assert len(drops) == n_planted
    assert len({v % PLANT_OFFSET for v in drops}) == n_planted


def test_mmr_matches_numpy_ground_truth(spark):
    """Independent greedy-MMR replication in plain numpy at sf0.001:
    same seeds, same lambda-blend, same tie-breaks — the selection walk
    (ids AND order) must match the Spark pipeline exactly."""
    import math

    import numpy as np

    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries.vectorops import (
        MMR_K,
        MMR_LAMBDA,
        MMR_POOL,
        sim_mmr_topk,
    )

    got = [(r.rank, r.vec_id) for r in sim_mmr_topk(spark, SF_DIR).collect()]

    vecs = {
        r.vec_id: np.array(
            [math.floor(float(x) * 1000) for x in r.embedding], "float64"
        )
        for r in spark.read.parquet(SF_DIR + "/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    }

    def cos(a, b):
        den = math.sqrt(float(a @ a)) * math.sqrt(float(b @ b))
        return 0.0 if den == 0 else float(a @ b) / den

    q = vecs[0]
    rel = {v: cos(e, q) for v, e in vecs.items() if v != 0}
    # the walk reranks the retrieved pool (paper's set R): top-MMR_POOL
    # by (rel desc, vec_id)
    pool = sorted(rel, key=lambda v: (-rel[v], v))[:MMR_POOL]
    rel = {v: rel[v] for v in pool}
    sel: list = []
    lam2 = round(1 - MMR_LAMBDA, 1)
    for _ in range(MMR_K):
        best = None
        for v in sorted(rel):
            if v in [s for s, _ in sel]:
                continue
            div = max((cos(vecs[v], vecs[s]) for s, _ in sel), default=0.0)
            score = MMR_LAMBDA * rel[v] - lam2 * div
            if best is None or score > best[1]:
                best = (v, score)
        sel.append(best)
    assert got == [(i + 1, v) for i, (v, _) in enumerate(sel)]
    # diversity must bite: the walk must differ from plain relevance order
    plain = sorted(rel, key=lambda v: (-rel[v], v))[:MMR_K]
    assert [v for _, v in got] != plain


def test_semantic_contamination_flags_exactly_the_planted_twins(spark):
    """Every benchmark member's planted twin (cos > 0.99 near-copy at
    vec_id + PLANT_OFFSET) must flag contaminated, and nothing else —
    the independent-embedding background sits far below the threshold
    (second scale beyond the oracle's sf0.01)."""
    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries.vectorops import (
        PLANT_OFFSET,
        SEM_BENCH_MAX,
        text_contamination_semantic,
    )

    rows = text_contamination_semantic(spark, "/root/testdata/sf0.001").collect()
    flagged = {r.vec_id for r in rows if r.contaminated}
    # expected: the twins of the benchmark originals (lowest
    # SEM_BENCH_MAX ids with vec_id % 50 == 0, all < PLANT_OFFSET)
    import pyspark.sql.functions as F

    base_ids = sorted(
        r.vec_id
        for r in spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        )
        .filter(F.col("vec_id") % 50 == 0)
        .select("vec_id")
        .collect()
    )[:SEM_BENCH_MAX]
    expected = {i + PLANT_OFFSET for i in base_ids}
    assert flagged == expected
    for r in rows:
        if r.vec_id in expected:
            assert r.max_benchmark_cos > 0.99
        else:
            assert r.max_benchmark_cos < 0.6


def test_streaming_semantic_screen_flags_planted_twin(spark, tmp_path):
    """On a staged micro-corpus the streamed screen must flag exactly
    the planted twin of the one benchmark vector, with the unrelated
    vector far below threshold — and emit one row per non-benchmark
    vector (stateless append-mode output)."""
    import glob
    import shutil

    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries.streamq import (
        streaming_contamination_semantic,
    )
    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries.vectorops import (
        PLANT_OFFSET,
    )

    # vec_id 0: benchmark original (%50==0, %25==0 -> has a twin);
    # vec_id 7: unrelated. dim-8 embeddings, clearly separated.
    rows = [
        (0, [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0], 0),
        (7, [8.0, -7.0, 6.0, -5.0, 4.0, -3.0, 2.0, -1.0], 0),
    ]
    stage = tmp_path / "stage"
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(stage))
    shutil.move(
        glob.glob(str(stage / "part-*.parquet"))[0],
        str(tmp_path / "embeddings.parquet"),
    )

    out = {
        r.vec_id: (r.max_benchmark_cos, r.contaminated)
        for r in streaming_contamination_semantic(
            spark, str(tmp_path)
        ).collect()
    }
    # benchmark vector itself is excluded; its twin + the unrelated
    # vector's twin-less row remain (7 is not %25==0 -> no twin)
    assert set(out) == {PLANT_OFFSET + 0, 7}
    cos_twin, flag_twin = out[PLANT_OFFSET + 0]
    assert flag_twin and cos_twin > 0.99
    cos_other, flag_other = out[7]
    assert not flag_other and cos_other < 0.6
