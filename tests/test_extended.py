from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def test_sink_roundtrip_has_no_divergence(spark):
    row = REGISTRY["s4_s5_sink_roundtrip"].run(spark, SF_DIR).collect()[0]
    assert row.n_divergent_rows == 0


def test_approx_sketches_within_bounds(spark):
    # the query now carries its accuracy bounds as output columns (the
    # oracle pins them TRUE); assert them here too at the smoke scale
    row = REGISTRY["approx_sketches"].run(spark, SF_DIR).collect()[0]
    assert row.exact_orders > 0
    assert row.hll_within_3rsd
    assert row.median_in_band
    assert row.p99_in_band


def test_ivf_topk_matches_brute_force_in_probed_cell(spark):
    ivf = {r.vec_id for r in REGISTRY["sim_ivf_topk"].run(spark, SF_DIR).collect()}
    brute = {r.vec_id for r in REGISTRY["sim_cosine_topk"].run(spark, SF_DIR).collect()}
    # nprobe=1 recall: at least a couple of the true top-10 in one cell
    assert len(ivf & brute) >= 1
    assert len(ivf) == 10


def test_ivf_recall_vs_exact_topk(spark):
    """sim_ivf_topk is only useful if its cells actually retain the true
    neighbors: pin recall of the nprobe=2 IVF top-10 against the exact
    brute-force top-10 (sim_cosine_topk) on the same data."""
    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries import (
        extended,
        vectorops,
    )

    sf = "/root/testdata/sf0.01"
    exact = {r.vec_id for r in vectorops.sim_cosine_topk(spark, sf).collect()}
    ivf = {
        r.vec_id
        for r in extended.ivf_topk(spark, sf, query_id=0, k=10, nprobe=2).collect()
    }
    assert len(exact) == 10 and len(ivf) == 10
    assert len(exact & ivf) >= 5, f"recall {len(exact & ivf)}/10"


def test_pq_shortlist_rescore_recall(spark):
    """PQ is only useful if the ADC shortlist retains the true
    neighbors: pin recall of the 16x4-bit shortlist-50 top-10 against
    the exact brute-force top-10, and that returned scores are EXACT
    cosines (rescore semantics: quantization may cost recall, never
    score fidelity)."""
    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries import (
        extended,
        vectorops,
    )

    sf = "/root/testdata/sf0.01"
    exact_rows = {
        r.vec_id: r.cos for r in vectorops.sim_cosine_topk(spark, sf).collect()
    }
    pq_rows = {
        r.vec_id: r.cos
        for r in extended.pq_topk(spark, sf, query_id=0, k=10).collect()
    }
    assert len(exact_rows) == 10 and len(pq_rows) == 10
    overlap = set(exact_rows) & set(pq_rows)
    assert len(overlap) >= 6, f"recall {len(overlap)}/10"
    # score fidelity vs an INDEPENDENT ground truth: numpy cosine on the
    # raw double vectors (sim_cosine_topk scores a floor(x*1000)-grid
    # quantization of the vectors, so it is not a tight score reference
    # — only an id-overlap one)
    import numpy as np
    from pyspark.sql import functions as F

    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries import load

    emb = {
        r.vec_id: np.array(r.e, dtype=np.float64)
        for r in load(spark, sf, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
        .filter(F.col("vec_id").isin([0, *pq_rows]))
        .collect()
    }
    q = emb[0]
    for vid, cos in pq_rows.items():
        truth = float(
            emb[vid] @ q / (np.linalg.norm(emb[vid]) * np.linalg.norm(q))
        )
        assert abs(cos - truth) <= 1.5e-4, (vid, cos, truth)


def test_pq_materialized_codes_scan_reads_only_codes(spark, tmp_path):
    """The PQ 100 TB claim as a checked plan: codes materialized once
    at ingest (pq_encode), then the ADC shortlist pass scans ONLY the
    (vec_id, code) columns — 16 small ints per vector, never the raw
    doubles — and full vectors are touched only for the constant-size
    shortlist join. Must return EXACTLY the fused pq_topk's top-k."""
    import numpy as np
    from pyspark.sql import functions as F

    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.plans.audit import (
        explain_str,
    )
    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries import (
        extended,
        load,
    )

    m, ksub, shortlist, k = 16, 16, 50, 10
    emb = load(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    rows, books, dsub = extended.pq_fit(emb, m=m, ksub=ksub)

    # ingest-time materialization (at 100 TB this is the write path)
    path = str(tmp_path / "pq_codes")
    extended.pq_encode(emb, books, dsub).write.parquet(path)

    # query time: ADC tables from the query vector + codebooks, applied
    # as element_at lookups over the codes-only scan
    qe = np.array({r.vec_id: r.e for r in rows}[0], dtype=np.float64)
    tables = [
        ((books[j] - qe[j * dsub : (j + 1) * dsub]) ** 2).sum(axis=1)
        for j in range(m)
    ]
    codes = spark.read.parquet(path).select("vec_id", "code")
    adc = None
    for j in range(m):
        tbl = F.array(*[F.lit(float(v)) for v in tables[j]])
        term = F.element_at(tbl, F.element_at("code", j + 1))
        adc = term if adc is None else adc + term
    short = (
        codes.filter(F.col("vec_id") != 0)
        .select("vec_id", adc.alias("adc_dist"))
        .orderBy(F.col("adc_dist").asc(), "vec_id")
        .limit(shortlist)
    )
    # the shortlist plan must read ONLY vec_id+code from the codes file
    # and never the embeddings table
    plan = explain_str(short, "formatted")
    assert "pq_codes" in plan and "embeddings" not in plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "code" in read_schema[0]
    assert "embedding" not in read_schema[0]

    # exact rescore on the constant-size shortlist only
    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.functions import (
        vectors as V,
    )

    q = spark.createDataFrame([(list(map(float, qe)),)], "qe array<double>")
    got = (
        F.broadcast(short.select("vec_id"))
        .join(emb, "vec_id")
        .crossJoin(F.broadcast(q))
        .select("vec_id", F.round(V.cosine(F.col("e"), F.col("qe")), 4).alias("cos"))
        .orderBy(F.col("cos").desc(), "vec_id")
        .limit(k)
        .collect()
    )
    want = extended.pq_topk(spark, SF_DIR, query_id=0, k=k).collect()
    assert [(r.vec_id, r.cos) for r in got] == [
        (r.vec_id, r.cos) for r in want
    ]


def test_ivf_seeded_topk_recall_vs_exact(spark):
    """The seeded-quantizer IVF is a FULL hash oracle for the pipeline,
    but it must also stay honest as an ANN: its nprobe=2 top-10 must
    recover at least half of the exact brute-force top-10."""
    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries import (
        REGISTRY,
    )

    sf = "/root/testdata/sf0.01"
    got = {r.vec_id for r in REGISTRY["sim_ivf_seeded_topk"].run(spark, sf).collect()}
    exact = {r.vec_id for r in REGISTRY["sim_cosine_topk"].run(spark, sf).collect()}
    assert len(got) == 10
    assert len(got & exact) >= 5, f"recall {len(got & exact)}/10"


def test_pq_seeded_topk_recall_vs_exact(spark):
    """The seeded-codebook PQ is a FULL hash oracle for the pipeline,
    but it must also stay honest as an ANN: its ADC-shortlist-50 top-10
    must recover at least half of the exact brute-force top-10
    (measured 8/10 on the sf0.01 corpus with the 32-seed codebook —
    the same bar the trained k-means codebooks hit; the pin is the
    looser seeded-IVF bar so a testdata refresh fails a test only on a
    real collapse)."""
    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries import (
        REGISTRY,
    )

    sf = "/root/testdata/sf0.01"
    got = {r.vec_id for r in REGISTRY["sim_pq_seeded_topk"].run(spark, sf).collect()}
    exact = {r.vec_id for r in REGISTRY["sim_cosine_topk"].run(spark, sf).collect()}
    assert len(got) == 10
    assert len(got & exact) >= 5, f"recall {len(got & exact)}/10"


def test_ivf_materialized_cells_partition_pruned(spark, tmp_path):
    """The IVF 100 TB claim as a checked plan (mirror of the PQ
    codes-at-ingest pin): cell ids are materialized at ingest and the
    table is laid out cell-PARTITIONED, so a query's nprobe cell filter
    prunes partitions before the scan — the plan must carry the cell
    predicate as a PartitionFilter, meaning unprobed cells' files are
    never opened. Must return EXACTLY the fused ivf_topk's top-k."""
    from pyspark.sql import functions as F
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.functions import (
        vectors as V,
    )
    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.plans.audit import (
        explain_str,
    )
    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries import (
        extended,
        load,
    )

    n_cells, nprobe, k = 8, 2, 10
    emb = load(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    with_vec = emb.withColumn("v", array_to_vector("e"))
    km = KMeans(
        k=n_cells, seed=42, featuresCol="v", predictionCol="cell"
    ).fit(with_vec)

    # ingest path: materialize assignments, lay the table out by cell
    path = str(tmp_path / "ivf_cells")
    km.transform(with_vec).select("vec_id", "e", "cell").write.partitionBy(
        "cell"
    ).parquet(path)

    # query path: probe order from the broadcast-small model (driver)
    qe = emb.filter(F.col("vec_id") == 0).first()["e"]
    dists = sorted(
        (sum((x - c) ** 2 for x, c in zip(qe, center)), i)
        for i, center in enumerate(km.clusterCenters())
    )
    probe_cells = [i for _, i in dists[:nprobe]]

    q = spark.createDataFrame([(list(map(float, qe)),)], "qe array<double>")
    cand = (
        spark.read.parquet(path)
        .filter(F.col("cell").isin(probe_cells) & (F.col("vec_id") != 0))
        .crossJoin(F.broadcast(q))
    )
    topk = (
        cand.select(
            "vec_id", F.round(V.cosine(F.col("e"), F.col("qe")), 4).alias("cos")
        )
        .orderBy(F.col("cos").desc(), "vec_id")
        .limit(k)
    )
    plan = explain_str(topk, "formatted")
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "cell" in pf[0], f"cell filter not partition-pruned: {pf}"

    got = [(r.vec_id, r.cos) for r in topk.collect()]
    want = [
        (r.vec_id, r.cos)
        for r in extended.ivf_topk(
            spark, SF_DIR, query_id=0, k=k, n_cells=n_cells, nprobe=nprobe
        ).collect()
    ]
    assert got == want


def test_ivfpq_composes_ivf_cells_with_pq_shortlist(spark):
    """Combined IVF-PQ invariants: exactly k results; every result is
    assigned (by the oracle's argmax-cosine rule, recomputed in numpy)
    to one of the query's nprobe probed cells; the rescored cosine is
    the EXACT integer-arithmetic cosine (ADC only shortlists — it
    never perturbs reported scores); and the PQ shortlist recovers
    >= 7 of the IVF-only top-10 (measured 10/10 at sf0.001, 8/10 at
    sf0.01 — the coarse quantizer, not PQ, is the recall limiter)."""
    import numpy as np

    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries.extended import (
        IVF_SEED_K,
        IVF_SEED_NPROBE,
        PQS_KSUB,
    )
    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries.vectorops import (
        _int_emb,
    )
    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries import load
    from pyspark.sql import functions as F

    rows = REGISTRY["sim_ivfpq_seeded_topk"].run(spark, SF_DIR).collect()
    assert len(rows) == 10
    ivf = [
        r.vec_id
        for r in REGISTRY["sim_ivf_seeded_topk"].run(spark, SF_DIR).collect()
    ]
    assert len(set(r.vec_id for r in rows) & set(ivf)) >= 7

    emb = load(spark, SF_DIR, "embeddings").select(
        "vec_id", _int_emb(F.col("embedding")).alias("e")
    )
    seeds = (
        emb.select(
            "vec_id", "e", F.md5(F.col("vec_id").cast("string")).alias("h")
        )
        .orderBy("h", "vec_id")
        .limit(PQS_KSUB)
        .collect()
    )
    S8 = np.array([r.e for r in seeds[:IVF_SEED_K]], dtype="float64")
    sn8 = np.sqrt((S8 * S8).sum(axis=1))
    by_id = {r.vec_id: np.array(r.e, dtype="float64") for r in emb.collect()}
    qe = by_id[0]
    qn = np.sqrt(qe @ qe)
    qcos_seeds = (S8 @ qe) / (sn8 * qn)
    probed = {
        i + 1
        for i in sorted(range(IVF_SEED_K), key=lambda i: (-qcos_seeds[i], i))[
            :IVF_SEED_NPROBE
        ]
    }
    for r in rows:
        v = by_id[r.vec_id]
        cos = (S8 @ v) / (sn8 * np.sqrt(v @ v))
        assert int(cos.argmax()) + 1 in probed, r.vec_id
        exact = float((v @ qe) / (np.sqrt(v @ v) * qn))
        assert abs(r.cos - round(exact, 4)) < 1e-9, r.vec_id
