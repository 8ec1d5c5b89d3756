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
