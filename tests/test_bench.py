"""bench.py registry consistency — the graded artifact must never name
a query that doesn't exist or time one twice."""

import sys


def test_headline_names_resolve_and_are_unique():
    sys.path.insert(0, ".")
    from bench import CHUNKS, HEADLINE

    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries import REGISTRY

    flat = [n for chunk in CHUNKS for n in chunk]
    assert flat == HEADLINE
    assert len(set(HEADLINE)) == len(HEADLINE), "duplicate headline query"
    missing = [n for n in HEADLINE if n not in REGISTRY]
    assert not missing, f"headline names not in REGISTRY: {missing}"
    # shared-session noise bound: r5 measured visible per-query signal
    # degradation at 11 queries/chunk; keep every chunk at <=10
    oversized = [c[0] for c in CHUNKS if len(c) > 10]
    assert not oversized, f"chunk too large (noise bound): {oversized}"


def test_driver_window_is_oracle_bearing_and_stable():
    """The correctness driver samples the FIRST 50 registry entries; a
    careless registration order change would silently burn evidence
    slots. Pin: the window matches the round-6 rotation plan — the 8
    never-driver-sampled round-5 additions first, then the 4 r2-stale
    re-samples (oldest evidence anywhere), then 38 of the r3-stale
    greens (TPC-H block, streaming block, dedup/vector entries
    including the re-fixed dedup_embedding_planted). Every window
    entry must be oracle-bearing this round."""
    import sys

    sys.path.insert(0, ".")
    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries import REGISTRY

    window = list(REGISTRY)[:50]
    no_oracle = [n for n in window if REGISTRY[n].oracle is None]
    assert no_oracle == [], (
        f"unexpected rows-only entries in the driver window: {no_oracle}"
    )
    # anchors of the round-6 rotation plan
    for must in (
        "dedup_semdedup",
        "sim_mmr_topk",
        "sim_triplet_mining",
        "source_jsonl_roundtrip",
        "text_bpe_merge_topk",
        "text_bpe_train",
        "text_bpe_apply",
        "text_char_entropy",
        "tpch_q5_region_volume",
        "tpch_q14_promo_share",
        "topk_per_group",
        "time_tumbling_hourly",
        "tpch_q2_min_cost_supplier",
        "tpch_q22_sales_opportunity",
        "streaming_dedup_exact",
        "dedup_embedding_planted",
        "dedup_connected_components",
        "dedup_semdedup_kmeans",
    ):
        assert must in window, f"{must} fell out of the driver window"
