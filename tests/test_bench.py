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


def test_driver_window_is_oracle_bearing_and_stable():
    """The correctness driver samples the FIRST 50 registry entries; a
    careless registration order change would silently burn evidence
    slots. Pin: the window matches the round-5 rotation plan — the 15
    never-driver-sampled entries first, then the r1-stale re-samples,
    then the r2-stale re-samples. The only rows-only entry allowed in
    the window is the DELIBERATE one (sim_pq_topk is rows-only by
    design and rides with its sim_pq_recall oracle companion)."""
    import sys

    sys.path.insert(0, ".")
    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries import REGISTRY

    window = list(REGISTRY)[:50]
    no_oracle = [n for n in window if REGISTRY[n].oracle is None]
    assert no_oracle == ["sim_pq_topk"], (
        f"unexpected rows-only entries in the driver window: {no_oracle}"
    )
    # anchors of the round-5 rotation plan
    for must in (
        "dedup_incremental_index",
        "streaming_incremental_index",
        "corpus_shuffle_deterministic",
        "split_leakage_audit",
        "ml_kfold_assignment",
        "streaming_late_data_audit",
        "sim_pq_recall",
        "sim_pq_topk",
        "text_bigram_logprob",
        "dq_corpus_drift",
        "dq_embedding_health",
        "corpus_mixture_solver",
        "s2_single_file_source",
        "s3_malformed_line_audit",
        "s6_memory_table_source",
        "window_rank_analytics",
        "a6_class_histogram",
        "multimodal_ppm_roundtrip",
    ):
        assert must in window, f"{must} fell out of the driver window"
