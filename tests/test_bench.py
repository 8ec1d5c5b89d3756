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
    slots. Pin: the window matches the round-4 rotation plan — the
    never-driver-sampled tail, the rows-only→oracle upgrades, this
    round's new invariant oracles, and the stale-green re-samples.
    The only rows-only entries allowed in the window are the two
    DELIBERATE ones (streaming_drain_mining is rows-only by design;
    sim_ivf_topk rides with its sim_ivf_recall oracle companion)."""
    import sys

    sys.path.insert(0, ".")
    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries import REGISTRY

    window = list(REGISTRY)[:50]
    no_oracle = [n for n in window if REGISTRY[n].oracle is None]
    assert no_oracle == ["streaming_drain_mining", "sim_ivf_topk"], (
        f"unexpected rows-only entries in the driver window: {no_oracle}"
    )
    # anchors of the round-4 rotation plan
    for must in (
        "ml_model_quality",
        "sim_ivf_recall",
        "streaming_session_window",
        "multimodal_feature_extract",
        "text_sample_temperature",
        "text_unigram_logprob",
        "approx_sketches",
        "s1_recursive_log_scan",
        "s4_s5_sink_roundtrip",
        "ml_rf_quality",
        "ml_pca_variance",
        "ml_anomaly_rate",
        "w1_a4_a5_windowed_features",
        "t1a_mine_templates",
    ):
        assert must in window, f"{must} fell out of the driver window"
