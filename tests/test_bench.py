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
    slots. Pin: every window entry carries an oracle, and the window
    matches the round-3 rotation plan (never-driver-checked queries +
    this round's new hard oracles)."""
    import sys

    sys.path.insert(0, ".")
    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries import REGISTRY

    window = list(REGISTRY)[:50]
    no_oracle = [n for n in window if REGISTRY[n].oracle is None]
    assert not no_oracle, f"driver window wastes slots on rows-only: {no_oracle}"
    # anchors of the rotation plan
    for must in (
        "tpch_q2_min_cost_supplier",
        "dedup_simhash",
        "ml_correlation_pruner",
        "t1c_drain_invariants",
        "streaming_drain_invariants",
        "dedup_embedding_planted",
        "text_oov_rate",
    ):
        assert must in window, f"{must} fell out of the driver window"
