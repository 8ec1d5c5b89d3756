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
