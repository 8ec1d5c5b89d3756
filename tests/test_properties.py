"""Property-based tests (SURVEY §5.2 item 4) — hypothesis over the
masking/mining semantics."""

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mgl870_tp02_project_01_hadoopmapreducelogs_spark.functions import preprocess as P
from mgl870_tp02_project_01_hadoopmapreducelogs_spark.operators.drain import DrainMiner

# pure-Python mirror of the masking chain for property checks
_RULES = [re.compile(p) for _, p in P.MASK_RULES]


def _mask_py(s: str) -> str:
    for r in _RULES:
        s = r.sub("<*>", s)
    return s


tokens = st.sampled_from(
    ["started", "block", "blk_42", "10.0.0.1:50010", "worker", "3.14",
     "appattempt_1_2_3", "0xdeadbeef", "retry", "17"]
)
messages = st.lists(tokens, min_size=1, max_size=8).map(" ".join)


@given(messages)
@settings(max_examples=200, suppress_health_check=[HealthCheck.too_slow])
def test_masking_is_idempotent(msg):
    once = _mask_py(msg)
    assert _mask_py(once) == once


@given(messages)
@settings(max_examples=200, suppress_health_check=[HealthCheck.too_slow])
def test_masking_leaves_no_digits_outside_wildcards(msg):
    masked = _mask_py(msg)
    assert not re.search(r"\d", masked.replace("<*>", ""))


@given(st.lists(messages, min_size=1, max_size=30))
@settings(max_examples=50, deadline=None)
def test_drain_size_conservation(msgs):
    m = DrainMiner(depth=4, sim_th=0.4)
    for msg in msgs:
        m.add(_mask_py(msg))
    assert sum(size for _, size in m.templates()) == len(msgs)


@given(st.lists(messages, min_size=1, max_size=20))
@settings(max_examples=50, deadline=None)
def test_drain_every_fitted_line_matches(msgs):
    m = DrainMiner(depth=4, sim_th=0.4)
    masked = [_mask_py(x) for x in msgs]
    for msg in masked:
        m.add(msg)
    for msg in masked:
        assert m.match(msg) is not None
