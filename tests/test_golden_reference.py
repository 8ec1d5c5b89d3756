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
artifact), then compare (template, size*10) rows. Measured on this
fixed corpus: 50 clusters, 30 of them byte-identical to golden
templates, 29/30 of the matched templates' golden sizes EXACTLY 10x
our single-run size (the accumulation factor), total size conserved at
1,282. The assertions pin bands just under the measured values so a
faithfulness regression (similarity rule, wildcard rule, tree keying)
fails loudly while drain3-vs-ours order effects (the remaining 20
finer-grained reference clusters) stay tolerated and documented.
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
    rows = []
    with open(GOLDEN) as fh:
        for line in fh:
            m = re.match(r'"?ID=(\d+)\s*: size=(\d+)\s*: (.*?)"?\s*$', line.strip())
            if m:
                rows.append((int(m.group(1)), int(m.group(2)), m.group(3)))
    return rows


@pytest.mark.skipif(
    not (os.path.exists(CORPUS) and os.path.exists(GOLDEN)),
    reason="reference corpus/golden not present",
)
def test_reference_event_matrix_replication():
    golden = _load_golden()
    assert len(golden) == 99  # the committed artifact's shape

    lines = [ln.rstrip("\n") for ln in open(CORPUS)]
    assert len(lines) == 1282

    miner = DrainMiner(depth=4, sim_th=0.4, max_clusters=10000)
    for ln in lines:
        miner.add(ln)
    ours = miner.templates()

    # conservation: one cluster per line, no loss
    assert sum(s for _, s in ours) == len(lines)

    gold_size = {t: s for _, s, t in golden}
    matched = [(t, s) for t, s in ours if t in gold_size]

    # >= 55% of our templates reproduce a golden template byte-for-byte
    # (measured: 30/50 = 60%)
    assert len(matched) / len(ours) >= 0.55, (
        f"only {len(matched)}/{len(ours)} templates match the golden"
    )

    # of the byte-matched templates, >= 90% carry a golden size of
    # EXACTLY accumulation_runs x our single-run size (measured: 29/30)
    exact = sum(
        1 for t, s in matched if gold_size[t] == ACCUMULATION_RUNS * s
    )
    assert exact / len(matched) >= 0.90, (
        f"only {exact}/{len(matched)} matched templates have the 10x "
        "accumulated size"
    )
