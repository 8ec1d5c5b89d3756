from pyspark.sql import functions as F

from mgl870_tp02_project_01_hadoopmapreducelogs_spark.operators import drain
from mgl870_tp02_project_01_hadoopmapreducelogs_spark.sources import logs


def test_miner_merges_similar_lines():
    m = drain.DrainMiner(depth=4, sim_th=0.4)
    m.add("send block blk_1 to node alpha")
    m.add("send block blk_2 to node beta")
    m.add("receive ack from node alpha")
    templates = dict(m.templates())
    # the two send lines merge into one generalized template
    assert "send block <*> to node <*>" in templates
    assert templates["send block <*> to node <*>"] == 2
    assert len(templates) == 2


def test_miner_respects_similarity_threshold():
    m = drain.DrainMiner(depth=4, sim_th=0.8)
    m.add("send block blk_1 to node alpha")
    m.add("wipe cache tmp_9 at node alpha")  # same length, <80% similar
    assert len(m.templates()) == 2


def test_match_does_not_mutate_state():
    m = drain.DrainMiner()
    m.add("job started with id 5")
    before = m.templates()
    assert m.match("job started with id 9") == 0
    assert m.match("completely different structure with many extra tokens") is None
    assert m.templates() == before


def test_distributed_fit_and_match_invariants(spark, log_dir):
    parsed = logs.parse_lines(logs.read_log_dir(spark, log_dir)).cache()
    catalog = drain.fit_distributed(parsed, depth=4, sim_th=0.4)
    rows = catalog.collect()
    n_lines = parsed.count()
    # Σ size = line count survives the partition fit + driver merge
    assert sum(r.size for r in rows) == n_lines
    # ids dense 1..k
    assert sorted(r.cluster_id for r in rows) == list(range(1, len(rows) + 1))
    # drain generalizes at least as aggressively as exact dedup
    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.operators import mining

    assert len(rows) <= mining.mine_exact(parsed).count()

    matched = drain.match_distributed(parsed, catalog)
    assert matched.filter(F.col("cluster_id").isNull()).count() == 0
    assert matched.count() == n_lines
