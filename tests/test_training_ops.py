"""Invariant tests for the training-pipeline ops added in round 2:
vocabulary induction, stratified hash sampling, sequence packing,
length quantiles, and streaming exact dedup. (Value parity vs DuckDB
is covered by the oracle gate; these pin the semantic invariants the
oracle can't express.)"""

from pyspark.sql import functions as F

from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def test_vocab_topk_ordering_and_df_bound(spark):
    rows = REGISTRY["text_vocab_topk"].run(spark, SF_DIR).collect()
    assert len(rows) <= 100
    # descending by cnt, ties broken lexically; doc_freq never exceeds cnt
    for a, b in zip(rows, rows[1:]):
        assert a.cnt > b.cnt or (a.cnt == b.cnt and a.token <= b.token)
    assert all(r.doc_freq <= r.cnt for r in rows)


def test_stratified_sample_is_deterministic_and_downsamples_en(spark):
    q = REGISTRY["text_sample_stratified"].run
    once = {r.doc_id for r in q(spark, SF_DIR).collect()}
    again = {r.doc_id for r in q(spark, SF_DIR).collect()}
    assert once == again  # seedless: identical across runs
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_en = docs.filter(F.col("lang") == "en").count()
    kept_en = q(spark, SF_DIR).filter(F.col("lang") == "en").count()
    n_other = docs.filter(F.col("lang") != "en").count()
    kept_other = q(spark, SF_DIR).filter(F.col("lang") != "en").count()
    assert kept_other == n_other  # non-en kept whole
    assert kept_en < n_en  # en strictly downsampled (~25%)


def test_pack_sequences_contiguous_per_lang(spark):
    out = REGISTRY["text_pack_sequences"].run(spark, SF_DIR)
    rows = sorted(out.collect(), key=lambda r: (r.lang, r.doc_id))
    # pack ids start at 0 per language, never decrease in doc_id order,
    # and step by at most ceil(n_tokens/2048)+1 (a doc can span windows)
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        assert rs[0].pack_id == 0
        off = 0
        for r in rs:
            assert r.pack_id == off // 2048
            off += r.n_tokens


def test_length_quantiles_monotone(spark):
    rows = REGISTRY["text_length_quantiles"].run(spark, SF_DIR).collect()
    assert rows  # one row per language present
    for r in rows:
        assert r.p25 <= r.p50 <= r.p75 <= r.p95
        assert r.n_docs > 0


def test_streaming_dedup_matches_batch_distinct(spark):
    out = REGISTRY["streaming_dedup_exact"].run(spark, SF_DIR)
    got = {(r.user_id, r.event_type) for r in out.collect()}
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    want = {
        (r.user_id, r.event_type)
        for r in ev.select("user_id", "event_type").distinct().collect()
    }
    assert got == want
