"""WARC/WET source invariants (sources/warc.py): record grammar
round-trips byte-exactly through the gzipped text writer and the
lineSep-split reader; Content-Length is authoritative BYTES; the
context-free-split guard fires loudly. (Value parity of the registered
roundtrip entry vs DuckDB is covered by the oracle gate.)"""

import pytest
from pyspark.sql import functions as F

from mgl870_tp02_project_01_hadoopmapreducelogs_spark.sources import warc


def _roundtrip(spark, rows, tmp_path, gzip=True):
    docs = spark.createDataFrame(rows, "doc_id long, uri string, text string")
    recs = docs.select(
        warc.wet_record(
            F.col("doc_id"), F.col("uri"), F.lit("2024-01-01T00:00:00Z"),
            F.col("text"),
        ).alias("record")
    )
    warc.write_wet(recs, str(tmp_path / "wet"), n_files=2, gzip=gzip)
    return warc.read_wet(spark, str(tmp_path / "wet"))


def test_wet_roundtrip_edge_contents(spark, tmp_path):
    """Texts that stress the framing contract: empty, trailing
    newline(s), internal blank lines (\\r\\n\\r\\n inside content),
    multi-byte UTF-8 (byte Content-Length != char length) — all must
    come back byte-identical with a consistent Content-Length."""
    rows = [
        (1, "http://a", "plain text"),
        (2, "http://b", ""),                          # empty content
        (3, "http://c", "ends with newline\n"),       # writer adds ONE more
        (4, "http://d", "two\n\ntrailing\n\n"),       # \n\n tail survives
        (5, "http://e", "internal\r\n\r\nblank line"),  # header-lookalike
        (6, "http://f", "café ☃ multibyte"),  # bytes > chars
    ]
    back = _roundtrip(spark, rows, tmp_path)
    got = {r.record_id: r for r in back.collect()}
    assert set(got) == {r[0] for r in rows}
    for doc_id, uri, text in rows:
        r = got[doc_id]
        assert r.text == text, (doc_id, repr(r.text))
        assert r.uri == uri
        assert r.content_length == len(text.encode("utf-8"))
        assert r.warc_date == "2024-01-01T00:00:00Z"


def test_wet_plain_text_and_gzip_read_identically(spark, tmp_path):
    rows = [(i, f"http://u/{i}", f"doc {i} body\nsecond line") for i in range(20)]
    gz = _roundtrip(spark, rows, tmp_path / "gz", gzip=True)
    plain = _roundtrip(spark, rows, tmp_path / "plain", gzip=False)
    assert sorted(map(tuple, gz.collect())) == sorted(map(tuple, plain.collect()))
    assert gz.count() == 20


def test_wet_writer_guard_refuses_marker_in_content(spark, tmp_path):
    """A content body containing the record-start marker would split
    mid-record under the context-free lineSep reader — the writer must
    refuse it loudly (per-row assert), never corrupt the stream."""
    rows = [(1, "http://a", "evil body mentions WARC/1.0 inline")]
    with pytest.raises(Exception, match="record-start marker"):
        _roundtrip(spark, rows, tmp_path)


def test_wet_reader_plan_stays_jvm_side(spark, tmp_path):
    """The reader must be scan + codegen projections: no Python
    boundary, no shuffle — at Common Crawl scale parallelism is file
    count and the read has no network phase."""
    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.plans import (
        plan_report,
    )

    rows = [(i, f"http://u/{i}", "body") for i in range(5)]
    back = _roundtrip(spark, rows, tmp_path)
    rep = plan_report(back)
    assert not rep["has_python_udf"]
    assert rep["n_exchanges"] == 0


def test_wet_scanner_matches_linesep_reader(spark, tmp_path):
    """The Content-Length scanner and the lineSep splitter must parse
    a guard-passing corpus identically — same records, same framing."""
    rows = [
        (1, "http://a", "plain"),
        (2, "http://b", ""),
        (3, "http://c", "multi\nline\n\nwith blanks\n"),
        (4, "http://d", "café ☃"),
    ]
    fast = _roundtrip(spark, rows, tmp_path)
    scanned = warc.read_wet_scanned(spark, str(tmp_path / "wet"))
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, scanned.collect())
    )


def test_wet_scanner_handles_marker_in_content(spark, tmp_path):
    """The robustness case the fast reader cannot express: content
    containing the record-start marker parses correctly under the
    Content-Length scanner because the spec's byte count — not a
    context-free split — frames each record. (Record built by hand;
    write_wet's guard rightly refuses to produce such a stream.)"""
    body = "this body quotes WARC/1.0 and\nWARC/1.0 again"
    rec = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        "WARC-Record-ID: <urn:uuid:doc-7>\r\n"
        "WARC-Target-URI: http://hostile\r\n"
        "WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"Content-Length: {len(body.encode())}\r\n\r\n"
        f"{body}"
    )
    tail = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        "WARC-Record-ID: <urn:uuid:doc-8>\r\n"
        "WARC-Target-URI: http://after\r\n"
        "WARC-Date: 2024-01-01T00:00:00Z\r\n"
        "Content-Length: 2\r\n\r\n"
        "ok"
    )
    d = tmp_path / "wet"
    d.mkdir()
    (d / "part-0.txt").write_text(rec + "\n" + tail + "\n")
    got = {
        r.record_id: r
        for r in warc.read_wet_scanned(spark, str(d)).collect()
    }
    assert set(got) == {7, 8}
    assert got[7].text == body
    assert got[8].text == "ok" and got[8].uri == "http://after"


def test_wet_roundtrip_fuzz_corpus(spark, tmp_path):
    """Seeded fuzz: 200 adversarial-ish texts (mixed unicode planes,
    CR/LF runs, header-lookalike lines, long newline tails) must
    round-trip byte-exactly through BOTH readers. Deterministic
    generator — failures reproduce."""
    import random

    rng = random.Random(20261016)
    alphabet = [
        "a", "b", " ", "\n", "\r\n", "\t", "é", "☃", "字",
        "Content-Length: 99", "WARC-Target-URI: http://fake",
        "\n\n", ":", "<", ">",
    ]
    rows = []
    for i in range(200):
        n = rng.randrange(0, 40)
        text = "".join(rng.choice(alphabet) for _ in range(n))
        rows.append((i, f"http://fuzz/{i}", text))
    fast = {r.record_id: r for r in _roundtrip(spark, rows, tmp_path).collect()}
    scanned = {
        r.record_id: r
        for r in warc.read_wet_scanned(spark, str(tmp_path / "wet")).collect()
    }
    assert set(fast) == set(scanned) == {r[0] for r in rows}
    for doc_id, _, text in rows:
        assert fast[doc_id].text == text, (doc_id, repr(text))
        assert scanned[doc_id].text == text, (doc_id, repr(text))
        assert fast[doc_id].content_length == len(text.encode("utf-8"))


def test_wet_stream_read_equals_batch_read(spark, tmp_path):
    """The streaming reader lands exactly the batch reader's record
    set (shared parse, exactly-once file source), and actually runs
    as MULTIPLE micro-batches (maxFilesPerTrigger=1 over a 2-file
    corpus) — a dropped or doubled batch breaks the set equality."""
    rows = [
        (i, f"http://u/{i}", f"doc {i} body\nwith ☃ and a tail\n")
        for i in range(30)
    ]
    batch = _roundtrip(spark, rows, tmp_path)
    stream = warc.read_wet_stream(
        spark, str(tmp_path / "wet"), max_files_per_trigger=1
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_wet_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        n_batches = q.lastProgress["batchId"] + 1
    finally:
        q.stop()
    landed = spark.table("t_wet_stream")
    assert n_batches >= 2, "one file per trigger over 2 files"
    assert sorted(map(tuple, landed.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_wet_curation_funnel_monotone(spark):
    """Per-host funnel law: ingested >= quality >= url-unique >=
    final (a host can lose docs to another host's exact-dup keeper
    but never gain), totals conserve the corpus at ingest, and at
    least one stage strictly filters somewhere (non-vacuous)."""
    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries import (
        REGISTRY,
    )

    sf = "/root/testdata/sf0.001"
    rows = REGISTRY["pipeline_wet_curation"].run(spark, sf).collect()
    n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
    assert sum(r.n_ingested for r in rows) == n_docs
    for r in rows:
        assert r.n_ingested >= r.n_quality >= r.n_url_unique >= r.n_final
        assert r.n_final >= 0
    assert sum(r.n_url_unique for r in rows) < sum(r.n_quality for r in rows) or \
        sum(r.n_quality for r in rows) < n_docs
