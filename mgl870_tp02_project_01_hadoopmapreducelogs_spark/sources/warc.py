"""WARC/WET source — the Common Crawl wire format (ISO 28500).

Every real 100 TB web-corpus pipeline (CCNet, C4, RefinedWeb, FineWeb)
starts from Common Crawl WET files: gzipped streams of text-extract
records, each a ``WARC/1.0`` header block, a blank line, and the
extracted page text, with ``Content-Length`` authoritative for the
content size. The reference has no web-ingest surface (its sources are
log files, process_logs_v10.py:21-36); this module is the
beyond-reference ingest rung beneath the curation operators.

Spark-first design: records are split by the text datasource's
multi-character ``lineSep`` (``"WARC/1.0"``) — a pure JVM scan, no
RDD, no Python — and header fields are parsed with codegen'd
``regexp_extract`` / ``substring_index`` expressions. Gzip is handled
transparently by the codec from the ``.gz`` extension; per-file gzip
is non-splittable, so at scale parallelism = file count — exactly the
real Common Crawl layout (~64k WET files per crawl), and the reader
keeps one task per file with zero shuffle.

Caveat (documented, guarded): lineSep splitting is context-free, so a
record whose CONTENT contains the literal ``WARC/1.0`` would be split
mid-record. Real WET text extracts essentially never contain it, and
``write_wet`` refuses such rows loudly (``F.assert_true``) rather than
corrupting the stream. ``read_wet_scanned`` is the robust escape
hatch: a Content-Length-driven byte scanner over whole files
(binaryFile source + mapInPandas) that parses ANY content, marker
included — the slow-but-correct path for hostile corpora; the two
readers are proven equivalent on guard-passing corpora in
tests/test_warc.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: record-start marker, doubling as the read-side record separator
WARC_VERSION = "WARC/1.0"

#: schema of a parsed WET record
WET_COLUMNS = ("record_id", "uri", "warc_date", "content_length", "text")


def wet_record(
    record_id: Column, uri: Column, date: Column, text: Column
) -> Column:
    """One WET conversion record as a string column.

    ``Content-Length`` counts BYTES of the content block
    (``octet_length``), as the WARC spec requires — the read side
    validates against it, so a byte-vs-char confusion on either side
    shows up as a length-mismatch audit row.
    """
    guard = F.assert_true(
        ~F.contains(text, F.lit(WARC_VERSION)),
        F.concat(
            F.lit("write_wet: content of record "),
            record_id.cast("string"),
            F.lit(" contains the record-start marker — it would split "
                  "mid-record; pre-mask it or use a Content-Length "
                  "scanner"),
        ),
    )
    return F.concat(
        # assert_true is NULL on success; concat of the empty-string
        # coalesce keeps the guard in the plan at zero cost
        F.coalesce(guard.cast("string"), F.lit("")),
        F.lit(WARC_VERSION + "\r\n"),
        F.lit("WARC-Type: conversion\r\n"),
        F.lit("WARC-Record-ID: <urn:uuid:doc-"),
        record_id.cast("string"),
        F.lit(">\r\n"),
        F.lit("WARC-Target-URI: "),
        uri,
        F.lit("\r\n"),
        F.lit("WARC-Date: "),
        date,
        F.lit("\r\n"),
        F.lit("Content-Length: "),
        F.octet_length(text).cast("string"),
        F.lit("\r\n\r\n"),
        text,
    )


def write_wet(
    records: DataFrame,
    path: str,
    record_col: str = "record",
    n_files: int = 8,
    gzip: bool = True,
) -> None:
    """Write one WET record string per row as (optionally gzipped)
    text files. The text writer appends exactly one ``\\n`` after each
    row; ``read_wet`` strips exactly one, so content round-trips even
    when it ends in a newline itself."""
    w = records.select(record_col).repartition(n_files).write.mode(
        "overwrite"
    )
    if gzip:
        w = w.option("compression", "gzip")
    w.text(path)


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Parse a WET directory into (record_id, uri, warc_date,
    content_length, text) — all codegen expressions over the
    lineSep-split records; ``.gz`` inputs decompress transparently.

    ``text`` strips the single trailing ``\\n`` the writer appended;
    ``content_length`` is the header's byte count, NOT recomputed —
    compare with ``octet_length(text)`` downstream to audit framing.
    """
    return parse_wet_records(
        spark.read.option("lineSep", WARC_VERSION).text(path)
    )


def read_wet_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 2
) -> DataFrame:
    """Streaming twin of ``read_wet``: a Structured Streaming file
    source over a WET directory — the continuous-ingest shape for
    corpora that land as crawls complete. Same lineSep record split,
    same codegen parse (``parse_wet_records`` is shared code, so the
    two readers cannot drift), one micro-batch per
    ``max_files_per_trigger`` files. Per-file gzip keeps one task per
    file and zero shuffle, exactly like the batch reader."""
    raw = (
        spark.readStream.option("lineSep", WARC_VERSION)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .text(path)
    )
    return parse_wet_records(raw)


def parse_wet_records(raw: DataFrame) -> DataFrame:
    """The shared record parse over a lineSep(``WARC/1.0``)-split
    text scan — batch and streaming readers both delegate here."""
    # the split leaves an empty fragment before each file's first
    # record; real records begin with the \r\n that followed the marker
    rec = raw.filter(F.length("value") > 0)
    headers = F.substring_index(F.col("value"), "\r\n\r\n", 1)
    # content = everything after the FIRST blank line, minus the one
    # writer-appended \n. Length arithmetic, NOT a `\n$` regex — Java's
    # `$` also matches BEFORE a final line terminator, so replaceAll of
    # `\n$` eats TWO trailing newlines from content ending in one
    content = F.when(
        F.col("c").endswith("\n"),
        F.expr("left(c, char_length(c) - 1)"),
    ).otherwise(F.col("c"))
    return (
        rec.select(F.col("value"), headers.alias("h"))
        .select(
            F.col("h"),
            F.expr("substring(value, char_length(h) + 5)").alias("c"),
        )
        .select(
            F.regexp_extract(
                "h", r"WARC-Record-ID: <urn:uuid:doc-(\d+)>", 1
            )
            .cast("long")
            .alias("record_id"),
            F.regexp_extract("h", r"WARC-Target-URI: (\S+)", 1).alias(
                "uri"
            ),
            F.regexp_extract("h", r"WARC-Date: (\S+)", 1).alias(
                "warc_date"
            ),
            F.regexp_extract("h", r"Content-Length: (\d+)", 1)
            .cast("long")
            .alias("content_length"),
            content.alias("text"),
        )
    )


def read_wet_scanned(spark: SparkSession, path: str) -> DataFrame:
    """Content-Length-driven WET scanner — the robust reader for
    corpora whose content may contain the record-start marker (which
    the context-free ``read_wet`` splitter cannot handle and
    ``write_wet`` refuses to produce).

    Reads whole files via the ``binaryFile`` source (one row per
    file — the natural unit for per-file gzip anyway) and walks each
    byte stream in Arrow-batched Python: find the next ``WARC/1.0``
    at a record boundary, parse headers up to the blank line, then
    consume exactly ``Content-Length`` BYTES of content — the spec's
    authoritative framing, immune to content lookalikes. Same output
    schema as ``read_wet``. This is the slow path by design (Python
    per file, not codegen per record); parallelism is still file
    count, zero shuffle.
    """
    import gzip as _gzip
    import re as _re

    header_re = _re.compile(rb"\r\n\r\n", _re.DOTALL)

    def parse_files(batches):
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in WET_COLUMNS}
            for blob, fname in zip(pdf["content"], pdf["path"]):
                data = bytes(blob)
                if fname.endswith(".gz"):
                    data = _gzip.decompress(data)
                pos = 0
                marker = WARC_VERSION.encode()
                while True:
                    start = data.find(marker, pos)
                    if start < 0:
                        break
                    m = header_re.search(data, start)
                    if m is None:
                        break
                    head = data[start : m.start()].decode(
                        "utf-8", errors="replace"
                    )

                    def grab(pat: str) -> str:
                        g = _re.search(pat, head)
                        return g.group(1) if g else ""

                    clen = int(grab(r"Content-Length: (\d+)") or 0)
                    content = data[m.end() : m.end() + clen]
                    rid = grab(r"WARC-Record-ID: <urn:uuid:doc-(\d+)>")
                    out["record_id"].append(int(rid) if rid else None)
                    out["uri"].append(grab(r"WARC-Target-URI: (\S+)"))
                    out["warc_date"].append(grab(r"WARC-Date: (\S+)"))
                    out["content_length"].append(clen)
                    out["text"].append(content.decode("utf-8"))
                    # skip past the content so a marker INSIDE it can
                    # never start a phantom record
                    pos = m.end() + clen
            yield pd.DataFrame(out)

    files = spark.read.format("binaryFile").load(f"{path}/*.txt*")
    return files.select("path", "content").mapInPandas(
        parse_files,
        "record_id long, uri string, warc_date string, "
        "content_length long, text string",
    )
