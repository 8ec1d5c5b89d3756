"""Structured Streaming surface (SURVEY §2.9).

The reference's Drain3 loop is already stream-shaped: lines arrive one
at a time, state snapshots every minute (process_logs_v10.py:11-13,65),
and the persisted miner accumulates across runs (drain3_state.bin,
process_logs_v10.py:39-40). Here that becomes first-class Structured
Streaming: ``readStream.text`` ingest of a growing log directory, the
same masking expressions as batch (the preprocessing layer is shared),
and template mining as a streaming aggregation whose state store plays
the role of drain3_state.bin — checkpointed, exactly-once, unbounded.

The reference destroyed timestamps so it has no event-time semantics;
we parse them, so late data is handled with a real watermark — a
capability the reference could not express (SURVEY §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import preprocess as P
from ..sources.logs import CONTAINER_GLOB


def read_log_stream(
    spark: SparkSession,
    logs_dir: str,
    glob: str = CONTAINER_GLOB,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """S1 as a stream: new ``container_*.log`` files appearing under
    ``logs_dir`` are ingested incrementally."""
    reader = (
        spark.readStream.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", glob)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.text(logs_dir)
    return raw.withColumn("file", F.input_file_name())


def parse_stream(raw: DataFrame, mask_rules=None) -> DataFrame:
    """The batch parser verbatim — preprocessing is engine-shared code
    (same Catalyst expressions compile in both modes)."""
    v = F.col("value")
    return raw.select(
        "value",
        "file",
        P.extract_timestamp(v).alias("ts"),
        P.extract_level(v).alias("level"),
        P.extract_message(v).alias("message"),
        P.mask(P.extract_message(v), mask_rules).alias("masked"),
    )


def mine_templates_stream(parsed: DataFrame) -> DataFrame:
    """T1 streaming: running (template, size) counts — a stateless
    shuffle-keyed streaming aggregation (complete/update mode). The
    state store persists sizes across triggers exactly like
    drain3_state.bin persisted cluster sizes across runs."""
    return (
        parsed.groupBy(F.col("masked").alias("template"))
        .agg(F.count(F.lit(1)).alias("size"))
    )


def windowed_event_counts(
    parsed: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling event-time windows with late-data handling — the
    watermarked form of W1 (append-mode compatible)."""
    return (
        parsed.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window).alias("w"),
            F.col("masked").alias("template"),
        )
        .agg(F.count(F.lit(1)).alias("size"))
        .select(F.col("w.start").alias("window_start"), "template", "size")
    )


def run_to_memory(stream_df: DataFrame, name: str, mode: str = "complete") -> DataFrame:
    """Drive a (bounded) stream to completion into a memory sink — the
    synchronous harness used by tests and the driver contract."""
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.table(name)


def new_template_feed_stream(parsed: DataFrame, masked_col: str = "masked") -> DataFrame:
    """T3 as a stateful stream: emit each template exactly once — the
    first time it is ever seen — with its first-batch count (the
    reference prints new templates as Drain discovers them,
    process_logs_v10.py:67-78).

    Custom stateful operator via ``applyInPandasWithState``: state is
    one running total per template key, partitioned by template hash —
    the state store scales horizontally with executors and survives
    restarts through the checkpoint, which is exactly the role
    drain3_state.bin played single-node.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def emit_first_sighting(key, pdfs, state: GroupState):
        count = 0
        for pdf in pdfs:
            count += len(pdf)
        if state.exists:
            (total,) = state.get
            state.update((total + count,))
            return iter([])
        state.update((count,))
        return iter([pd.DataFrame({"template": [key[0]], "first_size": [count]})])

    return (
        parsed.groupBy(F.col(masked_col))
        .applyInPandasWithState(
            emit_first_sighting,
            outputStructType="template string, first_size long",
            stateStructType="total long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def write_catalog_stream(
    stream_df: DataFrame, path: str, checkpoint: str, mode: str = "complete"
):
    """S5 streaming sink: checkpointed foreachBatch persistence of the
    template catalog to Parquet (the drain3_state.bin replacement).

    ``complete`` (default): every epoch carries the FULL catalog, so a
    plain overwrite is correct and idempotent by epoch — the right mode
    here because the catalog is bounded by template cardinality, not
    line count. ``update``: epochs carry only the templates whose
    counts changed, so the sink MERGES the batch into the existing
    parquet (templates absent from the batch keep their previous rows)
    instead of overwriting — an overwrite would silently drop every
    untouched template after the first trigger.
    """

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        out = batch_df
        if mode == "update":
            spark = batch_df.sparkSession
            try:
                existing = spark.read.parquet(path)
            except Exception:  # first epoch: nothing to merge
                existing = None
            if existing is not None:
                out = existing.join(
                    batch_df.select("template"), "template", "left_anti"
                ).unionByName(batch_df)
            # materialize before overwriting the path we just read
            # (bounded by catalog size, never by corpus size)
            out = spark.createDataFrame(out.collect(), out.schema)
        out.write.mode("overwrite").parquet(path)

    return (
        stream_df.writeStream.outputMode(mode)
        .option("checkpointLocation", checkpoint)
        .foreachBatch(sink)
        .start()
    )
