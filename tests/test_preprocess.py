from pyspark.sql import functions as F

from mgl870_tp02_project_01_hadoopmapreducelogs_spark.functions import preprocess as P

LINE = (
    "2015-10-18 18:01:47,655 INFO [main] "
    "org.apache.hadoop.mapreduce.v2.app.MRAppMaster: "
    "Created MRAppMaster for application appattempt_1445062781478_0011_000001"
)
CONTINUATION = "java.io.IOException: Bad response ERROR for block"


def _one(spark, col):
    return spark.createDataFrame([(LINE,), (CONTINUATION,)], ["value"]).select(
        col.alias("out")
    ).collect()


def test_strip_chain_matches_reference_semantics(spark):
    # reference preprocess_log_line (process_logs_v10.py:48-57): ts, level,
    # [thread] removed, whitespace collapsed
    rows = _one(spark, P.preprocess(F.col("value")))
    assert rows[0].out == (
        "org.apache.hadoop.mapreduce.v2.app.MRAppMaster: Created MRAppMaster "
        "for application appattempt_1445062781478_0011_000001"
    )
    # continuation line: strip_level removes the embedded ERROR token
    assert "ERROR" not in rows[1].out


def test_extract_keeps_what_reference_destroys(spark):
    df = spark.createDataFrame([(LINE,), (CONTINUATION,)], ["value"]).select(
        P.extract_timestamp(F.col("value")).alias("ts"),
        P.extract_level(F.col("value")).alias("level"),
        P.extract_thread(F.col("value")).alias("thread"),
        P.extract_logger(F.col("value")).alias("logger"),
        P.extract_message(F.col("value")).alias("message"),
    )
    r0, r1 = df.collect()
    assert r0.ts is not None and r0.ts.year == 2015
    assert r0.level == "INFO"
    assert r0.thread == "main"
    assert r0.logger == "org.apache.hadoop.mapreduce.v2.app.MRAppMaster"
    assert r0.message.startswith("Created MRAppMaster")
    # continuation line has no timestamp/thread
    assert r1.ts is None
    assert r1.thread is None


def test_masking_replaces_dynamic_tokens(spark):
    df = spark.createDataFrame([(LINE,)], ["value"]).select(
        P.mask(P.extract_message(F.col("value"))).alias("masked")
    )
    masked = df.collect()[0].masked
    assert masked == "Created MRAppMaster for application <*>"


def test_event_label_roundtrip(spark):
    df = spark.createDataFrame([(1020,)], ["event_id"]).select(
        P.event_label(F.col("event_id")).alias("lab")
    ).select(
        "lab", P.event_id_from_label(F.col("lab")).alias("back")
    )
    row = df.collect()[0]
    assert row.lab == "Event_1020"
    assert row.back == 1020
