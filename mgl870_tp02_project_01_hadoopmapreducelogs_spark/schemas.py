"""Declared schemas for the engine's stable tables.

The reference infers every schema dynamically (pandas), and even lets the
column set depend on run history (``Event_<id>`` columns from observed
cluster ids, ``process_logs.py:83``). Here the stable tables have fixed,
declared schemas (FIXTURES.md §1-§5); the dynamic wide one-hot matrix is a
*derived view* (pivot at the edge), never a stored schema.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Raw log lines as read (FIXTURES.md §1). ``file``/``line_no`` replace the
#: reference's implicit pandas RangeIndex identity (process_logs.py:80-82).
RAW_LOGS = T.StructType(
    [
        T.StructField("value", T.StringType(), True),
        T.StructField("file", T.StringType(), True),
        T.StructField("line_no", T.LongType(), True),
    ]
)

#: Structured lines (FIXTURES.md §2). The reference destroys ts/level/thread
#: (process_logs_v10.py:48-57); we extract them instead and keep the raw line.
PARSED_LOGS = T.StructType(
    [
        T.StructField("value", T.StringType(), True),
        T.StructField("file", T.StringType(), True),
        T.StructField("line_no", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("level", T.StringType(), True),
        T.StructField("thread", T.StringType(), True),
        T.StructField("logger", T.StringType(), True),
        T.StructField("message", T.StringType(), True),
        T.StructField("masked", T.StringType(), True),
    ]
)

#: Event catalog / summary event matrix (FIXTURES.md §3) — the reference's
#: ``event_matrix.csv`` with header ``Cluster ID,Size,Template``
#: (event_matrix_exec202411230733PM.csv:1; built at process_logs_v10.py:126-162).
TEMPLATES = T.StructType(
    [
        T.StructField("cluster_id", T.LongType(), False),
        T.StructField("size", T.LongType(), False),
        T.StructField("template", T.StringType(), False),
    ]
)

#: Long/sparse form of the line×event one-hot matrix (FIXTURES.md §4;
#: wide form built row-at-a-time at process_logs.py:68-83). Long form is
#: the scalable primary representation; pivot only at the export edge.
EVENT_OCCURRENCES = T.StructType(
    [
        T.StructField("file", T.StringType(), True),
        T.StructField("line_no", T.LongType(), True),
        T.StructField("cluster_id", T.LongType(), True),
        T.StructField("cnt", T.DoubleType(), False),
    ]
)
