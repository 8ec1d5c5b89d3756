"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke query at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 plus the
beyond-reference LLM-data-pipeline operators, as (spark, sf_dir) →
DataFrame callables.
``oracle_sql()`` — the equivalent DuckDB SQL per query (omitted only
for genuinely non-SQL-expressible ops: ML models, engine-specific
hashing, filesystem scans).

Implementations live in ``mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries``;
this module is a thin registry view.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's core deliverable — the template catalog
    (event matrix summary, process_logs_v10.py:126-162) mined from log
    lines synthesized over /root/testdata/sf0.001."""
    return REGISTRY["t1a_mine_templates"].run(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.run for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
