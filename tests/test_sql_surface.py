from mgl870_tp02_project_01_hadoopmapreducelogs_spark.sources import tables


def test_log_views_queryable_in_sql(spark, log_dir):
    tables.register_log_views(spark, log_dir)
    top = spark.sql(
        """
        SELECT t.template, t.size, count(o.line_no) AS n_lines
        FROM templates t
        JOIN event_occurrences o ON o.cluster_id = t.cluster_id
        GROUP BY t.template, t.size
        ORDER BY t.size DESC LIMIT 3
        """
    ).collect()
    assert len(top) == 3
    for r in top:
        assert r.size == r.n_lines  # catalog sizes consistent via SQL joins

    levels = spark.sql(
        "SELECT level, count(*) AS n FROM parsed_logs "
        "WHERE level IS NOT NULL GROUP BY level"
    ).collect()
    assert {r.level for r in levels} <= {"INFO", "WARN", "ERROR", "DEBUG", "TRACE", "FATAL"}


def test_testdata_views(spark):
    tables.register_testdata_views(spark, "/root/testdata/sf0.001")
    row = spark.sql(
        "SELECT count(*) AS n, min(ts) IS NOT NULL AS has_ts FROM events"
    ).collect()[0]
    assert row.n > 0 and row.has_ts
