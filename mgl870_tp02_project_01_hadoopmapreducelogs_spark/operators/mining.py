"""T1-T4 — log template mining, the reference's defining operator.

The reference mines templates with Drain3's *online* clustering
(``template_miner.add_log_message``, process_logs_v10.py:59-81; knobs
depth=4, sim=0.4, max_clusters=10000 at process_logs_v10.py:8-17):
one line at a time, mutating a prefix tree whose result depends on input
order. That design cannot be distributed faithfully — Spark partitions
are unordered — so this engine makes the *order-independent* variants
canonical (SURVEY.md §2.4 T1(a)/(b)):

- ``mine_exact``   (T1a): the masked message IS the template. Pure
  ``groupBy(masked).count()`` — deterministic under any partitioning,
  map-side partial aggregation, one shuffle keyed by template.
- ``mine_drainish`` (T1b): Drain-style generalization, re-derived as a
  closed-form aggregation: cluster key = (token_count, first_token) —
  exactly Drain's first two prefix-tree levels — then per token
  position, a position is a parameter iff >1 distinct token appears in
  the cluster (Drain's wildcard rule), giving templates with ``<*>``
  slots. Unlike Drain there is no similarity-threshold split, so it can
  merge clusters Drain would keep apart; it is a deterministic
  *fixed-depth* Drain with threshold 0 — and being pure DataFrame ops
  it scales to any corpus.

Cluster ids are dense 1-based ints like the reference's
(event_matrix_exec202411230733PM.csv), assigned by ranking the (small,
bounded by max-distinct-templates) template catalog — never by ranking
lines. ``template_hash`` (sha2 of the template) is the scale-path
stable id: identical across runs/clusters without any global ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MASK_TOKEN = "<*>"


def _rank_templates(templates: DataFrame) -> DataFrame:
    """Assign dense 1-based cluster ids ordered by template text.

    The window is a single-partition sort, but over the *catalog* (≤
    ~10⁶ rows even at 100 TB corpus scale — bounded by template
    cardinality, not line count), never over the lines.

    WindowExec's "no partition defined" WARN fires for this window by
    design; it cannot be silenced by declaring a constant partition key
    (Spark's EliminateWindowPartitions optimizer rule strips foldable
    partition expressions back to an empty spec). Harness sessions
    (check_oracle, bench, dump_plans) scope the logger down instead —
    see ``session.quiet_bounded_window_warns`` — so the warning stays a
    meaningful scale flag for *unbounded* sorts elsewhere.
    """
    w = Window.orderBy("template")
    return templates.withColumn("cluster_id", F.row_number().over(w).cast("long"))


def mine_exact(parsed: DataFrame, masked_col: str = "masked") -> DataFrame:
    """T1(a) — exact masked-message dedup mining (canonical).

    Returns the template catalog ``(cluster_id, size, template,
    template_hash)``. Equivalent oracle SQL: ``SELECT masked AS
    template, count(*) AS size FROM parsed GROUP BY masked``.
    """
    templates = (
        parsed.groupBy(F.col(masked_col).alias("template"))
        .agg(F.count(F.lit(1)).alias("size"))
    )
    return _rank_templates(templates).select(
        "cluster_id",
        "size",
        "template",
        F.sha2(F.col("template"), 256).alias("template_hash"),
    )


def drainish_mapping(parsed: DataFrame, masked_col: str = "masked") -> DataFrame:
    """T1(b) — Drain-style generalization; returns the mapping table
    ``(masked, cluster_id, template, size)`` used both as catalog and as
    the match-side dictionary.

    Shape of the computation (all built-ins, no Python per row):

    1. reduce the corpus to distinct masked messages + counts (the only
       line-scale shuffle, with map-side combine);
    2. cluster key = (token_count, first_token) — Drain's fixed prefix;
    3. posexplode tokens; a position generalizes to ``<*>`` iff the
       cluster contains >1 distinct token at that position;
    4. reassemble templates with an order-preserving array aggregation.
    """
    # cached: referenced twice (consensus branch + mapping join), and
    # bounded by DISTINCT-template cardinality, not corpus size — without
    # the cache each branch re-executes the line-scale masked groupBy
    msk = (
        parsed.groupBy(F.col(masked_col).alias("masked"))
        .agg(F.count(F.lit(1)).alias("size"))
        .withColumn("toks", F.split(F.col("masked"), " "))
        .withColumn("n_toks", F.size("toks"))
        .withColumn("head", F.col("toks").getItem(0))
        .cache()
    )
    toks = msk.select(
        "masked", "size", "n_toks", "head", F.posexplode("toks").alias("pos", "tok")
    )
    # per (cluster key, position): the consensus token or <*>
    pos_tok = (
        toks.groupBy("n_toks", "head", "pos")
        .agg(F.count_distinct("tok").alias("n_distinct"), F.min("tok").alias("tok"))
        .withColumn(
            "out_tok",
            F.when(F.col("n_distinct") == 1, F.col("tok")).otherwise(F.lit(MASK_TOKEN)),
        )
    )
    templates = (
        pos_tok.groupBy("n_toks", "head")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "out_tok"))),
                    lambda s: s.getField("out_tok"),
                ),
            ).alias("template")
        )
    )
    ranked = _rank_templates(templates)
    return (
        msk.join(ranked, ["n_toks", "head"], "inner")
        .select("masked", "cluster_id", "template", "size")
    )


def mine_drainish(parsed: DataFrame, masked_col: str = "masked") -> DataFrame:
    """T1(b) catalog: ``(cluster_id, size, template, template_hash)``."""
    mapping = drainish_mapping(parsed, masked_col)
    return (
        mapping.groupBy("cluster_id", "template")
        .agg(F.sum("size").alias("size"))
        .select(
            "cluster_id",
            "size",
            "template",
            F.sha2(F.col("template"), 256).alias("template_hash"),
        )
    )


def match_lines(
    parsed: DataFrame, catalog: DataFrame, masked_col: str = "masked"
) -> DataFrame:
    """T2 — inference: map already-mined lines to cluster ids with NO
    state update (reference ``template_miner.match``, process_logs.py:71,
    events_matrix.py:8-10).

    ``catalog`` is either the exact catalog (join masked == template) or
    the drainish mapping table (join on masked). The catalog side is
    small → Catalyst picks a broadcast hash join; unmatched lines get
    NULL cluster_id (the reference returns None, process_logs.py:72).
    """
    cols = catalog.columns
    key = "masked" if "masked" in cols else "template"
    cat = F.broadcast(
        catalog.select(F.col(key).alias("__key"), "cluster_id").dropDuplicates(["__key"])
    )
    return (
        parsed.join(cat, parsed[masked_col] == cat["__key"], "left")
        .drop("__key")
    )


def new_templates(old_catalog: DataFrame, new_catalog: DataFrame) -> DataFrame:
    """T3 — change feed: templates present in ``new_catalog`` but not in
    the previous run's catalog (reference prints them as they appear,
    process_logs_v10.py:67-78). Hash anti-join, broadcastable.
    """
    return new_catalog.join(
        old_catalog.select("template"), on="template", how="left_anti"
    )


def cluster_census(catalog: DataFrame) -> int:
    """T4 — running count of clusters (process_logs_v10.py:81)."""
    return catalog.count()
