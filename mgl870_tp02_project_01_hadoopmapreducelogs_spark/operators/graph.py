"""Iterative graph operators — the algorithm class the rest of the
engine's declarative surface can't express in one plan.

The concrete need: near-duplicate detection emits PAIRS
(dedup_ngram_jaccard / minhash / simhash / embedding_cosine), but a
dedup decision needs GROUPS — transitively connected components with
one keeper per component (A~B, B~C ⇒ {A,B,C} keep min id). That is
union-find / connected components, here as distributed min-label
propagation:

    label(v) ← min(label(v), min over neighbors u of label(u))

iterated to fixpoint. Each round is one join + aggregate (shuffles on
the edge key); convergence takes O(diameter) rounds — near-dup
clusters are shallow (dozens of hops at worst), and doubling tricks
are unnecessary at that depth. Lineage is truncated per round with
``localCheckpoint`` so the loop doesn't build an unbounded plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components of the undirected pair graph.

    Returns ``(doc_id, component)`` for every vertex that appears in
    an edge, where ``component`` is the minimum doc_id transitively
    reachable (the canonical keeper id). Deterministic; iterates until
    no label changes or ``max_iter`` (raises if not converged — a
    silent partial answer would corrupt the dedup decision).
    """
    # materialize the (small, pair-count-bounded) edge list ONCE: it is
    # re-joined every iteration, and without truncation each round would
    # re-execute the full upstream pair-generation pipeline
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    # fold the first propagation round into label init: every vertex
    # appears as `a` in the symmetric edge list, so one aggregate gives
    # label(v) = min(v, min over neighbors) — the state after round 1.
    # Lazy checkpoint: the convergence-sum action below both
    # materializes the truncated lineage AND computes the sum — one job
    # per round where an eager checkpoint + separate collect paid two.
    labels = (
        sym.groupBy(F.col("a").alias("doc_id"))
        .agg(F.least(F.col("a"), F.min("b")).alias("component"))
        .localCheckpoint(eager=False)
    )

    # convergence without a per-round join against the old labels:
    # labels are per-vertex non-increasing under min-propagation, so
    # the graph is at fixpoint iff the global label sum stops moving.
    # Exact decimal(38) sum — no int64 overflow at any vertex count —
    # and partializable, where the old-vs-new equi-join it replaces
    # shuffled the full vertex set every round.
    def label_sum(df: DataFrame):
        return df.agg(
            F.sum(F.col("component").cast("decimal(38,0)"))
        ).collect()[0][0]

    prev = label_sum(labels)
    for _ in range(max_iter - 1):
        neighbor = (
            sym.join(labels, sym.b == labels.doc_id)
            .select(F.col("a").alias("doc_id"), "component")
        )
        labels = (
            labels.unionByName(neighbor)
            .groupBy("doc_id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=False)
        )
        cur = label_sum(labels)
        if cur == prev:
            return labels
        prev = cur
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def dedup_groups(edges: DataFrame, src: str = "doc_a", dst: str = "doc_b") -> DataFrame:
    """Collapse near-dup pairs into groups: one row per component with
    the keeper (min doc_id) and group size."""
    comp = connected_components(edges, src, dst)
    return comp.groupBy("component").agg(
        F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("n_docs")
    )
