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

#: adaptive cutover: an edge list with at most this many pairs is
#: union-found on the driver in one pass (microseconds) instead of
#: paying O(diameter) distributed rounds of per-job scheduling — the
#: same shape as ``drain.DRIVER_FIT_CAP``. Detection is a ``count()``
#: over the once-materialized edge list (never a speculative collect),
#: so an over-cap graph pays no wasted transfer. The cap is sized for
#: PySpark Row overhead (~1-2 KB/Row on the driver heap, not the 16 B
#: payload): 100k edges ≈ low hundreds of MB worst case, comfortably
#: inside the 8 GB driver. Past the cap the distributed min-label loop
#: below takes over unchanged.
DRIVER_CC_CAP = 100_000


def _driver_union_find(pairs: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Path-compressed union-find; returns (doc_id, min-reachable-id)
    rows for every vertex in ``pairs`` — identical semantics to the
    distributed min-label propagation."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN id so the root IS the canonical keeper
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return [(v, find(v)) for v in parent]


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
    silent partial answer would corrupt the dedup decision). Edge lists
    under ``DRIVER_CC_CAP`` skip the loop entirely and union-find on
    the driver.
    """
    # materialize the (pair-count-bounded) distinct edge list ONCE:
    # the size probe, the driver fast path, and every distributed
    # iteration all read these blocks — the upstream pair-generation
    # pipeline executes exactly once either way
    dedup_edges = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .distinct()
        .localCheckpoint()
    )
    if dedup_edges.count() <= DRIVER_CC_CAP:
        rows = _driver_union_find(
            sorted((r.a, r.b) for r in dedup_edges.collect())
        )
        return edges.sparkSession.createDataFrame(
            rows, "doc_id long, component long"
        )
    sym = (
        dedup_edges
        .unionByName(dedup_edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
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
