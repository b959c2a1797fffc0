"""Distributed connected components over near-duplicate pair graphs.

The dedup family (minhash-LSH, SimHash, embedding near-dup) emits PAIRS;
a production pipeline needs CLUSTERS: transitively-closed groups with one
canonical representative kept per group (the reference's use case is the
same sketch-then-resolve shape its mergeable digests enable —
/root/reference/tdigest.go:262-272 merge associativity is what lets
partial results combine in any order; here the analogous property is
min-label idempotence).

Algorithm: iterative min-label propagation on the undirected edge list —
``comp(v) <- min(comp(v), min over neighbors comp(u))`` until a fixpoint.
Each round is ONE shuffle (join edges->labels on the destination node,
then a map-side-combinable min aggregate); rounds needed = graph
diameter.  Near-dup graphs are dense star/clique unions (every member of
a duplicate cluster tends to pair with most others), so the diameter is
small — typically 2-4 — and the round count stays O(1) even at corpus
scale.  For adversarial long-chain graphs the round bound is
``max_iters`` and the operator fails loudly rather than returning a
partially-converged (wrong) labeling.

Scale design notes (100 TB shape):
- the edge list is persisted once and reused every round (no rescan of
  the upstream pair pipeline);
- per-round lineage is truncated with an eager ``localCheckpoint`` —
  without it the iterative join stacks plans geometrically and Catalyst
  analysis itself becomes the bottleneck by round ~10 (on a real cluster
  pass ``reliable=True`` + ``spark.sparkContext.setCheckpointDir`` to
  survive executor loss; localCheckpoint trades that durability for
  speed, the right default in local mode);
- the convergence check rides the same materialization as the
  checkpoint: the round's ``changed`` flag is computed in the checkpointed
  projection, so the extra action is a cheap scan of cached partitions,
  not a recompute;
- labels shuffle on the node id every round — hash-partitioned both
  sides, no skew amplification beyond the graph's own degree skew (hot
  nodes were already capped upstream by ``cap_lsh_buckets``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "connected_components",
    "connected_components_sql",
    "dedup_clusters",
    "dedup_clusters_sql",
]


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iters: int = 25,
    reliable: bool = False,
) -> DataFrame:
    """Label every node of the undirected pair graph with the minimum
    node id reachable from it: ``(node, comp)``.

    ``comp`` is the cluster id — deterministic (the lexicographic /
    numeric minimum of the component, independent of partitioning and
    merge order, the same order-insensitivity contract the reference
    pins for digest merges in tdigest_test.go TestMerge).

    Raises ``RuntimeError`` if the labeling has not converged within
    ``max_iters`` improvement rounds (graph diameter > max_iters) — a
    partially-propagated labeling silently splits clusters, which for
    dedup means keeping duplicates, so non-convergence is loud.  (The
    loop runs max_iters + 1 times: a graph needing exactly max_iters
    improvement rounds still gets its confirming quiet round.)
    """
    edges_fwd = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    edges = (
        edges_fwd.union(
            edges_fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("comp"))
    )

    def _snapshot(df: DataFrame) -> DataFrame:
        if reliable:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    labels = _snapshot(labels)
    for _ in range(max_iters + 1):
        nbr = (
            edges.join(
                labels.select(
                    F.col("node").alias("_bn"), F.col("comp").alias("_bc")
                ),
                F.col("b") == F.col("_bn"),
            )
            .groupBy("a")
            .agg(F.min("_bc").alias("nbr_comp"))
        )
        stepped = labels.join(
            nbr, labels["node"] == nbr["a"], "left"
        ).select(
            "node",
            F.least(
                F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
            ).alias("comp"),
            (F.coalesce(F.col("nbr_comp"), F.col("comp")) < F.col("comp")).alias(
                "_changed"
            ),
        )
        stepped = _snapshot(stepped)
        changed = stepped.where(F.col("_changed")).limit(1).count()
        labels = stepped.select("node", "comp")
        if changed == 0:
            edges.unpersist()
            return labels
    edges.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} "
        "improvement rounds (graph diameter exceeds max_iters); "
        "raise max_iters"
    )


def connected_components_sql(
    pairs_sql: str, src: str = "doc_a", dst: str = "doc_b"
) -> str:
    """DuckDB twin: transitive closure via a recursive CTE (UNION keeps
    it finite), then ``min(reachable)`` per node.  A semantically
    independent evaluation strategy — closure enumeration vs iterative
    relabeling — so a hash match is real evidence, not the same code
    twice."""
    return f"""
        WITH RECURSIVE pairs AS ({pairs_sql}),
        edges AS (
            SELECT {src} AS a, {dst} AS b FROM pairs
            WHERE {src} IS NOT NULL AND {dst} IS NOT NULL
            UNION
            SELECT {dst}, {src} FROM pairs
            WHERE {src} IS NOT NULL AND {dst} IS NOT NULL
        ),
        reach(node, r) AS (
            SELECT a, a FROM edges
            UNION
            SELECT e.a, reach.r FROM edges e JOIN reach ON reach.node = e.b
        )
        SELECT node, min(r) AS comp FROM reach GROUP BY node
    """


def dedup_clusters(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iters: int = 25,
    reliable: bool = False,
) -> DataFrame:
    """Cluster view of a near-dup pair graph:
    ``(doc_id, cluster_id, n_cluster, is_canonical)``.

    ``cluster_id`` is the minimum member id, ``n_cluster`` the component
    size, ``is_canonical`` marks the one row per cluster a keep-list
    retains (``doc_id == cluster_id``).  Docs that appear in no pair are
    singleton clusters by definition and are NOT emitted — the caller
    anti-joins the keep-list against the corpus (same contract as
    ``dedup_exact_keep_first``)."""
    cc = connected_components(pairs, src, dst, max_iters, reliable)
    sizes = cc.groupBy("comp").agg(F.count("*").alias("n_cluster"))
    return cc.join(sizes, "comp").select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        "n_cluster",
        (F.col("node") == F.col("comp")).alias("is_canonical"),
    )


def dedup_clusters_sql(
    pairs_sql: str, src: str = "doc_a", dst: str = "doc_b"
) -> str:
    cc = connected_components_sql(pairs_sql, src, dst)
    return f"""
        WITH cc AS ({cc}),
        sizes AS (SELECT comp, count(*) AS n_cluster FROM cc GROUP BY comp)
        SELECT cc.node AS doc_id, cc.comp AS cluster_id, sizes.n_cluster,
               cc.node = cc.comp AS is_canonical
        FROM cc JOIN sizes ON cc.comp = sizes.comp
    """
