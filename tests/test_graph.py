"""Connected components / dedup clustering (operators/graph.py).

The contract mirrors the reference's merge-order insensitivity
(tdigest_test.go TestMerge — results independent of combination order):
component labels must be a pure function of the edge SET, independent of
partitioning, edge direction, and edge order.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_tdigest_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    out = connected_components(df, **kw)
    return {(r["node"], r["comp"]) for r in out.collect()}


def test_chain_converges_to_min(spark):
    # a 6-node path: diameter 5, worst case for label propagation
    edges = [(f"d{i}", f"d{i+1}") for i in range(5)]
    got = _cc(spark, edges)
    assert got == {(f"d{i}", "d0") for i in range(6)}


def test_two_components_and_direction_insensitivity(spark):
    fwd = [("a", "b"), ("b", "c"), ("x", "y")]
    rev = [(b, a) for a, b in fwd]
    assert _cc(spark, fwd) == _cc(spark, rev) == {
        ("a", "a"),
        ("b", "a"),
        ("c", "a"),
        ("x", "x"),
        ("y", "x"),
    }


def test_partitioning_insensitivity(spark):
    edges = [("a", "b"), ("c", "b"), ("d", "c"), ("p", "q"), ("q", "r")]
    df1 = spark.createDataFrame(edges, ["doc_a", "doc_b"]).repartition(1)
    df7 = spark.createDataFrame(edges[::-1], ["doc_a", "doc_b"]).repartition(7)
    r1 = {tuple(r) for r in connected_components(df1).collect()}
    r7 = {tuple(r) for r in connected_components(df7).collect()}
    assert r1 == r7


def test_null_edges_dropped_and_empty_input(spark):
    df = spark.createDataFrame(
        [("a", None), (None, "b"), ("a", "c")], ["doc_a", "doc_b"]
    )
    got = {tuple(r) for r in connected_components(df).collect()}
    assert got == {("a", "a"), ("c", "a")}
    empty = spark.createDataFrame([], "doc_a string, doc_b string")
    assert connected_components(empty).count() == 0


def test_star_input_converges_without_a_step_round(spark):
    """r6 structural convergence check: an input pair list that already
    forms disjoint min-rooted stars (after orientation) is recognized
    as converged BEFORE any large/small-star round — max_iters=0 must
    succeed.  Pins the one-job _is_stars test replacing the former
    count + exceptAll fixpoint comparison (which always paid one full
    extra round to observe the edge set stopped changing)."""
    edges = [("b", "a"), ("c", "a"), ("y", "x"), ("s", "s")]
    got = _cc(spark, edges, max_iters=0)
    assert got == {
        ("a", "a"),
        ("b", "a"),
        ("c", "a"),
        ("x", "x"),
        ("y", "x"),
        ("s", "s"),
    }
    # a non-star input (shared child: c in two pairs, one of which has
    # a non-min root) must NOT pass the structural check at budget 0
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(spark, [("c", "a"), ("c", "b")], max_iters=0)


def test_nonconvergence_is_loud(spark):
    # large/small-star needs a few rounds on a long chain; a budget of 1
    # cannot finish a 64-node path, and the failure must be loud, never
    # a partially-converged labeling
    edges = [(f"d{i:03d}", f"d{i+1:03d}") for i in range(63)]
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iters=1)


def test_long_chain_converges_in_log_rounds(spark):
    """The scale property that motivated the large/small-star rewrite
    (VERDICT r3): a 200-node path has diameter 199 — min-label
    propagation needed 199 rounds (the old default budget of 25 raised
    RuntimeError); star-rewiring converges in O(log n) rounds, well
    inside a budget of 10."""
    n = 200
    edges = [(f"d{i:03d}", f"d{i+1:03d}") for i in range(n - 1)]
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {tuple(r) for r in connected_components(df, max_iters=10).collect()}
    assert got == {(f"d{i:03d}", "d000") for i in range(n)}


def test_self_loop_only_node_is_singleton(spark):
    # a node whose only pair is (s, s) still gets a singleton label
    df = spark.createDataFrame(
        [("s", "s"), ("a", "b")], ["doc_a", "doc_b"]
    )
    got = {tuple(r) for r in connected_components(df).collect()}
    assert got == {("s", "s"), ("a", "a"), ("b", "a")}


def test_dedup_clusters_shape(spark):
    # triangle {a,b,c} + pair {x,y}: sizes, canonical flags, min ids
    edges = [("b", "a"), ("c", "a"), ("b", "c"), ("y", "x")]
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    rows = {
        (r["doc_id"], r["cluster_id"], r["n_cluster"], r["is_canonical"])
        for r in dedup_clusters(df).collect()
    }
    assert rows == {
        ("a", "a", 3, True),
        ("b", "a", 3, False),
        ("c", "a", 3, False),
        ("x", "x", 2, True),
        ("y", "x", 2, False),
    }


def test_plan_no_python_and_single_pass_edges(spark):
    """The per-round plan stays JVM-side: no BatchEvalPython anywhere in
    the iterative labeling (the operator is pure Catalyst joins/aggs)."""
    edges = [("a", "b"), ("b", "c")]
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    out = connected_components(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_integer_node_ids(spark):
    edges = [(3, 1), (1, 2), (9, 7)]
    df = spark.createDataFrame(edges, "doc_a int, doc_b int")
    got = {tuple(r) for r in connected_components(df).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (7, 7), (9, 7)}


def test_tight_round_budget_still_converges(spark):
    # a diameter-5 path needs only ~3 star rounds; a tight budget of 5
    # (formerly exactly the diameter) converges with room to spare
    edges = [(f"d{i}", f"d{i+1}") for i in range(5)]  # diameter 5
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {tuple(r) for r in connected_components(df, max_iters=5).collect()}
    assert got == {(f"d{i}", "d0") for i in range(6)}


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_graph_matches_union_find(spark, seed):
    """Randomized cross-check against an independent pure-Python
    union-find: component labels (min member id) must agree exactly."""
    import random

    rng = random.Random(seed)
    n = 40
    edges = list(
        {
            (f"n{rng.randrange(n):02d}", f"n{rng.randrange(n):02d}")
            for _ in range(45)
        }
    )
    edges = [(a, b) for a, b in edges if a != b]

    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_members: dict[str, list[str]] = {}
    for v in parent:
        comp_members.setdefault(find(v), []).append(v)
    want = {
        v: min(members)
        for members in comp_members.values()
        for v in members
    }

    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {r["node"]: r["comp"] for r in connected_components(df).collect()}
    assert got == want


@pytest.mark.parametrize("seed", [11, 12])
def test_sparse_random_graph_matches_union_find(spark, seed):
    """Chain-heavy regime: n nodes with only ~0.6n random edges form
    long paths and trees (large diameter relative to size) — exactly
    where min-label propagation was O(diameter) and the star algorithm
    must stay logarithmic.  Cross-checked against pure-Python
    union-find on 300 nodes."""
    import random

    rng = random.Random(seed)
    n = 300
    edges = list(
        {
            (f"n{rng.randrange(n):03d}", f"n{rng.randrange(n):03d}")
            for _ in range(180)
        }
    )
    edges = [(a, b) for a, b in edges if a != b]

    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_members: dict[str, list[str]] = {}
    for v in parent:
        comp_members.setdefault(find(v), []).append(v)
    want = {
        v: min(members)
        for members in comp_members.values()
        for v in members
    }

    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {
        r["node"]: r["comp"]
        for r in connected_components(df, max_iters=12).collect()
    }
    assert got == want
