"""connected_components / cluster_keep_best invariants."""

import pytest
from pyspark.sql import functions as F

from demo_data_warehouse_spark.operators import graph


def _cc(spark, node_ids, edge_pairs, **kw):
    nodes = spark.createDataFrame([(n,) for n in node_ids], "id bigint")
    edges = spark.createDataFrame(
        [(a, b) for a, b in edge_pairs] or [(None, None)], "src bigint, dst bigint"
    )
    if not edge_pairs:
        edges = edges.where(F.lit(False))
    out = graph.connected_components(nodes, edges, **kw)
    return {r["id"]: r["comp"] for r in out.collect()}


def test_chain_and_singleton(spark):
    # chain 1-2-3-4 (diameter 3) + pair {10,11} + singleton 99
    got = _cc(spark, [1, 2, 3, 4, 10, 11, 99], [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 99: 99}


def test_duplicate_and_reversed_edges_are_harmless(spark):
    got = _cc(spark, [1, 2, 3], [(1, 2), (2, 1), (1, 2), (3, 3)])
    assert got == {1: 1, 2: 1, 3: 3}


def test_no_edges_all_singletons(spark):
    got = _cc(spark, [5, 6], [])
    assert got == {5: 5, 6: 6}


def test_nonconvergence_raises(spark):
    # a 6-chain needs >1 round; max_iter=1 must raise, not return a
    # half-merged clustering
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(spark, list(range(6)), [(i, i + 1) for i in range(5)], max_iter=1)


def test_keep_best_deterministic_tiebreak(spark):
    comps = spark.createDataFrame([(1, 1), (2, 1), (3, 1), (9, 9)], "id bigint, comp bigint")
    scored = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (9, 5)], "doc_id bigint, s bigint"
    )
    out = {
        r["comp"]: (r["keeper_id"], r["n_members"], r["keeper_score"])
        for r in graph.cluster_keep_best(comps, scored, "doc_id", "s").collect()
    }
    # tie on score=30 → lower id (2) wins
    assert out == {1: (2, 3, 30), 9: (9, 1, 5)}


def _pr(spark, edge_pairs, n_iter=3):
    edges = spark.createDataFrame(edge_pairs, "src string, dst string")
    nodes = edges.select("src").union(edges.select("dst")).distinct()
    out = graph.pagerank_fixed(nodes, edges, n_iter=n_iter)
    return {r["id"]: r["pr"] for r in out.collect()}


def test_pagerank_symmetric_pair_is_fixed_point(spark):
    # two vertices exchanging their whole rank: 150000 + 85% of 1e6
    # is 1e6 again — the uniform rank must be an exact fixed point
    got = _pr(spark, [("a", "b"), ("b", "a")])
    assert got == {"a": 1_000_000, "b": 1_000_000}


def test_pagerank_star_exact_values_and_order(spark):
    # 3-leaf star, symmetrized; hand-computed integer sequence
    edges = []
    for leaf in ("x", "y", "z"):
        edges += [("c", leaf), (leaf, "c")]
    got = _pr(spark, edges)
    assert got["c"] == 2_483_250  # hand-derived 3-round fixed-point value
    assert got["x"] == got["y"] == got["z"] == 505_583
    # determinism: a second run must be bit-identical
    assert _pr(spark, edges) == got


def test_pagerank_source_only_vertex_keeps_base_rank(spark):
    # a → b, no edge into a: a's rank is the undamped base every round
    got = _pr(spark, [("a", "b")], n_iter=2)
    assert got["a"] == 150_000


def test_triangle_counts_known_graph(spark):
    # K4 minus edge (3,4): triangles {1,2,3} and {1,2,4} — node 1,2 in
    # two each, nodes 3,4 in one
    from demo_data_warehouse_spark.operators.graph import triangle_counts

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)], ["a", "b"]
    )
    got = {r.node: r.n_triangles for r in triangle_counts(edges).collect()}
    assert got == {1: 2, 2: 2, 3: 1, 4: 1}


def test_triangle_counts_hub_graph(spark):
    # star graph (hub 0 to 1..9) has no triangles at all; adding one
    # rim edge (1,2) makes exactly one
    from demo_data_warehouse_spark.operators.graph import triangle_counts

    star = [(0, i) for i in range(1, 10)]
    edges = spark.createDataFrame(star, ["a", "b"])
    assert triangle_counts(edges).count() == 0
    edges2 = spark.createDataFrame(star + [(1, 2)], ["a", "b"])
    got = {r.node: r.n_triangles for r in triangle_counts(edges2).collect()}
    assert got == {0: 1, 1: 1, 2: 1}


def test_star_components_match_propagation_random(spark):
    import random

    from demo_data_warehouse_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(7)
    n = 120
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
    nodes_df = spark.createDataFrame([(i,) for i in range(n)], "id bigint")
    edges_df = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b], "src bigint, dst bigint"
    )
    lp = {r["id"]: r["comp"] for r in connected_components(nodes_df, edges_df).collect()}
    st = {r["id"]: r["comp"] for r in
          connected_components_star(nodes_df, edges_df).collect()}
    assert lp == st


def test_star_components_converge_on_long_chain(spark):
    from demo_data_warehouse_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    # a 60-node chain: label propagation needs ~60 rounds (its default
    # max_iter raises); star alternations square the shortcut length
    n = 60
    nodes_df = spark.createDataFrame([(i,) for i in range(n)], "id bigint")
    edges_df = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src bigint, dst bigint"
    )
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        connected_components(nodes_df, edges_df, max_iter=10)
    st = connected_components_star(nodes_df, edges_df, max_iter=12)
    assert {r["comp"] for r in st.collect()} == {0}
