"""Connected components / duplicate clustering (operators/graph.py):
ground truth via a driver-side union-find, plus shape and convergence
properties."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from wordpress_sql_to_contentstack_exporter_spark.operators import graph as gr


def union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def cc_of(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["id"]: r["cluster_id"]
        for r in gr.connected_components(df).collect()
    }


def test_chain_star_and_disjoint_components(spark):
    edges = (
        [(i, i + 1) for i in range(5)]           # chain 0-5 (diameter 5)
        + [(100, n) for n in (101, 102, 103)]    # star at 100
        + [(200, 201)]                           # separate pair
    )
    got = cc_of(spark, edges)
    assert {k: v for k, v in got.items() if k < 100} == {i: 0 for i in range(6)}
    assert {k: v for k, v in got.items() if 100 <= k < 200} == {
        n: 100 for n in (100, 101, 102, 103)
    }
    assert got[200] == 200 and got[201] == 200


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    nodes = list(range(80))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    got = cc_of(spark, edges)
    touched = {a for a, _ in edges} | {b for _, b in edges}
    want = union_find(edges, touched)
    assert got == want  # nodes without edges are absent by contract


def test_nonconvergence_raises_with_pointer(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(8)], "src long, dst long")
    with pytest.raises(RuntimeError, match="large-star/small-star"):
        gr.connected_components(df, max_iter=2)


def test_dedup_clusters_keeper_and_singletons(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    ids = spark.createDataFrame([(i,) for i in (1, 2, 3, 10, 11, 99)], "doc_id long")
    out = {r["id"]: (r["cluster_id"], r["is_keeper"]) for r in
           gr.dedup_clusters(pairs, ids).collect()}
    assert out == {
        1: (1, True), 2: (1, False), 3: (1, False),
        10: (10, True), 11: (10, False),
        99: (99, True),  # singleton: its own keeper
    }
    # exactly one keeper per cluster
    keepers = [k for k, (c, keep) in out.items() if keep]
    assert sorted(keepers) == [1, 10, 99]


def test_cc_plan_shuffles_only_long_pairs(spark):
    """Scale property: each round's shuffle carries (long, long) label
    rows — no text, no arrays. Probe the first propagation join's plan."""
    import io
    from contextlib import redirect_stdout

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    labels = sym.select(F.col("src").alias("id")).distinct().withColumn(
        "label", F.col("id")
    )
    prop = (
        sym.join(labels, sym["dst"] == labels["id"])
        .groupBy("src")
        .agg(F.min("label").alias("nbr_min"))
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        prop.explain("formatted")
    plan = buf.getvalue()
    assert "HashAggregate" in plan  # partial min combine before the shuffle


def test_cluster_representatives_picks_highest_quality(spark):
    from wordpress_sql_to_contentstack_exporter_spark.operators.graph import cluster_representatives

    assignments = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (20, 20), (21, 20)],
        "id long, cluster_id long",
    )
    docs = spark.createDataFrame(
        [(1, 50), (2, 900), (3, 900), (10, 5), (20, 7), (21, 7)],
        "id long, n_chars long",
    )
    out = cluster_representatives(assignments, docs)
    rows = {r["id"]: (r["keeper_id"], r["is_keeper"]) for r in out.collect()}
    # cluster 1: quality tie between 2 and 3 -> smallest id (2) wins
    assert rows[1] == (2, False) and rows[2] == (2, True) and rows[3] == (2, False)
    # singleton keeps itself
    assert rows[10] == (10, True)
    # cluster 20: tie -> id 20
    assert rows[20] == (20, True) and rows[21] == (20, False)


def test_triangle_count_known_graphs(spark):
    from wordpress_sql_to_contentstack_exporter_spark.operators.graph import triangle_count

    def tri(edges):
        df = spark.createDataFrame(edges, "src long, dst long")
        r = triangle_count(df).collect()[0]
        return (r["n_nodes"], r["n_edges"], r["n_triangles"])

    # a single triangle, with duplicate/reversed/self-loop noise
    assert tri([(1, 2), (2, 3), (3, 1), (2, 1), (1, 1), (3, 1)]) == (3, 3, 1)
    # K4 has 4 triangles
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    assert tri(k4) == (4, 6, 4)
    # star graph: hub + 5 leaves, no triangles (the degree-orientation
    # worst case the operator exists to bound)
    star = [(0, i) for i in range(1, 6)]
    assert tri(star) == (6, 5, 0)
    # two disjoint triangles
    two = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10)]
    assert tri(two) == (6, 6, 2)


def test_pagerank_int_known_graphs(spark):
    from wordpress_sql_to_contentstack_exporter_spark.operators.graph import pagerank_int

    S = 10**12

    def pr(edges, nodes, iters=3):
        e = spark.createDataFrame(edges, "src long, dst long")
        n = spark.createDataFrame([(x,) for x in nodes], "node long")
        return {
            r["node"]: r["rank_scaled"]
            for r in pagerank_int(e, n, iterations=iters).collect()
        }

    # symmetric 2-cycle: ranks stay equal and mass is conserved exactly
    r = pr([(1, 2), (2, 1)], [1, 2])
    assert r[1] == r[2]
    assert abs(sum(r.values()) - 2 * S) <= 10  # only floor-div dust

    # hub with two fans pointing at it: hub outranks the fans; the
    # fans (no in-links) sit at the base rank
    r = pr([(1, 3), (2, 3), (3, 1)], [1, 2, 3])
    assert r[3] > r[1] > r[2] or r[3] > r[1] == r[2] or r[3] > max(r[1], r[2])
    base = (15 * S) // 100
    assert r[2] == base  # node 2 has no in-links after 1 iteration chain

    # determinism across runs (exact integer arithmetic)
    assert pr([(1, 2), (2, 1)], [1, 2]) == pr([(1, 2), (2, 1)], [1, 2])


def test_bfs_levels_hops_and_unreachable(spark):
    from wordpress_sql_to_contentstack_exporter_spark.operators.graph import bfs_levels

    # path 1-2-3-4-5-6 plus island 99; source = 1
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (98, 99)], "src long, dst long"
    )
    srcs = spark.createDataFrame([(1,)], "node long")
    out = {r["node"]: r["hops"] for r in bfs_levels(edges, srcs, max_hops=3).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 3}  # 5,6 beyond max_hops; island absent
    # undirected: reverse edge direction reaches the same set
    rev = spark.createDataFrame([(2, 1), (3, 2)], "src long, dst long")
    out2 = {r["node"]: r["hops"] for r in bfs_levels(rev, srcs, max_hops=3).collect()}
    assert out2 == {1: 0, 2: 1, 3: 2}
    # multi-source: min hops wins
    srcs2 = spark.createDataFrame([(1,), (5,)], "node long")
    out3 = {r["node"]: r["hops"] for r in bfs_levels(edges, srcs2, max_hops=2).collect()}
    assert out3[3] == 2 and out3[4] == 1 and out3[6] == 1


def test_kcore_clique_with_pendant(spark):
    """4-clique + pendant chain: the 3-core is exactly the clique with
    in-core degrees 3; the chain cascades away."""
    from wordpress_sql_to_contentstack_exporter_spark.operators.graph import kcore

    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    chain = [(3, 4), (4, 5)]
    edges = spark.createDataFrame(clique + chain, "src long, dst long")
    got = {(r["node"], r["degree"]) for r in kcore(edges, k=3).collect()}
    assert got == {(0, 3), (1, 3), (2, 3), (3, 3)}


def test_kcore_cascade_to_empty(spark):
    """A pure chain has no 2-core: every peel round exposes new
    degree-1 endpoints — exercises multi-round convergence down to the
    empty fixpoint."""
    from wordpress_sql_to_contentstack_exporter_spark.operators.graph import kcore

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "src long, dst long"
    )
    assert kcore(chain, k=2).count() == 0


def test_kcore_cycle_is_its_own_2core(spark):
    from wordpress_sql_to_contentstack_exporter_spark.operators.graph import kcore

    cyc = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)], "src long, dst long"
    )
    got = {(r["node"], r["degree"]) for r in kcore(cyc, k=2).collect()}
    assert got == {(i, 2) for i in range(6)}


def test_kcore_canonicalizes_and_validates(spark):
    from wordpress_sql_to_contentstack_exporter_spark.operators.graph import kcore

    messy = spark.createDataFrame(
        [(0, 1), (1, 0), (0, 0), (1, 2), (2, 0)], "src long, dst long"
    )
    got = {(r["node"], r["degree"]) for r in kcore(messy, k=2).collect()}
    assert got == {(0, 2), (1, 2), (2, 2)}  # dup/reverse/self-loop collapsed
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k >= 1"):
        kcore(messy, k=0)


def test_kcore_fixed_rounds_equals_fixpoint(spark):
    """Round 13: the fixed-round peel (the oracle-mirrorable form) must
    EQUAL the fixpoint peel once rounds >= the graph's peel depth, and
    extra rounds must be idempotent. Runs on the registry's synthetic
    graph (depth 10) at the gate's 12 rounds, plus a small handworked
    graph at an absurd surplus."""
    from wordpress_sql_to_contentstack_exporter_spark.operators.graph import kcore
    from wordpress_sql_to_contentstack_exporter_spark.plans.registry import (
        _graph_edges,
    )

    edges = _graph_edges(spark, "/root/testdata/sf0.001")
    fixed = {(r["node"], r["degree"]) for r in kcore(edges, k=3, rounds=12).collect()}
    fixpoint = {(r["node"], r["degree"]) for r in kcore(edges, k=3).collect()}
    assert fixed == fixpoint and len(fixed) > 0
    more = {(r["node"], r["degree"]) for r in kcore(edges, k=3, rounds=15).collect()}
    assert more == fixed

    clique = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b] + [(3, 9)],
        "src long, dst long",
    )
    assert {
        (r["node"], r["degree"]) for r in kcore(clique, k=3, rounds=30).collect()
    } == {(0, 3), (1, 3), (2, 3), (3, 3)}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="rounds"):
        kcore(clique, k=3, rounds=0)
