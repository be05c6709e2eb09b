"""PageRank semantics on closed-form graphs."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from clinical_data_lake_spark.operators.graph import pagerank


def test_pagerank_symmetric_triangle_stays_uniform(spark):
    edges = spark.createDataFrame(
        [Row(src=1, dst=2), Row(src=2, dst=3), Row(src=1, dst=3)]
    )
    ranks = {r.node: r.rank for r in pagerank(edges, iterations=4).collect()}
    # regular graph: uniform ranks are the fixpoint from iteration 0
    assert ranks == {1: pytest.approx(1.0), 2: pytest.approx(1.0), 3: pytest.approx(1.0)}


def test_pagerank_path_graph_closed_form(spark):
    # path 1-2-3: deg = {1:1, 2:2, 3:1}; hand-computed two iterations
    edges = spark.createDataFrame([Row(src=1, dst=2), Row(src=2, dst=3)])
    r = {n.node: n.rank for n in pagerank(edges, iterations=2).collect()}
    # r1: ends .15+.85*(1/2)=.575, middle .15+.85*(1+1)=1.85
    # r2: ends .15+.85*(1.85/2)=.93625, middle .15+.85*(.575+.575)=1.1275
    assert r[1] == pytest.approx(0.93625)
    assert r[2] == pytest.approx(1.1275)
    assert r[3] == pytest.approx(0.93625)


def test_pagerank_mass_is_conserved(spark):
    # undirected + damping: total rank == n_nodes at every iteration
    edges = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)]]
    )
    rows = pagerank(edges, iterations=3).collect()
    assert sum(r.rank for r in rows) == pytest.approx(4.0)


def test_triangle_counts_closed_form(spark):
    from clinical_data_lake_spark.operators.graph import triangle_counts

    # K4 on {1,2,3,4}: every node is in C(3,2)=3 triangles; node 5
    # hangs off node 1 (no triangle); edges arrive unordered/dup'd
    edges = [(1, 2), (2, 1), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (5, 1)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3, 5: 0}


def test_triangle_counts_chain_has_none(spark):
    from clinical_data_lake_spark.operators.graph import triangle_counts

    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["src", "dst"])
    out = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert set(out.values()) == {0}


def test_link_prediction_hub_degree_guard_raises(spark):
    # r10 verdict #4: planted super-hub (star center, degree 6) trips
    # the in-plan max_degree guard before the deg^2 wedge fan-out
    import pytest as _pt
    from clinical_data_lake_spark.operators.graph import link_prediction

    star = spark.createDataFrame(
        [(0, k) for k in range(1, 7)], "src int, dst int"
    )
    with _pt.raises(Exception, match="link_prediction.*degree"):
        link_prediction(star, max_degree=5).collect()


def test_link_prediction_guard_optout_none_completes(spark):
    # max_degree=None restores the pre-cap behavior for legitimate
    # hubs (r11 advice: the guard default was breaking for callers
    # with real super-hub nodes)
    from clinical_data_lake_spark.operators.graph import link_prediction

    star = spark.createDataFrame(
        [(0, k) for k in range(1, 7)], "src int, dst int"
    )
    rows = link_prediction(star, max_degree=None).collect()
    # every leaf pair shares hub 0: C(6,2) = 15 candidate links
    assert len(rows) == 15 and all(r.cn == 1 for r in rows)


def test_link_prediction_guard_under_cap_matches_uncapped(spark):
    from clinical_data_lake_spark.operators.graph import link_prediction

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 3)], "src int, dst int"
    )
    base = sorted(map(tuple, link_prediction(edges).collect()))
    capped = sorted(map(tuple, link_prediction(edges, max_degree=3).collect()))
    assert capped == base and len(base) > 0
