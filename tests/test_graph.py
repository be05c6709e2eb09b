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
