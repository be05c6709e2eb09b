"""Round-10 session-3 graph pack: HITS, degree assortativity,
modularity."""

from __future__ import annotations

import math

import pytest

from clinical_data_lake_spark.operators.graph import (
    assortativity,
    hits,
    modularity,
)


def _edges(spark, pairs, schema="src long, dst long"):
    return spark.createDataFrame(pairs, schema)


# -- hits ---------------------------------------------------------------


def test_hits_closed_form_two_hubs(spark):
    # h1 -> {a1, a2}, h2 -> {a1}: after 1 round (unscaled)
    # auth(a1)=2, auth(a2)=1; hub(h1)=3, hub(h2)=2
    e = _edges(spark, [(1, 10), (1, 11), (2, 10)])
    out = {r.node: r for r in hits(e, k=1).collect()}
    assert out[10].authority == pytest.approx(2 / 3)
    assert out[11].authority == pytest.approx(1 / 3)
    assert out[1].hub == pytest.approx(3 / 5)
    assert out[2].hub == pytest.approx(2 / 5)
    # pure authorities have hub 0, pure hubs authority 0
    assert out[10].hub == 0.0 and out[1].authority == 0.0


def test_hits_matches_python_reference_k2(spark):
    edges = [(1, 10), (1, 11), (2, 10), (3, 11), (3, 12), (2, 12), (1, 12)]
    e = _edges(spark, edges)
    out = {r.node: r for r in hits(e, k=2).collect()}

    hub = {n: 1 for n in {s for s, _ in edges} | {d for _, d in edges}}
    auth = {}
    for _ in range(2):
        auth = {}
        for s, d in edges:
            auth[d] = auth.get(d, 0) + hub.get(s, 0)
        hub = {}
        for s, d in edges:
            hub[s] = hub.get(s, 0) + auth.get(d, 0)
    th, ta = sum(hub.values()), sum(auth.values())
    for n, r in out.items():
        assert r.hub == pytest.approx(round(hub.get(n, 0) / th, 9), abs=1e-9)
        assert r.authority == pytest.approx(
            round(auth.get(n, 0) / ta, 9), abs=1e-9
        )


def test_hits_dedupes_parallel_edges(spark):
    e = _edges(spark, [(1, 10), (1, 10), (2, 10)])
    out = {r.node: r for r in hits(e, k=1).collect()}
    assert out[1].hub == out[2].hub


# -- assortativity ------------------------------------------------------


def test_assortativity_star_is_negative(spark):
    # star K1,4: every edge pairs degree 4 with degree 1 -> r = -1
    e = _edges(spark, [(0, i) for i in range(1, 5)])
    r = assortativity(e).collect()[0]
    assert r.n_nodes == 5 and r.n_edges == 4
    assert r.r == pytest.approx(-1.0)


def test_assortativity_regular_graph_null(spark):
    # 4-cycle: all degrees 2, zero variance -> NULL
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    r = assortativity(e).collect()[0]
    assert r.r is None


def test_assortativity_matches_python_reference(spark):
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (3, 4), (4, 5), (5, 6), (4, 6)]
    e = _edges(spark, edges)
    r = assortativity(e).collect()[0]

    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    pairs = [(deg[a], deg[b]) for a, b in edges] + [
        (deg[b], deg[a]) for a, b in edges
    ]
    m = len(pairs)
    su = sum(u for u, _ in pairs)
    sv = sum(v for _, v in pairs)
    suu = sum(u * u for u, _ in pairs)
    svv = sum(v * v for _, v in pairs)
    suv = sum(u * v for u, v in pairs)
    expect = (suv - su * sv / m) / math.sqrt(
        (suu - su * su / m) * (svv - sv * sv / m)
    )
    assert r.r == pytest.approx(round(expect, 6), abs=1e-6)
    assert r.n_edges == len(edges)


def test_assortativity_ignores_self_loops_and_duplicates(spark):
    e = _edges(spark, [(0, 1), (1, 0), (2, 2), (0, 1)])
    r = assortativity(e).collect()[0]
    assert r.n_edges == 1


# -- modularity ---------------------------------------------------------


def test_modularity_two_cliques_closed_form(spark):
    # two triangles joined by one bridge edge; labels = the triangles
    e = _edges(
        spark, [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    )
    labels = spark.createDataFrame(
        [(i, 0) for i in range(3)] + [(i, 1) for i in range(3, 6)],
        "node long, label long",
    )
    rows = {r.label: r for r in modularity(e, labels).collect()}
    m = 7
    # community 0: 3 intra edges, degrees 2+2+3 = 7
    assert rows[0].m_intra == 3 and rows[0].d_total == 7
    q0 = 3 / m - (7 / (2 * m)) ** 2
    q1 = 3 / m - (7 / (2 * m)) ** 2
    assert rows[0].q_contrib == pytest.approx(round(q0, 6))
    assert rows[0].q_total == pytest.approx(round(round(q0, 6) + round(q1, 6), 6))
    assert rows[0].q_total > 0.3  # real community structure


def test_modularity_single_community_is_zero(spark):
    # everything in one community: Q = m/m - (2m/2m)^2 = 0
    e = _edges(spark, [(0, 1), (1, 2), (2, 0)])
    labels = spark.createDataFrame(
        [(i, 7) for i in range(3)], "node long, label long"
    )
    r = modularity(e, labels).collect()[0]
    assert r.q_total == pytest.approx(0.0)


def test_modularity_cross_only_partition_negative(spark):
    # bipartite 2x2 with the partition split across every edge
    e = _edges(spark, [(0, 2), (0, 3), (1, 2), (1, 3)])
    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1)], "node long, label long"
    )
    rows = modularity(e, labels).collect()
    assert all(r.m_intra == 0 for r in rows)
    assert rows[0].q_total < 0.0
