"""Round-10 session-3: k-means Lloyd step, IPTW ATE, cumulative
crossover."""

from __future__ import annotations

import hashlib

import pytest

from clinical_data_lake_spark.llm.similarity import kmeans_lloyd_step
from clinical_data_lake_spark.ml.stats import iptw_ate
from clinical_data_lake_spark.operators.timeseries import cumulative_compare


# -- kmeans_lloyd_step ----------------------------------------------------


def test_kmeans_step_matches_python_reference(spark):
    import random

    rng = random.Random(3)
    vecs = [(i, [rng.random() for _ in range(4)]) for i in range(40)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = kmeans_lloyd_step(df, k=3).collect()

    seeds = sorted(
        vecs, key=lambda v: (hashlib.md5(str(v[0]).encode()).hexdigest(), v[0])
    )[:3]
    assign = {}
    for vid, v in vecs:
        best = None
        for sid, c in seeds:
            d2 = round(sum((a - b) * (a - b) for a, b in zip(v, c)), 9)
            if best is None or (d2, sid) < best:
                best = (d2, sid)
        assign.setdefault(best[1], []).append((vid, v, best[0]))

    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster, {})[r.pos] = r
    for sid, members in assign.items():
        rows = by_cluster[sid]
        assert rows[0].n_members == len(members)
        inertia = round(sum(d for _, _, d in members), 6)
        assert rows[0].inertia == pytest.approx(inertia, abs=1e-6)
        for pos in range(4):
            mean = sum(v[pos] for _, v, _ in members) / len(members)
            assert rows[pos].mean == pytest.approx(mean, abs=1e-5)


def test_kmeans_step_k1_centroid_is_global_mean(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [2.0, 4.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {r.pos: r for r in kmeans_lloyd_step(df, k=1).collect()}
    assert rows[0].n_members == 2
    assert rows[0].mean == pytest.approx(1.0)
    assert rows[1].mean == pytest.approx(2.0)


# -- iptw_ate ------------------------------------------------------------


def test_iptw_recovers_effect_under_confounding(spark):
    # stratum s1: 75% treated, outcome base 10; s2: 25% treated, base 0.
    # True effect = +2 in both strata. Naive diff is confounded; IPTW
    # recovers 2.
    rows = []
    for _ in range(30):
        rows.append(("s1", True, 12.0))
    for _ in range(10):
        rows.append(("s1", False, 10.0))
    for _ in range(10):
        rows.append(("s2", True, 2.0))
    for _ in range(30):
        rows.append(("s2", False, 0.0))
    df = spark.createDataFrame(rows, "s string, t boolean, y double")
    r = iptw_ate(df, "t", "y", ["s"]).collect()[0]
    assert r.n_used == 80 and r.n_off_support == 0
    assert r.ate == pytest.approx(2.0, abs=1e-6)
    # naive difference for contrast: treated mean 9.5, control 2.5 -> 7
    assert abs(9.5 - 2.5 - r.ate) > 4


def test_iptw_off_support_strata_excluded_and_counted(spark):
    rows = [("all_t", True, 5.0)] * 4 + [
        ("mix", True, 3.0),
        ("mix", False, 1.0),
    ]
    df = spark.createDataFrame(rows, "s string, t boolean, y double")
    r = iptw_ate(df, "t", "y", ["s"]).collect()[0]
    assert r.n_off_support == 4 and r.n_used == 2
    assert r.ate == pytest.approx(2.0)


def test_iptw_unstabilized_same_ate(spark):
    rows = (
        [("a", True, 4.0)] * 3
        + [("a", False, 1.0)] * 1
        + [("b", True, 6.0)] * 1
        + [("b", False, 3.0)] * 3
    )
    df = spark.createDataFrame(rows, "s string, t boolean, y double")
    r1 = iptw_ate(df, "t", "y", ["s"], stabilized=True).collect()[0]
    r2 = iptw_ate(df, "t", "y", ["s"], stabilized=False).collect()[0]
    # stabilization rescales weights within arm -> identical weighted means
    assert r1.ate == pytest.approx(r2.ate, abs=1e-5)


# -- cumulative_compare ---------------------------------------------------


def test_cumulative_compare_closed_form(spark):
    rows = [
        ("2024-01-01 00:00:00", "a"),
        ("2024-01-01 01:00:00", "b"),
        ("2024-01-01 02:00:00", "b"),
        ("2024-01-02 00:00:00", "a"),
        ("2024-01-02 01:00:00", "a"),
        ("2024-01-04 00:00:00", "b"),
    ]
    df = spark.createDataFrame(rows, "ts string, kind string").select(
        __import__("pyspark.sql.functions", fromlist=["F"]).to_timestamp("ts").alias("ts"),
        "kind",
    )
    out = {str(r.day): r for r in cumulative_compare(df, "ts", "kind", "a", "b").collect()}
    assert out["2024-01-01"].cum_a == 1 and out["2024-01-01"].cum_b == 2
    assert out["2024-01-01"].a_leads is False
    assert out["2024-01-02"].cum_a == 3 and out["2024-01-02"].cum_b == 2
    assert out["2024-01-02"].a_leads is True
    assert out["2024-01-02"].lead_margin == 1
    # day with only b still appears, a count 0
    assert out["2024-01-04"].n_a == 0 and out["2024-01-04"].cum_b == 3


def test_cumulative_compare_other_kinds_ignored(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", "zzz")], "ts string, kind string"
    ).select(F.to_timestamp("ts").alias("ts"), "kind")
    assert cumulative_compare(df, "ts", "kind", "a", "b").count() == 0
