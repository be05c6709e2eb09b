"""Closed-form units for the r8 stats/metrics operators: Cramér's V,
two-sample KS, lift/gain, and retrieval NDCG/MRR."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from clinical_data_lake_spark.ml.stats import (
    cramers_v,
    ks_test,
    lift_gain,
    retrieval_metrics,
)


def test_cramers_v_perfect_association_is_one(spark):
    # a determines b exactly -> V = 1
    df = spark.createDataFrame(
        [("x", 1)] * 10 + [("y", 2)] * 20 + [("z", 3)] * 5, "a string, b int"
    )
    r = cramers_v(df, "a", "b").collect()[0]
    assert r.v == pytest.approx(1.0, abs=1e-6)
    # independence -> V ~ 0
    indep = spark.createDataFrame(
        [(a, b) for a in ("x", "y") for b in (1, 2) for _ in range(10)],
        "a string, b int",
    )
    r0 = cramers_v(indep, "a", "b").collect()[0]
    assert r0.v == pytest.approx(0.0, abs=1e-6)


def test_ks_test_closed_form(spark):
    # arm a: {1,2,3,4}, arm b: {3,4,5,6}; D = max gap = 0.5 at v=2
    rows = [("a", v) for v in (1.0, 2.0, 3.0, 4.0)] + [
        ("b", v) for v in (3.0, 4.0, 5.0, 6.0)
    ]
    df = spark.createDataFrame(rows, "arm string, x double")
    r = ks_test(df, "x", "arm").collect()[0]
    assert (r.n1, r.n2) == (4, 4)
    assert r.d_stat == pytest.approx(0.5, abs=1e-6)
    # identical distributions -> D = 0
    same = spark.createDataFrame(
        [("a", float(v)) for v in range(10)] + [("b", float(v)) for v in range(10)],
        "arm string, x double",
    )
    assert ks_test(same, "x", "arm").collect()[0].d_stat == pytest.approx(0.0)
    with pytest.raises(ValueError, match=">= 3"):
        ks_test(
            spark.createDataFrame(
                [("a", 1.0), ("b", 1.0), ("c", 1.0)], "arm string, x double"
            ),
            "x",
            "arm",
        )


def test_ks_test_partition_invariant(spark):
    df = spark.range(2000).select(
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("arm"),
        (F.col("id") % 97 * (F.col("id") % 2 * 0.3 + 1.0)).alias("x"),
    )
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        vals = set()
        for p in ("1", "7", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", p)
            vals.add(tuple(ks_test(df, "x", "arm").collect()[0]))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert len(vals) == 1


def test_lift_gain_closed_form(spark):
    # 20 rows, scores 1..20, positives = the top 5 scores -> the top
    # decile (2 bins of 2 rows each at n_bins=10... use n_bins=4):
    # quartile 1 (scores 16-20) captures all but one positive
    rows = [(float(s), 1 if s > 15 else 0) for s in range(1, 21)]
    df = spark.createDataFrame(rows, "score double, label int")
    out = {r.bin_rank: r for r in lift_gain(df, "score", "label", n_bins=4).collect()}
    assert out[1].n == 5 and out[1].n_pos == 5
    assert out[1].gain == pytest.approx(1.0)
    assert out[1].lift == pytest.approx((5 / 5) / (5 / 20))  # = 4.0
    assert out[4].cum_n == 20 and out[4].cum_pos == 5
    assert out[4].gain == pytest.approx(1.0)
    assert out[4].lift == pytest.approx(1.0)


def test_retrieval_metrics_closed_form(spark):
    results = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1), (2, 21, 2)],
        "query_id int, doc_id int, rank int",
    )
    rels = spark.createDataFrame(
        # q1: doc 11 relevant (rank 2); doc 99 relevant but not retrieved
        # q2: nothing relevant
        [(1, 11, 1), (1, 99, 1)],
        "query_id int, doc_id int, rel int",
    )
    out = {r.query_id: r for r in retrieval_metrics(results, rels, k=3).collect()}
    dcg = 1.0 / math.log2(3)  # rel at rank 2
    idcg = 1.0 + 1.0 / math.log2(3)  # two relevant docs ideally at 1, 2
    assert out[1].ndcg == pytest.approx(dcg / idcg, abs=1e-5)
    assert out[1].rr == pytest.approx(0.5)
    assert out[2].ndcg == 0.0 and out[2].rr == 0.0
