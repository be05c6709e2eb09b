"""Closed-form units for the r8 time-series operators: ACF and CUSUM
changepoint."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from clinical_data_lake_spark.operators.timeseries import acf, cusum_changepoint


def _series(spark, key, vals):
    return spark.createDataFrame(
        [(key, i, float(v)) for i, v in enumerate(vals)], "k string, t int, x double"
    )


def test_acf_alternating_series_is_minus_one_at_lag1(spark):
    # x = +1,-1,+1,... -> acf(1) = -1, acf(2) = +1
    df = _series(spark, "s", [1, -1, 1, -1, 1, -1, 1, -1])
    out = {r.lag: r for r in acf(df, "k", ["t"], "x", max_lag=2).collect()}
    assert out[1].acf == pytest.approx(-1.0, abs=1e-6)
    assert out[2].acf == pytest.approx(1.0, abs=1e-6)
    assert out[1].n_pairs == 7 and out[2].n_pairs == 6


def test_acf_matches_numpy_pearson(spark):
    import random

    rnd = random.Random(7)
    vals = [rnd.gauss(0, 1) for _ in range(50)]
    df = _series(spark, "s", vals)
    out = {r.lag: r.acf for r in acf(df, "k", ["t"], "x", max_lag=3).collect()}

    def pearson(a, b):
        n = len(a)
        sa, sb = sum(a), sum(b)
        sab = sum(x * y for x, y in zip(a, b))
        sa2, sb2 = sum(x * x for x in a), sum(y * y for y in b)
        return (n * sab - sa * sb) / math.sqrt(
            (n * sa2 - sa * sa) * (n * sb2 - sb * sb)
        )

    for lag in (1, 2, 3):
        want = pearson(vals[:-lag], vals[lag:])
        assert out[lag] == pytest.approx(want, abs=1e-4), lag


def test_acf_constant_series_yields_null(spark):
    df = _series(spark, "s", [5, 5, 5, 5, 5])
    rows = acf(df, "k", ["t"], "x", max_lag=1).collect()
    assert rows[0].acf is None


def test_cusum_detects_level_shift(spark):
    # flat 0s then flat 10s: the peak |S| sits exactly at the shift
    vals = [0.0] * 10 + [10.0] * 10
    df = _series(spark, "s", vals)
    r = cusum_changepoint(df, "k", ["t"], "x").collect()[0]
    assert r.n == 20
    assert r.cp_pos == 10  # last pre-shift point maximizes |cumdev|
    # closed form: mean=5, var_samp=(20*1000-100^2)/(20*19)=500/19;
    # S_10 = |0 - 10*5| / (sd * sqrt(20))
    sd = math.sqrt(10000 / 380)
    want = abs(-50.0) / (sd * math.sqrt(20))
    assert r.d_max == pytest.approx(want, abs=1e-5)


def test_cusum_degenerate_series_yields_null(spark):
    df = _series(spark, "c", [3, 3, 3]).unionByName(_series(spark, "one", [1]))
    out = {r.k: r for r in cusum_changepoint(df, "k", ["t"], "x").collect()}
    assert out["c"].d_max is None and out["c"].cp_pos is None
    assert out["one"].d_max is None and out["one"].n == 1


def test_cusum_partition_invariant(spark):
    df = spark.range(3000).select(
        (F.col("id") % 13).cast("string").alias("k"),
        F.col("id").alias("t"),
        ((F.col("id") * 37 % 101) + F.when(F.col("id") > 1500, 50).otherwise(0))
        .cast("double")
        .alias("x"),
    )
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        seen = set()
        for p in ("1", "7", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", p)
            rows = tuple(
                sorted(tuple(r) for r in cusum_changepoint(df, "k", ["t"], "x").collect())
            )
            seen.add(rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert len(seen) == 1
