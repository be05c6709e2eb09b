"""Units for z-score standardization and the PSI drift monitor."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from clinical_data_lake_spark.ml.featurize import standardize
from clinical_data_lake_spark.ml.stats import population_stability


def test_standardize_closed_form(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0), ("b", 10.0)],
        ["grp", "x"],
    )
    out = {(r.grp, r.x): r.x_z for r in standardize(df, ["x"], keys=["grp"]).collect()}
    # group a: mean 2, sd 1 -> z = -1, 0, 1
    assert out[("a", 1.0)] == -1.0
    assert out[("a", 2.0)] == 0.0
    assert out[("a", 3.0)] == 1.0
    # zero-variance group: NULL, not a crash
    assert out[("b", 10.0)] is None


def test_standardize_global_mean_zero_sd_one(spark):
    df = spark.range(1000).select((F.col("id") % 37).cast("double").alias("x"))
    out = standardize(df, ["x"])
    stats = out.agg(
        F.round(F.avg("x_z"), 4).alias("m"), F.round(F.stddev_samp("x_z"), 3).alias("s")
    ).head()
    assert stats.m == pytest.approx(0.0, abs=1e-3)
    assert stats.s == pytest.approx(1.0, abs=1e-2)


def test_psi_identical_distributions_near_zero(spark):
    df = spark.range(2000).select((F.col("id") % 100).cast("double").alias("v"))
    out = population_stability(df, df, "v", n_bins=10)
    psi = out.agg(F.sum("psi_term").alias("s")).head().s
    assert abs(psi) < 0.01
    rows = out.collect()
    assert len(rows) == 10
    assert all(r.n_base == r.n_cur for r in rows)


def test_psi_detects_shift(spark):
    base = spark.range(2000).select((F.col("id") % 100).cast("double").alias("v"))
    cur = spark.range(2000).select(
        ((F.col("id") % 100) + 50).cast("double").alias("v")
    )
    psi = (
        population_stability(base, cur, "v", n_bins=10)
        .agg(F.sum("psi_term").alias("s"))
        .head()
        .s
    )
    assert psi > 0.25  # a +50% location shift is unambiguous drift


def test_psi_empty_bins_are_smoothed(spark):
    base = spark.range(1000).select((F.col("id") % 100).cast("double").alias("v"))
    cur = spark.range(100).select(F.lit(1000.0).alias("v"))  # all past the top edge
    rows = population_stability(base, cur, "v", n_bins=5).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.psi_term is not None and math.isfinite(r.psi_term)
    assert sum(r.n_cur for r in rows) == 100
    assert max(r.bin for r in rows if r.n_cur > 0) == 4
