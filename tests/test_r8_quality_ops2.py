"""Units for the r8 batch-8 operators: MAD outliers, Benford audit,
event streaks."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from clinical_data_lake_spark.ml.featurize import mad_outliers
from clinical_data_lake_spark.operators.quality import benford_test
from clinical_data_lake_spark.operators.windows import event_streaks


def test_mad_outliers_resists_the_outlier_itself(spark):
    # 1..9 plus a wild 1000: classic mean/std z would be dragged by
    # the outlier; the MAD z flags it cleanly
    df = spark.createDataFrame(
        [(float(v),) for v in list(range(1, 10)) + [1000]], "x double"
    )
    out = {r.x: r for r in mad_outliers(df, "x").collect()}
    assert out[1000.0].x_is_outlier is True
    assert all(not out[float(v)].x_is_outlier for v in range(1, 10))
    # median 5.5, MAD 2.5 -> z(1000) = 0.6745*(994.5)/2.5
    assert out[1000.0].x_robust_z == pytest.approx(0.6745 * 994.5 / 2.5, abs=1e-3)


def test_mad_outliers_zero_mad_and_null_group(spark):
    df = spark.createDataFrame(
        [("g", 5.0), ("g", 5.0), ("g", 5.0), (None, 1.0), (None, 100.0), (None, 1.0)],
        "grp string, x double",
    )
    out = mad_outliers(df, "x", keys=["grp"]).collect()
    assert len(out) == 6  # NULL-group rows survive (null-safe join)
    g = [r for r in out if r.grp == "g"]
    assert all(r.x_robust_z is None and r.x_is_outlier is False for r in g)


def test_benford_closed_form(spark):
    # values with known leading digits: 1x3, 2x2, 9x1
    vals = [1.5, 10.0, 199.0, 2.0, 25.0, 0.9]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = {r.digit: r for r in benford_test(df, "x").collect()}
    assert len(out) == 9
    assert out[1].n_obs == 3 and out[2].n_obs == 2 and out[9].n_obs == 1
    assert out[3].n_obs == 0  # absent digits present with 0
    assert out[1].exp_p == pytest.approx(math.log10(2), abs=1e-6)
    assert sum(r.n_obs for r in out.values()) == 6  # 0/NULL excluded? none here
    zero = spark.createDataFrame([(0.0,), (None,)], "x double")
    assert sum(r.n_obs for r in benford_test(zero, "x").collect()) == 0


def test_event_streaks_islands(spark):
    rows = [
        (1, 1, "a"), (1, 2, "a"), (1, 3, "b"), (1, 4, "a"), (1, 5, "a"), (1, 6, "a"),
        (2, 1, "a"),
    ]
    ev = spark.createDataFrame(rows, "u int, t int, lbl string")
    out = {(r.u, r.lbl, r.start_t): r.run_len for r in
           event_streaks(ev, "u", ["t"], "lbl").collect()}
    # user 1: runs a(1-2), b(3), a(4-6); user 2: a(1)
    assert out == {(1, "a", 1): 2, (1, "b", 3): 1, (1, "a", 4): 3, (2, "a", 1): 1}
    long_only = event_streaks(ev, "u", ["t"], "lbl", min_len=3).collect()
    assert len(long_only) == 1 and long_only[0].run_len == 3
