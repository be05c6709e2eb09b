"""Round-10 session-3: quantile treatment effects, binned Wasserstein,
leakage-safe future-activity labels."""

from __future__ import annotations

import pytest

from clinical_data_lake_spark.ml.featurize import future_activity_labels
from clinical_data_lake_spark.ml.stats import (
    quantile_treatment_effects,
    wasserstein_binned,
)


# -- quantile_treatment_effects --------------------------------------------


def test_qte_constant_shift_recovered_everywhere(spark):
    a = [float(i) for i in range(1, 12)]
    rows = [("a", v + 5.0) for v in a] + [("b", v) for v in a]
    df = spark.createDataFrame(rows, "arm string, y double")
    out = quantile_treatment_effects(df, "arm", "a", "b", "y").collect()
    assert len(out) == 5
    for r in out:
        assert r.qte == pytest.approx(5.0)


def test_qte_median_matches_percentile_cont(spark):
    # arm a = 1..4 -> median 2.5 (interpolated); arm b = 10,20 -> 15
    rows = [("a", v) for v in (1.0, 2.0, 3.0, 4.0)] + [
        ("b", 10.0), ("b", 20.0)
    ]
    df = spark.createDataFrame(rows, "arm string, y double")
    out = {
        r.q: r
        for r in quantile_treatment_effects(
            df, "arm", "a", "b", "y", quantiles=(0.5,)
        ).collect()
    }
    assert out[0.5].q_a == pytest.approx(2.5)
    assert out[0.5].q_b == pytest.approx(15.0)
    assert out[0.5].qte == pytest.approx(-12.5)


def test_qte_tail_only_effect_visible_in_tail(spark):
    base = [float(i) for i in range(1, 101)]
    treated = base[:90] + [v * 3 for v in base[90:]]
    rows = [("a", v) for v in treated] + [("b", v) for v in base]
    df = spark.createDataFrame(rows, "arm string, y double")
    out = {
        r.q: r.qte
        for r in quantile_treatment_effects(
            df, "arm", "a", "b", "y", quantiles=(0.5, 0.95)
        ).collect()
    }
    assert abs(out[0.5]) < 1e-6
    assert out[0.95] > 50


# -- wasserstein_binned -----------------------------------------------------


def test_wasserstein_identical_zero(spark):
    rows = [("a", float(v)) for v in range(10)] + [
        ("b", float(v)) for v in range(10)
    ]
    df = spark.createDataFrame(rows, "arm string, y double")
    r = wasserstein_binned(df, "arm", "a", "b", "y", 0.0, 10.0, 10).collect()[0]
    assert r.w1 == pytest.approx(0.0)
    assert r.n_a == 10 and r.n_b == 10


def test_wasserstein_constant_shift_closed_form(spark):
    # point masses at 2.5 vs 7.5 with binwidth 1 -> W1 = 5
    rows = [("a", 2.5)] * 4 + [("b", 7.5)] * 4
    df = spark.createDataFrame(rows, "arm string, y double")
    r = wasserstein_binned(df, "arm", "a", "b", "y", 0.0, 10.0, 10).collect()[0]
    assert r.w1 == pytest.approx(5.0)


def test_wasserstein_clamps_outliers(spark):
    rows = [("a", -100.0), ("b", 100.0)]
    df = spark.createDataFrame(rows, "arm string, y double")
    r = wasserstein_binned(df, "arm", "a", "b", "y", 0.0, 10.0, 10).collect()[0]
    # mass clamps to first vs last bin: 9 bins of gap x width 1
    assert r.w1 == pytest.approx(9.0)


def test_wasserstein_bad_params_raise(spark):
    df = spark.createDataFrame([("a", 1.0)], "arm string, y double")
    with pytest.raises(ValueError):
        wasserstein_binned(df, "arm", "a", "b", "y", 5.0, 5.0, 10)


# -- future_activity_labels --------------------------------------------------


def _ev(spark, rows):
    from pyspark.sql import functions as F

    return spark.createDataFrame(rows, "ts string, user_id long").select(
        F.to_timestamp("ts").alias("ts"), "user_id"
    )


def test_future_labels_closed_form(spark):
    rows = [
        # user 1: active weeks of Jan 1 and Jan 15 (skips Jan 8)
        ("2024-01-01 10:00:00", 1),
        ("2024-01-02 10:00:00", 1),
        ("2024-01-15 10:00:00", 1),
        # user 2: active only week of Jan 1
        ("2024-01-03 10:00:00", 2),
    ]
    out = {
        (r.user, str(r.week)): r
        for r in future_activity_labels(
            _ev(spark, rows), "user_id", "ts", horizon_weeks=1
        ).collect()
    }
    # observed weeks: 2024-01-01, 2024-01-08, 2024-01-15; last dropped
    assert set(w for (_, w) in out) == {"2024-01-01", "2024-01-08"}
    r1w1 = out[(1, "2024-01-01")]
    assert r1w1.active_now is True and r1w1.n_events == 2
    assert r1w1.label is False  # inactive in week of Jan 8
    r1w2 = out[(1, "2024-01-08")]
    assert r1w2.active_now is False and r1w2.label is True
    r2w1 = out[(2, "2024-01-01")]
    assert r2w1.label is False
    # zero-filled: user 2 has a row for the week it was silent
    assert (2, "2024-01-08") in out


def test_future_labels_horizon_2_drops_two_weeks(spark):
    rows = [(f"2024-01-{d:02d} 00:00:00", 1) for d in (1, 8, 15, 22)]
    out = future_activity_labels(
        _ev(spark, rows), "user_id", "ts", horizon_weeks=2
    ).collect()
    weeks = {str(r.week) for r in out}
    assert weeks == {"2024-01-01", "2024-01-08"}
    by_week = {str(r.week): r for r in out}
    assert by_week["2024-01-01"].label is True
