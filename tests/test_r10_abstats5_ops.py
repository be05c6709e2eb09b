"""Round-10 session-3: Welch t, paired sign test, event-study curve."""

from __future__ import annotations

import math

import pytest

from clinical_data_lake_spark.ml.stats import sign_test, welch_t
from clinical_data_lake_spark.operators.cohort import event_study


# -- welch_t --------------------------------------------------------------


def test_welch_t_matches_python_reference(spark):
    a = [1.0, 2.0, 3.0, 4.0, 10.0]
    b = [2.0, 2.5, 3.0]
    rows = [("g", "a", v) for v in a] + [("g", "b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, arm string, y double")
    r = welch_t(df, ["g"], "arm", "a", "b", "y").collect()[0]

    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    va = sum((v - ma) ** 2 for v in a) / (na - 1)
    vb = sum((v - mb) ** 2 for v in b) / (nb - 1)
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    dof = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    assert (r.n_a, r.n_b) == (5, 3)
    assert r.mean_a == pytest.approx(ma, abs=1e-6)
    assert r.t == pytest.approx(t, abs=1e-4)
    assert r.df == pytest.approx(dof, abs=1e-3)
    assert r.var_ratio == pytest.approx(va / vb, abs=1e-4)


def test_welch_t_identical_arms_t_zero(spark):
    rows = [("g", arm, v) for arm in ("a", "b") for v in (1.0, 2.0, 3.0)]
    df = spark.createDataFrame(rows, "g string, arm string, y double")
    r = welch_t(df, ["g"], "arm", "a", "b", "y").collect()[0]
    assert r.t == pytest.approx(0.0)
    assert r.var_ratio == pytest.approx(1.0)


def test_welch_t_tiny_arm_null(spark):
    rows = [("g", "a", 1.0), ("g", "b", 2.0), ("g", "b", 3.0)]
    df = spark.createDataFrame(rows, "g string, arm string, y double")
    r = welch_t(df, ["g"], "arm", "a", "b", "y").collect()[0]
    assert r.t is None and r.df is None


def test_welch_t_other_arms_ignored(spark):
    rows = [
        ("g", "a", 1.0), ("g", "a", 2.0),
        ("g", "b", 1.0), ("g", "b", 2.0),
        ("g", "zzz", 99.0),
    ]
    df = spark.createDataFrame(rows, "g string, arm string, y double")
    r = welch_t(df, ["g"], "arm", "a", "b", "y").collect()[0]
    assert r.n_a == 2 and r.n_b == 2


# -- sign_test ------------------------------------------------------------


def test_sign_test_closed_form(spark):
    # 6 pos, 2 neg, 1 tie: z = (|6-2|-1)/sqrt(8)
    rows = (
        [("g", 2.0, 1.0)] * 6 + [("g", 1.0, 2.0)] * 2 + [("g", 1.0, 1.0)]
    )
    df = spark.createDataFrame(rows, "g string, x double, y double")
    r = sign_test(df, ["g"], "x", "y").collect()[0]
    assert (r.n_pos, r.n_neg, r.n_tie) == (6, 2, 1)
    assert r.share_pos == pytest.approx(0.75)
    assert r.z == pytest.approx(round(3 / math.sqrt(8), 6))


def test_sign_test_negative_direction(spark):
    rows = [("g", 1.0, 2.0)] * 5 + [("g", 2.0, 1.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    r = sign_test(df, ["g"], "x", "y").collect()[0]
    assert r.z == pytest.approx(round(-3 / math.sqrt(6), 6))


def test_sign_test_all_ties_null(spark):
    df = spark.createDataFrame(
        [("g", 1.0, 1.0)] * 3, "g string, x double, y double"
    )
    r = sign_test(df, ["g"], "x", "y").collect()[0]
    assert r.z is None and r.n_tie == 3


# -- event_study ----------------------------------------------------------


def _ev(spark, rows):
    from pyspark.sql import functions as F

    return spark.createDataFrame(rows, "ts string, user_id long, event_type string").select(
        F.to_timestamp("ts").alias("ts"), "user_id", "event_type"
    )


def test_event_study_closed_form(spark):
    rows = [
        # user 1 signs up (anchor) on Jan 10
        ("2024-01-10 00:00:00", 1, "signup"),
        # outcomes: 2 in week 0, 1 in week 1, 1 in week -1
        ("2024-01-10 05:00:00", 1, "purchase"),
        ("2024-01-12 00:00:00", 1, "purchase"),
        ("2024-01-18 00:00:00", 1, "purchase"),
        ("2024-01-05 00:00:00", 1, "purchase"),
        # user 2 anchors Jan 15, no purchases at all
        ("2024-01-15 00:00:00", 2, "signup"),
        # a never-anchored user's purchases are excluded
        ("2024-01-11 00:00:00", 3, "purchase"),
    ]
    out = {
        r.rel_week: r
        for r in event_study(
            _ev(spark, rows), "user_id", "ts", "signup", "purchase",
            max_lag_weeks=1,
        ).collect()
    }
    assert set(out) == {-1, 0, 1}
    assert all(r.n_users == 2 for r in out.values())
    assert out[0].n_events == 2 and out[0].mean_events == pytest.approx(1.0)
    assert out[1].n_events == 1 and out[1].mean_events == pytest.approx(0.5)
    assert out[-1].n_events == 1


def test_event_study_negative_day_floors_to_prior_week(spark):
    rows = [
        ("2024-01-10 00:00:00", 1, "signup"),
        # one day before anchor -> week -1, not week 0
        ("2024-01-09 23:00:00", 1, "purchase"),
    ]
    out = {
        r.rel_week: r.n_events
        for r in event_study(
            _ev(spark, rows), "user_id", "ts", "signup", "purchase",
            max_lag_weeks=1,
        ).collect()
    }
    assert out[-1] == 1 and out[0] == 0


def test_event_study_first_anchor_wins(spark):
    rows = [
        ("2024-01-10 00:00:00", 1, "signup"),
        ("2024-01-20 00:00:00", 1, "signup"),
        ("2024-01-11 00:00:00", 1, "purchase"),
    ]
    out = {
        r.rel_week: r.n_events
        for r in event_study(
            _ev(spark, rows), "user_id", "ts", "signup", "purchase",
            max_lag_weeks=1,
        ).collect()
    }
    # purchase lands in week 0 of the FIRST signup
    assert out[0] == 1
