"""Units for the Kaplan-Meier estimator — the textbook 6-MP arm of the
Freireich (1963) leukemia trial, plus degenerate curves.
"""

from __future__ import annotations

import pytest

from clinical_data_lake_spark.ml.stats import kaplan_meier

# (duration_weeks, event): the classic 6-MP remission data — 9 relapses,
# 12 censored, n=21
SIX_MP = [
    (6, 1), (6, 1), (6, 1), (7, 1), (10, 1), (13, 1), (16, 1), (22, 1), (23, 1),
    (6, 0), (9, 0), (10, 0), (11, 0), (17, 0), (19, 0), (20, 0), (25, 0),
    (32, 0), (32, 0), (34, 0), (35, 0),
]

# published KM values at the event times
WANT = {
    6: 0.857143, 7: 0.806723, 10: 0.752941, 13: 0.690196,
    16: 0.627451, 22: 0.537815, 23: 0.448179,
}


def test_textbook_six_mp_curve(spark):
    df = spark.createDataFrame(SIX_MP, ["duration", "event"])
    out = {r.t: r for r in kaplan_meier(df).collect()}
    for t, s in WANT.items():
        assert out[t].survival == pytest.approx(s, abs=5e-5), f"t={t}"
    # risk-set bookkeeping at the first event time
    assert out[6].n_risk == 21 and out[6].n_event == 3 and out[6].n_censor == 1
    # censoring-only times keep the curve flat (t=9 sits after the
    # t=7 relapse, so it carries S(7))
    assert out[9].n_event == 0
    assert out[9].survival == out[7].survival


def test_all_censored_curve_stays_at_one(spark):
    df = spark.createDataFrame([(t, 0) for t in (1, 2, 3)], ["duration", "event"])
    assert all(r.survival == 1.0 for r in kaplan_meier(df).collect())


def test_everyone_events_at_last_time_hits_zero(spark):
    df = spark.createDataFrame([(1, 1), (2, 1), (2, 1)], ["duration", "event"])
    out = {r.t: r.survival for r in kaplan_meier(df).collect()}
    assert out[1] == pytest.approx(2 / 3, abs=1e-5)
    assert out[2] == 0.0  # factor hits exactly 0 -> explicit 0, no ln(0)


def test_grouped_arms_are_independent(spark):
    rows = [("a", t, e) for t, e in SIX_MP] + [("b", 5, 1), ("b", 8, 0)]
    df = spark.createDataFrame(rows, ["arm", "duration", "event"])
    out = kaplan_meier(df, group_cols=["arm"]).collect()
    a = {r.t: r.survival for r in out if r.arm == "a"}
    b = {r.t: r.survival for r in out if r.arm == "b"}
    for t, s in WANT.items():
        assert a[t] == pytest.approx(s, abs=5e-5)
    assert b[5] == pytest.approx(0.5, abs=1e-6)
    assert b[8] == pytest.approx(0.5, abs=1e-6)  # censoring keeps it flat
