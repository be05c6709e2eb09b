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


# placebo arm of the same trial: 21 patients, all relapse
PLACEBO = [(1, 1), (1, 1), (2, 1), (2, 1), (3, 1), (4, 1), (4, 1), (5, 1),
           (5, 1), (8, 1), (8, 1), (8, 1), (8, 1), (11, 1), (11, 1), (12, 1),
           (12, 1), (15, 1), (17, 1), (22, 1), (23, 1)]


def _ref_logrank(rows):
    """Independent driver-side log-rank (arm 'a' = group 1)."""
    times = sorted({t for _, t, e in rows if e == 1})
    o1 = e1 = v1 = 0.0
    for t in times:
        n1 = sum(1 for g, d, _ in rows if g == "a" and d >= t)
        n2 = sum(1 for g, d, _ in rows if g == "b" and d >= t)
        d1 = sum(1 for g, d, e in rows if g == "a" and d == t and e == 1)
        d2 = sum(1 for g, d, e in rows if g == "b" and d == t and e == 1)
        d, n = d1 + d2, n1 + n2
        if d == 0:
            continue
        p1 = n1 / n
        o1 += d1
        e1 += d * p1
        if n > 1:
            v1 += d * p1 * (1 - p1) * (n - d) / (n - 1)
    return o1, e1, v1, (o1 - e1) ** 2 / v1


def test_logrank_freireich_trial(spark):
    rows = [("a", t, e) for t, e in SIX_MP] + [("b", t, e) for t, e in PLACEBO]
    df = spark.createDataFrame(rows, ["arm", "duration", "event"])
    got = kaplan_meier  # noqa: F841  (keep import used)
    from clinical_data_lake_spark.ml.stats import logrank_test, pvalue_1dof

    r = logrank_test(df, group_col="arm").head()
    o1, e1, v1, chi2 = _ref_logrank(rows)
    assert r.o1 == o1
    assert r.e1 == pytest.approx(e1, abs=1e-4)
    assert r.v1 == pytest.approx(v1, abs=1e-4)
    assert r.chi2 == pytest.approx(chi2, abs=1e-3)
    # published value for this trial
    assert r.chi2 == pytest.approx(16.79, abs=0.05)
    assert pvalue_1dof(r.chi2) < 0.001


def test_logrank_identical_arms_is_zero(spark):
    rows = [("a", t, e) for t, e in SIX_MP] + [("b", t, e) for t, e in SIX_MP]
    df = spark.createDataFrame(rows, ["arm", "duration", "event"])
    from clinical_data_lake_spark.ml.stats import logrank_test

    r = logrank_test(df, group_col="arm").head()
    assert r.chi2 == pytest.approx(0.0, abs=1e-4)


def test_logrank_rejects_three_arms(spark):
    df = spark.createDataFrame(
        [("a", 1, 1), ("b", 2, 1), ("c", 3, 1)], ["arm", "duration", "event"]
    )
    from clinical_data_lake_spark.ml.stats import logrank_test

    with pytest.raises(ValueError, match="2 arms"):
        logrank_test(df, group_col="arm")


# ------------------------------------------------- incidence/prevalence

def test_incidence_prevalence_closed_form(spark):
    import datetime as _dt

    from clinical_data_lake_spark.operators.cohort import incidence_prevalence

    d = lambda s: _dt.datetime.fromisoformat(s)  # noqa: E731
    ev = spark.createDataFrame(
        [
            # jan: u1 has A (first), u2 has A (first) -> incidence 2/2
            (1, "A", d("2024-01-05T00:00")),
            (2, "A", d("2024-01-20T00:00")),
            # feb: u1 has A again (not incident), u3 has A first time;
            # u2 active with B only
            (1, "A", d("2024-02-01T00:00")),
            (3, "A", d("2024-02-10T00:00")),
            (2, "B", d("2024-02-15T00:00")),
        ],
        ["user_id", "event_type", "ts"],
    )
    out = {(str(r.month), r.event_type): r
           for r in incidence_prevalence(ev).collect()}
    jan_a = out[("2024-01-01", "A")]
    assert (jan_a.n_active, jan_a.n_prevalent, jan_a.n_incident) == (2, 2, 2)
    assert jan_a.prevalence == 1.0 and jan_a.incidence == 1.0
    feb_a = out[("2024-02-01", "A")]
    assert (feb_a.n_active, feb_a.n_prevalent, feb_a.n_incident) == (3, 2, 1)
    assert feb_a.incidence == round(1 / 3, 6)
    feb_b = out[("2024-02-01", "B")]
    assert (feb_b.n_prevalent, feb_b.n_incident) == (1, 1)
