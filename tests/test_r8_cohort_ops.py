"""Units for the r8 batch-13 operators: state dwell and cohort LTV."""

from __future__ import annotations

import datetime

import pytest

from clinical_data_lake_spark.operators.cohort import cohort_ltv, state_dwell


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_state_dwell_closed_form(spark):
    rows = [
        (1, 1, _ts("2024-01-01 10:00:00"), "a"),  # 60s in a
        (1, 2, _ts("2024-01-01 10:01:00"), "b"),  # 120s in b
        (1, 3, _ts("2024-01-01 10:03:00"), "a"),  # open-ended -> dropped
        (2, 4, _ts("2024-01-01 00:00:00"), "a"),  # single event -> nothing
    ]
    df = spark.createDataFrame(rows, "user_id int, event_id int, ts timestamp, s string")
    out = {(r.user_id, r.s): r for r in
           state_dwell(df, "user_id", "ts", "s", "event_id").collect()}
    assert set(out) == {(1, "a"), (1, "b")}
    assert out[(1, "a")].total_s == 60 and out[(1, "a")].n_spells == 1
    assert out[(1, "b")].total_s == 120 and out[(1, "b")].mean_s == 120.0


def test_cohort_ltv_curves(spark):
    rows = [
        # user 1 acquired Jan: 10 in Jan, 5 in Feb
        (1, _ts("2024-01-05 00:00:00"), 10.0),
        (1, _ts("2024-02-10 00:00:00"), 5.0),
        # user 2 acquired Jan too: 2 in Jan
        (2, _ts("2024-01-20 00:00:00"), 2.0),
        # user 3 acquired Feb: 7 in Feb
        (3, _ts("2024-02-01 00:00:00"), 7.0),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, v double")
    out = {(str(r.cohort), r.age): r for r in
           cohort_ltv(df, "user_id", "ts", "v").collect()}
    jan0 = out[("2024-01-01", 0)]
    assert jan0.n_active == 2 and jan0.period_value == 12.0 and jan0.cum_value == 12.0
    jan1 = out[("2024-01-01", 1)]
    assert jan1.n_active == 1 and jan1.period_value == 5.0
    assert jan1.cum_value == pytest.approx(17.0)  # cumulative across ages
    feb0 = out[("2024-02-01", 0)]
    assert feb0.n_active == 1 and feb0.cum_value == 7.0


def test_dashboard_assoc_composed_flow(spark):
    from clinical_data_lake_spark.ml.stats import dashboard_assoc

    # labels: 'x' on 3 entities, 'y' on 2, 'z' on 1 -> top2 = (x, y);
    # co-occurrence: entities 1,2 have both
    rows = [
        (1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (4, "z"),
    ]
    df = spark.createDataFrame(rows, "e int, lbl string")
    r = dashboard_assoc(df, "e", "lbl").collect()[0]
    assert (r.cond_a, r.cond_b) == ("x", "y")
    assert (r.n_11, r.n_10, r.n_01, r.n_00) == (2, 1, 0, 1)
    assert r.chi2 > 0

    import pytest as _pt
    one = spark.createDataFrame([(1, "x")], "e int, lbl string")
    with _pt.raises(ValueError, match="at least 2"):
        dashboard_assoc(one, "e", "lbl")
