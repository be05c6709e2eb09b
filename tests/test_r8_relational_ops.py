"""Units for the r8 relational additions: weighted median, rank
fractions, multi-step funnel."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clinical_data_lake_spark.operators.aggregates import weighted_median
from clinical_data_lake_spark.operators.windows import funnel_steps, rank_fractions


def test_weighted_median_closed_form(spark):
    # values 1,2,3 with weights 1,1,10 -> median is 3 (cum 12/2=6 at v=3)
    df = spark.createDataFrame(
        [("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 10.0)],
        "g string, v double, w double",
    )
    r = weighted_median(df, ["g"], "v", "w").collect()[0]
    assert r.weighted_median == 3.0 and r.total_weight == 12.0
    # uniform weights reduce to the lower median
    u = spark.createDataFrame(
        [("g", float(v), 1.0) for v in (1, 2, 3, 4)], "g string, v double, w double"
    )
    assert weighted_median(u, ["g"], "v", "w").collect()[0].weighted_median == 2.0
    # duplicate values collapse before the walk
    d = spark.createDataFrame(
        [("g", 5.0, 1.0)] * 3 + [("g", 1.0, 2.0)], "g string, v double, w double"
    )
    assert weighted_median(d, ["g"], "v", "w").collect()[0].weighted_median == 5.0


def test_rank_fractions_closed_form(spark):
    df = spark.createDataFrame(
        [("a", i, float(i)) for i in range(1, 5)], "g string, i int, v double"
    )
    out = {r.i: r for r in rank_fractions(df, ["g"], ["v", "i"]).collect()}
    assert out[1].pct_rank == 0.0 and out[4].pct_rank == 1.0
    assert out[2].cume_dist == 0.5
    assert [out[i].tile for i in range(1, 5)] == [1, 2, 3, 4]


def test_funnel_steps_ordering_matters(spark):
    # u1 completes in order; u2 has the purchase BEFORE the click
    # (must not count as step 3); u3 stops after view
    rows = [
        (1, 1, "view"), (1, 2, "click"), (1, 3, "purchase"),
        (2, 1, "view"), (2, 5, "click"), (2, 2, "purchase"),
        (3, 1, "view"),
    ]
    ev = spark.createDataFrame(rows, "user_id int, ts int, event_type string")
    out = {r.step_idx: r for r in
           funnel_steps(ev, "user_id", "ts", "event_type",
                        ["view", "click", "purchase"]).collect()}
    assert out[1].n_entities == 3
    assert out[2].n_entities == 2
    assert out[3].n_entities == 1  # only u1: u2's purchase precedes its click
    assert out[2].conv_from_prev == pytest.approx(2 / 3)
    assert out[3].conv_from_prev == pytest.approx(0.5)
    assert out[3].conv_from_first == pytest.approx(1 / 3)


def test_funnel_steps_requires_two_steps(spark):
    ev = spark.createDataFrame([(1, 1, "view")], "user_id int, ts int, event_type string")
    with pytest.raises(ValueError, match="at least 2"):
        funnel_steps(ev, "user_id", "ts", "event_type", ["view"])
