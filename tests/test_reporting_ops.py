"""Analytics additions: trimmed mean, Lorenz curve, multi-touch
attribution credit."""

from __future__ import annotations

import pytest

from clinical_data_lake_spark.operators.aggregates import (
    lorenz_curve,
    trimmed_mean,
)
from clinical_data_lake_spark.operators.windows import attribution_credit


# -- trimmed_mean -------------------------------------------------------


def test_trimmed_mean_closed_form(spark):
    # g: values 1..10, alpha=0.2 -> trim 2 each side -> mean(3..8)=5.5
    df = spark.createDataFrame(
        [("g", float(i), i) for i in range(1, 11)],
        "grp string, x double, id long",
    )
    r = trimmed_mean(df, ["grp"], "x", "id", alpha=0.2).collect()[0]
    assert (r.n, r.n_trimmed) == (10, 4)
    assert r.trimmed_mean == pytest.approx(5.5)


def test_trimmed_mean_alpha_zero_is_mean(spark):
    df = spark.createDataFrame(
        [("g", float(i), i) for i in (1, 2, 100)],
        "grp string, x double, id long",
    )
    r = trimmed_mean(df, ["grp"], "x", "id", alpha=0.0).collect()[0]
    assert r.n_trimmed == 0
    assert r.trimmed_mean == pytest.approx(round(103 / 3, 6))


def test_trimmed_mean_outlier_resistant(spark):
    base = [("g", float(i), i) for i in range(1, 100)]
    spiked = base + [("g", 1e9, 1000)]
    r = trimmed_mean(
        spark.createDataFrame(spiked, "grp string, x double, id long"),
        ["grp"], "x", "id", alpha=0.05,
    ).collect()[0]
    assert r.trimmed_mean < 100  # the spike was trimmed away


def test_trimmed_mean_alpha_validation(spark):
    df = spark.createDataFrame([("g", 1.0, 1)], "grp string, x double, id long")
    with pytest.raises(ValueError):
        trimmed_mean(df, ["grp"], "x", "id", alpha=0.5)


# -- lorenz_curve -------------------------------------------------------


def test_lorenz_uniform_is_diagonal(spark):
    df = spark.createDataFrame(
        [(i, 10.0) for i in range(100)], "id long, x double"
    )
    pts = {r.point: r for r in lorenz_curve(df, "x", "id", n_points=10).collect()}
    for k in range(1, 11):
        assert pts[k / 10].value_share == pytest.approx(k / 10, abs=1e-6)


def test_lorenz_total_concentration(spark):
    # one entity holds everything: shares 0 until the last point
    rows = [(i, 0.0) for i in range(99)] + [(99, 500.0)]
    df = spark.createDataFrame(rows, "id long, x double")
    pts = {r.point: r for r in lorenz_curve(df, "x", "id", n_points=10).collect()}
    assert pts[0.9].value_share == pytest.approx(0.0)
    assert pts[1.0].value_share == pytest.approx(1.0)
    assert pts[1.0].cum_value == pytest.approx(500.0)


def test_lorenz_cum_value_monotone(spark):
    df = spark.createDataFrame(
        [(i, float((i * 13) % 50 + 1)) for i in range(200)],
        "id long, x double",
    )
    rows = sorted(
        lorenz_curve(df, "x", "id", n_points=10).collect(),
        key=lambda r: r.point,
    )
    shares = [r.value_share for r in rows]
    assert shares == sorted(shares)
    assert rows[-1].value_share == pytest.approx(1.0)


# -- attribution_credit -------------------------------------------------


def _ev(uid, sec, etype, eid):
    import datetime

    return (eid, datetime.datetime(2026, 1, 1, 0, 0, sec), uid, etype)


def test_attribution_linear_and_u_closed_form(spark):
    # user 1: view click view purchase  (k=3: linear 1/3 each;
    #         u: 0.4 first view, 0.2 middle click, 0.4 last view)
    # user 2: click purchase            (k=1: 1.0 to click)
    # user 3: view view  (no purchase -> no credit)
    rows = [
        _ev(1, 1, "view", 1), _ev(1, 2, "click", 2), _ev(1, 3, "view", 3),
        _ev(1, 4, "purchase", 4),
        _ev(2, 1, "click", 5), _ev(2, 2, "purchase", 6),
        _ev(3, 1, "view", 7), _ev(3, 2, "view", 8),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r.channel: r for r in attribution_credit(df).collect()}
    assert out["view"].n_touches == 2
    assert out["click"].n_touches == 2
    assert out["view"].credit_linear == pytest.approx(round(2 / 3, 6))
    assert out["click"].credit_linear == pytest.approx(round(1 / 3 + 1.0, 6))
    assert out["view"].credit_u == pytest.approx(0.8)
    assert out["click"].credit_u == pytest.approx(1.2)


def test_attribution_credit_conserved(spark):
    # total credit == number of credited conversions (those with >=1 touch)
    rows = []
    eid = 0
    for u in range(20):
        for s in range(10):
            eid += 1
            et = "purchase" if s % 4 == 3 else ("view" if s % 2 == 0 else "click")
            rows.append(_ev(u, s, et, eid))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = attribution_credit(df).collect()
    total_linear = sum(r.credit_linear for r in out)
    total_u = sum(r.credit_u for r in out)
    # every journey here has >=1 touch; 2 credited conversions per user
    assert total_linear == pytest.approx(40.0, abs=1e-4)
    assert total_u == pytest.approx(40.0, abs=1e-4)


def test_attribution_two_journeys_split(spark):
    # second purchase only credits touches after the first purchase
    rows = [
        _ev(1, 1, "view", 1), _ev(1, 2, "purchase", 2),
        _ev(1, 3, "click", 3), _ev(1, 4, "purchase", 4),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r.channel: r for r in attribution_credit(df).collect()}
    assert out["view"].credit_linear == pytest.approx(1.0)
    assert out["click"].credit_linear == pytest.approx(1.0)
