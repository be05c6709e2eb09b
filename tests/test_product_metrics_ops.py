"""brier/ECE, Kendall tau-b, conversion latency, stickiness."""

from __future__ import annotations

import datetime
import itertools
import math

import pytest

from clinical_data_lake_spark.ml.train import brier_ece
from clinical_data_lake_spark.operators.cohort import (
    stickiness,
    time_to_convert,
)
from clinical_data_lake_spark.operators.timeseries import kendall_tau


# -- brier_ece ----------------------------------------------------------


def test_brier_perfect_predictions_zero(spark):
    df = spark.createDataFrame(
        [(1.0, 1), (0.0, 0)] * 20, "score double, label int"
    )
    r = brier_ece(df, "score", "label", n_bins=2).collect()[0]
    assert r.brier == pytest.approx(0.0)
    assert r.ece == pytest.approx(0.0)


def test_brier_closed_form(spark):
    # constant score 0.5, half positives: brier = 0.25, ece = 0
    df = spark.createDataFrame(
        [(0.5, 1), (0.5, 0)] * 10, "score double, label int"
    )
    r = brier_ece(df, "score", "label", n_bins=2).collect()[0]
    assert r.n == 20
    assert r.brier == pytest.approx(0.25)
    assert r.ece == pytest.approx(0.0)


def test_ece_detects_miscalibration(spark):
    # score always 0.9 but only 10% positives: ece ~ 0.8, brier high
    rows = [(0.9, 1)] * 2 + [(0.9, 0)] * 18
    df = spark.createDataFrame(rows, "score double, label int")
    r = brier_ece(df, "score", "label", n_bins=2).collect()[0]
    assert r.ece == pytest.approx(0.8, abs=1e-6)


# -- kendall_tau --------------------------------------------------------


def _py_tau(points):
    c = d = tx = ty = 0
    for (x1, y1), (x2, y2) in itertools.combinations(points, 2):
        p = (x2 - x1) * (y2 - y1)
        if p > 0:
            c += 1
        elif p < 0:
            d += 1
        if x2 == x1:
            tx += 1
        if y2 == y1:
            ty += 1
    n0 = len(points) * (len(points) - 1) // 2
    den = math.sqrt((n0 - tx) * (n0 - ty))
    return c, d, (c - d) / den if den > 0 else None


def test_kendall_tau_matches_reference_with_ties(spark):
    points = [(1.0, 2.0), (2.0, 2.0), (2.0, 5.0), (3.0, 1.0), (4.0, 4.0),
              (5.0, 4.0), (6.0, 7.0)]
    rows = [("k", x, y, i) for i, (x, y) in enumerate(points)]
    df = spark.createDataFrame(rows, "k string, x double, y double, id long")
    r = kendall_tau(df, "k", "x", "y", "id").collect()[0]
    c, d, tau = _py_tau(points)
    assert (r.concordant, r.discordant) == (c, d)
    assert r.tau_b == pytest.approx(round(tau, 6))


def test_kendall_tau_perfect_and_constant(spark):
    rows = [("up", float(i), float(i * 2), i) for i in range(10)]
    rows += [("const", float(i), 3.0, i) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, x double, y double, id long")
    out = {r.k: r for r in kendall_tau(df, "k", "x", "y", "id").collect()}
    assert out["up"].tau_b == pytest.approx(1.0)
    assert out["const"].tau_b is None  # constant y margin


def test_kendall_tau_guard_raises(spark):
    rows = [("k", float(i), float(i), i) for i in range(20)]
    df = spark.createDataFrame(rows, "k string, x double, y double, id long")
    with pytest.raises(Exception, match="kendall_tau: series over"):
        kendall_tau(df, "k", "x", "y", "id", max_points=10).collect()


# -- time_to_convert ----------------------------------------------------


def _e(eid, uid, sec, et):
    return (eid, datetime.datetime(2026, 3, 1, 0, 0, 0)
            + datetime.timedelta(seconds=sec), uid, et)


def test_time_to_convert_closed_form(spark):
    rows = [
        _e(1, 1, 0, "signup"), _e(2, 1, 7200, "purchase"),      # 2h
        _e(3, 2, 0, "signup"), _e(4, 2, 3600, "purchase"),      # 1h
        _e(5, 3, 0, "signup"),                                   # never
        _e(6, 4, 3600, "purchase"), _e(7, 4, 7200, "signup"),   # pre-signup only
        _e(8, 5, 0, "purchase"),                                 # no signup
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    r = time_to_convert(df).collect()[0]
    assert r.n_users == 4          # users 1,2,3,4 signed up; 5 excluded
    assert r.n_converted == 2      # users 1 and 2 only
    assert r.conversion_rate == pytest.approx(0.5)
    assert r.p50_hours == pytest.approx(1.5)
    assert r.p25_hours == pytest.approx(1.25)


def test_time_to_convert_same_instant_counts(spark):
    rows = [_e(1, 1, 0, "signup"), _e(2, 1, 0, "purchase")]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    r = time_to_convert(df).collect()[0]
    assert r.n_converted == 1 and r.p50_hours == pytest.approx(0.0)


# -- stickiness ---------------------------------------------------------


def test_stickiness_closed_form(spark):
    # month 2026-01: user 1 active 2 days, user 2 active 1 day
    # daily actives: d1 -> {1,2}=2, d2 -> {1}=1 ; avg_dau=1.5, mau=2
    rows = [
        _e(1, 1, 0, "view"),
        _e(2, 2, 60, "view"),
        _e(3, 1, 86400, "view"),
        _e(4, 1, 86400 + 60, "click"),  # same user-day, dedups
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    r = stickiness(df).collect()[0]
    assert r.month == "2026-03"
    assert r.avg_dau == pytest.approx(1.5)
    assert r.mau == 2
    assert r.stickiness == pytest.approx(0.75)


def test_stickiness_everyone_every_day_is_one(spark):
    rows = []
    eid = 0
    for day in range(5):
        for u in range(3):
            eid += 1
            rows.append(_e(eid, u, day * 86400, "view"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    r = stickiness(df).collect()[0]
    assert r.stickiness == pytest.approx(1.0)


# -- ols2 ---------------------------------------------------------------


def test_ols2_exact_recovery(spark):
    # y = 2 + 3 x1 - 5 x2 exactly -> coefficients recovered, r2 = 1
    rows = []
    for i in range(40):
        x1, x2 = float(i % 7), float((i * 3) % 5)
        rows.append(("g", 2.0 + 3.0 * x1 - 5.0 * x2, x1, x2))
    from clinical_data_lake_spark.ml.stats import ols2

    df = spark.createDataFrame(rows, "g string, y double, x1 double, x2 double")
    r = ols2(df, "g", "y", "x1", "x2").collect()[0]
    assert r.b0 == pytest.approx(2.0, abs=1e-4)
    assert r.b1 == pytest.approx(3.0, abs=1e-4)
    assert r.b2 == pytest.approx(-5.0, abs=1e-4)
    assert r.r2 == pytest.approx(1.0, abs=1e-6)


def test_ols2_collinear_nulls(spark):
    from clinical_data_lake_spark.ml.stats import ols2

    rows = [("g", float(i), float(i), float(2 * i)) for i in range(20)]
    df = spark.createDataFrame(rows, "g string, y double, x1 double, x2 double")
    r = ols2(df, "g", "y", "x1", "x2").collect()[0]
    assert r.b1 is None and r.b2 is None and r.r2 is None


def test_ols2_matches_numpy(spark):
    import numpy as np

    from clinical_data_lake_spark.ml.stats import ols2

    rng_rows = []
    for i in range(60):
        x1 = float((i * 37) % 11)
        x2 = float((i * 17) % 13)
        noise = float(((i * 7919) % 100) - 50) / 25.0
        rng_rows.append(("g", 1.5 - 2.0 * x1 + 0.75 * x2 + noise, x1, x2))
    df = spark.createDataFrame(
        rng_rows, "g string, y double, x1 double, x2 double"
    )
    r = ols2(df, "g", "y", "x1", "x2").collect()[0]
    x = np.array([[1.0, a, b] for _, _, a, b in rng_rows])
    yv = np.array([y for _, y, _, _ in rng_rows])
    beta = np.linalg.lstsq(x, yv, rcond=None)[0]
    assert r.b0 == pytest.approx(beta[0], abs=1e-3)
    assert r.b1 == pytest.approx(beta[1], abs=1e-3)
    assert r.b2 == pytest.approx(beta[2], abs=1e-3)


# -- bigram_lm_cross_scores ---------------------------------------------


def test_lm_cross_backoff_on_unseen(spark):
    from clinical_data_lake_spark.functions.text import (
        bigram_lm_cross_scores,
    )
    import math

    train = spark.createDataFrame(
        [(1, "a b a b a b")], "doc_id long, text string"
    )
    score = spark.createDataFrame(
        [(10, "a b"), (11, "z q")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in bigram_lm_cross_scores(train, score).collect()}
    # train counts: c(a b)=3, c(a)=3, c(b)=3, V=2
    assert out[10].avg_logprob == pytest.approx(
        round(math.log((3 + 0.5) / (3 + 0.5 * 2)), 6)
    )
    # fully unseen: (0+0.5)/(0+0.5*2) = 0.5
    assert out[11].avg_logprob == pytest.approx(round(math.log(0.5), 6))


def test_lm_cross_in_domain_scores_higher(spark):
    from clinical_data_lake_spark.functions.text import (
        bigram_lm_cross_scores,
    )

    train = spark.createDataFrame(
        [(i, "the quick brown fox jumps") for i in range(5)],
        "doc_id long, text string",
    )
    score = spark.createDataFrame(
        [(100, "the quick brown fox"), (101, "totally novel phrasing here")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bigram_lm_cross_scores(train, score).collect()}
    assert out[100].avg_logprob > out[101].avg_logprob


# -- rmst ---------------------------------------------------------------


def test_rmst_no_events_equals_tau(spark):
    # everyone censored beyond tau: S=1 through tau -> RMST = tau
    subj = spark.createDataFrame(
        [(0, 50.0, 0)] * 5, "arm int, duration double, event int"
    )
    from clinical_data_lake_spark.ml.stats import rmst

    r = rmst(subj, 30.0, "duration", "event", ["arm"]).collect()[0]
    assert r.rmst == pytest.approx(30.0)


def test_rmst_closed_form(spark):
    # 4 subjects, events at t=10 (2 of 4) and t=20 (1 of 2), one
    # censored at 20. S: [0,10)=1, [10,20)=0.5, [20,30)=0.25
    # RMST(30) = 10 + 0.5*10 + 0.25*10 = 17.5
    subj = spark.createDataFrame(
        [(0, 10.0, 1), (0, 10.0, 1), (0, 20.0, 1), (0, 20.0, 0)],
        "arm int, duration double, event int",
    )
    from clinical_data_lake_spark.ml.stats import rmst

    r = rmst(subj, 30.0, "duration", "event", ["arm"]).collect()[0]
    assert r.rmst == pytest.approx(17.5)


def test_rmst_truncates_beyond_tau(spark):
    # event at 40 is beyond tau=30: curve is flat 1.0 through tau
    subj = spark.createDataFrame(
        [(0, 40.0, 1), (0, 40.0, 0)], "arm int, duration double, event int"
    )
    from clinical_data_lake_spark.ml.stats import rmst

    r = rmst(subj, 30.0, "duration", "event", ["arm"]).collect()[0]
    assert r.rmst == pytest.approx(30.0)


# -- fd_check -----------------------------------------------------------


def test_fd_check_holds_and_violates(spark):
    from clinical_data_lake_spark.operators.quality import fd_check

    df = spark.createDataFrame(
        [(1, "a", "x"), (1, "a", "y"), (2, "b", "z"), (2, "b", "z")],
        "k int, good string, bad string",
    )
    out = {r.dependent: r for r in fd_check(df, [("k", "good"), ("k", "bad")]).collect()}
    assert out["good"].n_violating_keys == 0
    assert out["good"].violation_rate == 0.0
    assert out["bad"].n_violating_keys == 1  # k=1 -> {x, y}
    assert out["bad"].max_variants == 2
    assert out["bad"].violation_rate == pytest.approx(0.5)


def test_fd_check_null_is_a_variant(spark):
    from clinical_data_lake_spark.operators.quality import fd_check

    df = spark.createDataFrame(
        [(1, "x"), (1, None)], "k int, v string"
    )
    r = fd_check(df, [("k", "v")]).collect()[0]
    assert r.n_violating_keys == 1


# -- bpe_encode ---------------------------------------------------------


def _py_bpe_encode(word, merges):
    syms = list(word) + ["</w>"]
    for _, left, right in sorted(merges):
        out = []
        for s in syms:
            if out and out[-1] == left and s == right:
                out[-1] = left + right
            else:
                out.append(s)
        syms = out
    return syms


def test_bpe_encode_matches_python_reference(spark):
    from clinical_data_lake_spark.llm.corpus import bpe_encode, bpe_train

    docs = spark.createDataFrame(
        [(1, "low lower lowest low low"), (2, "new newer newest new")],
        "doc_id long, text string",
    )
    merges_full = bpe_train(docs, n_merges=6)
    merges = [(r, lft, rgt) for r, lft, rgt, _ in merges_full]
    out = {r.doc_id: r for r in bpe_encode(docs, merges).collect()}
    for did, textv in [(1, "low lower lowest low low"),
                       (2, "new newer newest new")]:
        words = textv.split()
        want_tokens = sum(len(_py_bpe_encode(w, merges)) for w in words)
        assert out[did].n_words == len(words)
        assert out[did].n_tokens == want_tokens, did


def test_bpe_encode_no_merges_is_chars(spark):
    from clinical_data_lake_spark.llm.corpus import bpe_encode

    docs = spark.createDataFrame([(1, "ab c")], "doc_id long, text string")
    r = bpe_encode(docs, []).collect()[0]
    # 'ab' -> a b </w> (3), 'c' -> c </w> (2)
    assert r.n_tokens == 5 and r.n_words == 2


# -- pdc_adherence ------------------------------------------------------


def test_pdc_closed_form(spark):
    from clinical_data_lake_spark.operators.cohort import pdc_adherence

    # window [0, 30); supplies [0,7) and [5,12) overlap -> covered 12;
    # [20,27) adds 7 -> 19 covered; pdc = 19/30
    rows = [
        (1, 0, 7, 0, 30),
        (1, 5, 12, 0, 30),
        (1, 20, 27, 0, 30),
    ]
    df = spark.createDataFrame(rows, "k int, s int, e int, ws int, we int")
    r = pdc_adherence(df, "k", "s", "e", "ws", "we").collect()[0]
    assert (r.window_days, r.covered_days) == (30, 19)
    assert r.pdc == pytest.approx(round(19 / 30, 6))


def test_pdc_clips_to_window(spark):
    from clinical_data_lake_spark.operators.cohort import pdc_adherence

    # supply [25, 40) clipped to window end 30 -> 5 days
    df = spark.createDataFrame(
        [(1, 25, 40, 0, 30)], "k int, s int, e int, ws int, we int"
    )
    r = pdc_adherence(df, "k", "s", "e", "ws", "we").collect()[0]
    assert r.covered_days == 5


def test_pdc_duplicate_fills_not_double_counted(spark):
    from clinical_data_lake_spark.operators.cohort import pdc_adherence

    df = spark.createDataFrame(
        [(1, 0, 7, 0, 30), (1, 0, 7, 0, 30)],
        "k int, s int, e int, ws int, we int",
    )
    r = pdc_adherence(df, "k", "s", "e", "ws", "we").collect()[0]
    assert r.covered_days == 7


# -- person_time_rate ---------------------------------------------------


def test_person_time_closed_form(spark):
    from clinical_data_lake_spark.operators.cohort import person_time_rate

    # 2 subjects, 100 + 300 days, 4 events total: 1000*4/400 = 10 per
    # 1000 person-days
    df = spark.createDataFrame(
        [("a", 100.0, 1), ("a", 300.0, 3)], "g string, t double, e int"
    )
    r = person_time_rate(df, "t", "e", ["g"]).collect()[0]
    assert (r.n_subjects, r.n_events) == (2, 4)
    assert r.person_time == pytest.approx(400.0)
    assert r.rate == pytest.approx(10.0)
    assert r.rate_lo < 10.0 < r.rate_hi


def test_person_time_zero_events_no_ci(spark):
    from clinical_data_lake_spark.operators.cohort import person_time_rate

    df = spark.createDataFrame([("a", 50.0, 0)], "g string, t double, e int")
    r = person_time_rate(df, "t", "e", ["g"]).collect()[0]
    assert r.rate == 0.0
    assert r.rate_lo is None and r.rate_hi is None


# -- funnel_steps max_gap_s / header_detail_check -----------------------


def test_funnel_timeboxed_drops_slow_step(spark):
    from clinical_data_lake_spark.operators.windows import funnel_steps

    rows = [
        _e(1, 1, 0, "view"), _e(2, 1, 100, "click"),          # fast
        _e(3, 2, 0, "view"), _e(4, 2, 90000, "click"),        # >1 day
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r.step: r for r in funnel_steps(
        df, "user_id", "ts", "event_type", ["view", "click"],
        max_gap_s=86400,
    ).collect()}
    assert out["view"].n_entities == 2
    assert out["click"].n_entities == 1  # user 2's click was too late


def test_funnel_unbounded_unchanged(spark):
    from clinical_data_lake_spark.operators.windows import funnel_steps

    rows = [
        _e(1, 1, 0, "view"), _e(2, 1, 100, "click"),
        _e(3, 2, 0, "view"), _e(4, 2, 90000, "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r.step: r for r in funnel_steps(
        df, "user_id", "ts", "event_type", ["view", "click"]
    ).collect()}
    assert out["click"].n_entities == 2


def test_header_detail_check_closed_form(spark):
    import pyspark.sql.functions as SF

    from clinical_data_lake_spark.operators.quality import (
        header_detail_check,
    )

    h = spark.createDataFrame(
        [(1, 100.0), (2, 50.0), (3, 10.0)], "k int, total double"
    )
    d = spark.createDataFrame(
        [(1, 60.0), (1, 40.0), (2, 49.995)], "k int, amt double"
    )
    out = {r.k: r for r in header_detail_check(
        h, d, "k", "total", SF.col("amt"), tolerance=0.01
    ).collect()}
    assert out[1].balanced and out[1].abs_diff == 0.0
    assert out[2].balanced  # within tolerance
    assert not out[3].balanced and out[3].n_lines == 0
    assert out[3].detail_total == 0.0
