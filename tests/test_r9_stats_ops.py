"""r9 stats operators: Mann-Kendall, Spearman, vocab growth."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from clinical_data_lake_spark.functions.text import vocab_growth
from clinical_data_lake_spark.ml.stats import spearman_corr
from clinical_data_lake_spark.operators.timeseries import mann_kendall


def test_mann_kendall_monotone_series(spark):
    # strictly increasing, no ties: S = n(n-1)/2, varS = n(n-1)(2n+5)/18
    n = 10
    df = spark.createDataFrame(
        [("k", float(i), float(i * 2)) for i in range(n)],
        "k string, x double, y double",
    )
    r = mann_kendall(df, "k", "x", "y").collect()[0]
    assert r.n == n
    assert r.s_stat == n * (n - 1) // 2 == 45
    want_var = n * (n - 1) * (2 * n + 5) / 18.0
    assert r.var_s == pytest.approx(want_var)
    assert r.z == pytest.approx(round((45 - 1) / math.sqrt(want_var), 6))
    # reversed: S = -45, continuity correction flips
    rev = spark.createDataFrame(
        [("k", float(i), float(-3 * i)) for i in range(n)],
        "k string, x double, y double",
    )
    r2 = mann_kendall(rev, "k", "x", "y").collect()[0]
    assert r2.s_stat == -45
    assert r2.z == pytest.approx(round((-45 + 1) / math.sqrt(want_var), 6))


def test_mann_kendall_tie_correction_and_degenerate(spark):
    # y ties: groups {2,2,1} -> tie term = 2*1*9 * 2 groups of 2? ->
    # two groups of size 2: each contributes 2*1*9 = 18
    df = spark.createDataFrame(
        [("k", 1.0, 5.0), ("k", 2.0, 5.0), ("k", 3.0, 7.0),
         ("k", 4.0, 7.0), ("k", 5.0, 9.0)],
        "k string, x double, y double",
    )
    r = mann_kendall(df, "k", "x", "y").collect()[0]
    n = 5
    want_var = (n * (n - 1) * (2 * n + 5) - 2 * (2 * 1 * 9)) / 18.0
    assert r.var_s == pytest.approx(want_var)
    # S: pairs with equal y contribute 0; increasing otherwise
    # pairs: (1,2)=0 (2,3)=+ (2,4)=+ (2,5)=+ (1,3)=+ (1,4)=+ (1,5)=+
    # (3,4)=0 (3,5)=+ (4,5)=+  -> S = 8
    assert r.s_stat == 8
    # constant y: S=0, varS has full tie correction -> may be 0 -> z NULL
    const = spark.createDataFrame(
        [("c", float(i), 4.0) for i in range(4)],
        "k string, x double, y double",
    )
    rc = mann_kendall(const, "k", "x", "y").collect()[0]
    assert rc.s_stat == 0 and rc.z is None


def test_mann_kendall_guard_in_plan(spark):
    big = spark.range(40).select(
        F.lit("k").alias("k"),
        F.col("id").cast("double").alias("x"),
        F.col("id").cast("double").alias("y"),
    )
    spark.sparkContext.setJobGroup("mk_guard_probe", "plan-lock")
    try:
        guarded = mann_kendall(big, "k", "x", "y", max_points=10)
        tracker = spark.sparkContext.statusTracker()
        assert tracker.getJobIdsForGroup("mk_guard_probe") == []
    finally:
        spark.sparkContext.setJobGroup("", "")
    with pytest.raises(Exception, match="quadratic"):
        guarded.collect()


def test_spearman_perfect_monotone_and_ties(spark):
    # any monotone transform -> rho = +1 / -1
    rows = [("g", float(i), math.exp(i / 3.0)) for i in range(12)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    assert spearman_corr(df, ["g"], "x", "y").collect()[0].rho == 1.0
    df2 = spark.createDataFrame(
        [("g", x, -y) for (_, x, y) in rows], "g string, x double, y double"
    )
    assert spearman_corr(df2, ["g"], "x", "y").collect()[0].rho == -1.0
    # hand-computed tie case: x = 1,2,3,4; y = 10,10,20,30
    # avg ranks x: 1,2,3,4 ; y: 1.5,1.5,3,4
    # pearson on ranks = cov/sd: compute expected
    xs = [1.0, 2.0, 3.0, 4.0]
    ys = [1.5, 1.5, 3.0, 4.0]
    n = 4
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    syy = sum(v * v for v in ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    want = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    df3 = spark.createDataFrame(
        [("g", 1.0, 10.0), ("g", 2.0, 10.0), ("g", 3.0, 20.0), ("g", 4.0, 30.0)],
        "g string, x double, y double",
    )
    got = spearman_corr(df3, ["g"], "x", "y").collect()[0]
    assert got.rho == pytest.approx(round(want, 6))
    # constant y -> NULL
    dfc = spark.createDataFrame(
        [("g", float(i), 1.0) for i in range(5)], "g string, x double, y double"
    )
    assert spearman_corr(dfc, ["g"], "x", "y").collect()[0].rho is None


def test_spearman_partition_invariant(spark):
    rows = [("g", float(i % 17), float((i * 7) % 13)) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    a = spearman_corr(df, ["g"], "x", "y").collect()[0].rho
    b = spearman_corr(df.repartition(13), ["g"], "x", "y").collect()[0].rho
    assert a == b


def test_vocab_growth_closed_form(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, source="a", text="x y x z"),
            Row(doc_id=2, source="a", text="x q"),
            Row(doc_id=3, source="b", text="m m m"),
        ]
    )
    rows = {r.source: r for r in vocab_growth(docs, "source", "text").collect()}
    a = rows["a"]
    assert (a.n_tokens, a.vocab, a.hapax) == (6, 4, 3)  # x:3 y:1 z:1 q:1
    assert a.ttr == pytest.approx(round(4 / 6, 6))
    b = rows["b"]
    assert (b.n_tokens, b.vocab, b.hapax) == (3, 1, 0)


def test_cumulative_distinct_first_seen(spark):
    from clinical_data_lake_spark.operators.cohort import cumulative_distinct

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00"), (1, "2024-01-03 10:00:00"),
            (2, "2024-01-01 11:00:00"), (3, "2024-01-02 09:00:00"),
            (3, "2024-01-05 09:00:00"), (4, "2024-01-05 09:00:00"),
        ],
        "user_id int, ts string",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    rows = cumulative_distinct(df).collect()
    got = [(str(r.day), r.new_entities, r.cum_entities) for r in rows]
    assert got == [
        ("2024-01-01", 2, 2), ("2024-01-02", 1, 3), ("2024-01-05", 1, 4),
    ]


def test_sla_rollup_all_quantifier(spark):
    from clinical_data_lake_spark.operators.quality import sla_rollup

    orders = spark.createDataFrame(
        [(1, "O", "2024-01-01"), (2, "O", "2024-01-01"), (3, "F", "2024-01-01")],
        "o_orderkey int, o_orderstatus string, o_orderdate string",
    ).select("o_orderkey", "o_orderstatus",
             F.col("o_orderdate").cast("timestamp").alias("o_orderdate"))
    li = spark.createDataFrame(
        [(1, "2024-01-15"), (1, "2024-02-20"),   # both within 90d -> met
         (2, "2024-01-10"), (2, "2024-06-01"),   # one late -> not met
         (3, "2024-02-01")],                      # met
        "l_orderkey int, l_shipdate string",
    ).select("l_orderkey", F.col("l_shipdate").cast("timestamp").alias("l_shipdate"))
    rows = {r.o_orderstatus: r for r in sla_rollup(orders, li, days=90).collect()}
    assert (rows["O"].n_orders, rows["O"].n_met) == (2, 1)
    assert rows["O"].met_pct == 0.5
    assert (rows["F"].n_orders, rows["F"].n_met) == (1, 1)


def test_cooc_counts_window_and_weights(spark):
    from clinical_data_lake_spark.functions.text import cooccurrence_counts

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="a b a"), Row(doc_id=2, text="a b c")]
    )
    rows = {(r.term_a, r.term_b): r for r in
            cooccurrence_counts(docs, window=2, min_count=1).collect()}
    # doc1 pairs: (a,b,d1) (a,a,d2) (b,a,d1); doc2: (a,b,d1) (a,c,d2) (b,c,d1)
    ab = rows[("a", "b")]
    assert ab.n == 3 and ab.w_sum == 3.0  # three distance-1 pairs
    aa = rows[("a", "a")]
    assert aa.n == 1 and aa.w_sum == 0.5
    ac = rows[("a", "c")]
    assert ac.n == 1 and ac.w_sum == 0.5


def test_khop_min_hop_and_frontier(spark):
    from clinical_data_lake_spark.operators.graph import khop_neighbors

    # path graph 1-2-3-4-5 plus a shortcut 1-4: node 4 is hop 2 via
    # shortcut? no — 1-4 direct edge makes it hop 1; 5 becomes hop 2
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4)], "src int, dst int"
    )
    seeds = spark.createDataFrame([(1,)], "node int")
    got = {r.node: r.hop for r in khop_neighbors(edges, seeds, k=2).collect()}
    assert got == {1: 0, 2: 1, 4: 1, 3: 2, 5: 2}
    # k=1 stops the frontier
    got1 = {r.node: r.hop for r in khop_neighbors(edges, seeds, k=1).collect()}
    assert got1 == {1: 0, 2: 1, 4: 1}
    # isolated seed stays at hop 0
    seeds2 = spark.createDataFrame([(99,)], "node int")
    assert {r.node: r.hop for r in khop_neighbors(edges, seeds2, k=3).collect()} == {99: 0}


def test_forecast_eval_seasonal_naive(spark):
    from clinical_data_lake_spark.operators.timeseries import forecast_eval

    rows = []
    # key "a": day d value = 10 + d (daily), period 2 -> err = 2 always
    for d in range(6):
        rows.append(("a", f"2024-01-0{d+1} 00:00:00", 10.0 + d))
    df = spark.createDataFrame(rows, "k string, ts string, v double").select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    r = forecast_eval(df, "k", "ts", "v", period_days=2).collect()[0]
    assert r.n_evals == 4  # days 3..6 have a 2-day prior
    assert r.mae == 2.0 and r.rmse == 2.0
    # mape = mean(2/12, 2/13, 2/14, 2/15) rounded
    import statistics

    want = round(statistics.mean(
        round(2.0 / a, 9) for a in (12.0, 13.0, 14.0, 15.0)
    ), 6)
    assert r.mape == pytest.approx(want, abs=1e-6)


def test_heavy_hitters_lossless_above_threshold(spark):
    from clinical_data_lake_spark.operators.aggregates import heavy_hitters

    # 10k rows: value "hot" 5%, "warm" 1.2%, long tail of singletons
    rows = (["hot"] * 500 + ["warm"] * 120
            + [f"tail{i}" for i in range(9380)])
    df = spark.createDataFrame([(v,) for v in rows], "v string").repartition(16)
    got = {r.value: (r.cnt, r.share) for r in
           heavy_hitters(df, "v", threshold=0.01).collect()}
    assert got["hot"] == (500, 0.05)
    assert got["warm"] == (120, 0.012)
    # nothing below threshold sneaks in (exact recount filters false
    # candidates) and counts are exact, not estimates
    assert all(cnt >= 100 for cnt, _ in got.values())
    # adversarial partitioning: all hot values crammed into one
    # partition must still surface them
    df1 = spark.createDataFrame([(v,) for v in rows], "v string").coalesce(1)
    got1 = {r.value for r in heavy_hitters(df1, "v", threshold=0.01).collect()}
    assert {"hot", "warm"} <= got1


def test_anova_f_closed_form(spark):
    from clinical_data_lake_spark.ml.stats import anova_f

    # groups with equal means -> F ~ 0; shifted means -> large F
    import statistics

    base = [("a", v) for v in (1.0, 2.0, 3.0)] + \
           [("b", v) for v in (1.0, 2.0, 3.0)] + \
           [("c", v) for v in (1.0, 2.0, 3.0)]
    df = spark.createDataFrame(base, "g string, v double")
    r = anova_f(df, "g", "v").collect()[0]
    assert r.k == 3 and r.n == 9
    assert r.ss_between == pytest.approx(0.0, abs=1e-9)
    assert r.f_stat == pytest.approx(0.0, abs=1e-9)

    shifted = [("a", v) for v in (1.0, 2.0, 3.0)] + \
              [("b", v + 10) for v in (1.0, 2.0, 3.0)] + \
              [("c", v + 20) for v in (1.0, 2.0, 3.0)]
    df2 = spark.createDataFrame(shifted, "g string, v double")
    r2 = anova_f(df2, "g", "v").collect()[0]
    # hand computation: group means 2, 12, 22; grand 12
    # SSB = 3*(100 + 0 + 100) = 600 ; SSW = 3 groups x 2 = 6
    assert r2.ss_between == pytest.approx(600.0, abs=1e-6)
    assert r2.ss_within == pytest.approx(6.0, abs=1e-6)
    want_f = (600.0 / 2) / (6.0 / 6)
    assert r2.f_stat == pytest.approx(round(want_f, 6))
    # degenerate: one group -> NULL
    one = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "g string, v double")
    assert anova_f(one, "g", "v").collect()[0].f_stat is None


def test_fs_em_recovers_planted_mixture(spark):
    """EM on pairs drawn from a known two-class mixture must recover
    m/u (and prevalence) to reasonable accuracy, unsupervised."""
    import random as _r

    from clinical_data_lake_spark.operators.joins import (
        fs_em_weights,
        fs_pattern_counts,
    )

    rnd = _r.Random(13)
    rows = []
    # 20% matches: agree1 w.p. 0.95, agree2 w.p. 0.85
    # 80% non-matches: agree1 w.p. 0.15, agree2 w.p. 0.30
    for _ in range(5000):
        if rnd.random() < 0.2:
            rows.append((rnd.random() < 0.95, rnd.random() < 0.85))
        else:
            rows.append((rnd.random() < 0.15, rnd.random() < 0.30))
    pairs = spark.createDataFrame(rows, "a1 boolean, a2 boolean")
    cols = {"f1": F.col("a1"), "f2": F.col("a2")}
    pat = {tuple(r[c] for c in ("agree_f1", "agree_f2")): r.n_pairs
           for r in fs_pattern_counts(pairs, cols).collect()}
    assert sum(pat.values()) == 5000 and len(pat) == 4
    est = {r.field: r for r in fs_em_weights(pairs, cols).collect()}
    p = est["__p_match__"].m
    assert 0.1 < p < 0.35, p
    assert est["f1"].m > 0.8 and est["f1"].u < 0.3
    assert est["f2"].m > 0.7 and est["f2"].u < 0.45
    # weights consistent with the estimates
    import math

    assert est["f1"].w_agree == pytest.approx(
        round(math.log2(est["f1"].m / est["f1"].u), 6), abs=1e-4
    )
    # determinism: rerun identical
    again = {r.field: r for r in fs_em_weights(pairs, cols).collect()}
    assert {k: (v.m, v.u) for k, v in est.items()} == {
        k: (v.m, v.u) for k, v in again.items()
    }


def test_decompose_daily_identity_and_seasonality(spark):
    from clinical_data_lake_spark.operators.timeseries import decompose_daily

    # 4 weeks of daily data: value = 100 + slot_effect(dow), no trend
    import datetime as _dt

    slot_fx = {0: 5.0, 1: -3.0, 2: 0.0, 3: 2.0, 4: -1.0, 5: -2.0, 6: -1.0}
    rows = []
    d0 = _dt.datetime(2024, 1, 1)
    for i in range(28):
        day = d0 + _dt.timedelta(days=i)
        rows.append(("k", day, 100.0 + slot_fx[day.weekday()]))
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = decompose_daily(df, "k", "ts", "v").collect()
    by_day = {r.day: r for r in out}
    # identity: value = trend + seasonal + remainder where trend defined
    for r in out:
        if r.trend is not None:
            assert abs(r.value - (r.trend + r.seasonal + r.remainder)) < 1e-6
    # flat series: trend ~ 100 (7-day MA cancels the weekly cycle),
    # remainder ~ 0, and seasonal recovers the slot effects (centered:
    # effects already sum to 0 across the week)
    mid = [r for r in out if r.trend is not None]
    assert len(mid) == 28 - 6
    for r in mid:
        assert r.trend == pytest.approx(100.0, abs=1e-6)
        assert r.remainder == pytest.approx(0.0, abs=1e-5)
    seasonals = {r.day.weekday(): r.seasonal for r in mid}
    for dow, fx in slot_fx.items():
        if dow in seasonals:
            assert seasonals[dow] == pytest.approx(fx, abs=1e-5)


def test_json_profile_types_and_presence(spark):
    from clinical_data_lake_spark.operators.quality import json_profile

    df = spark.createDataFrame(
        [
            ('{"a": 1, "b": "x", "c": true}',),
            ('{"a": 2.5, "b": "y"}',),
            ('{"a": 3, "d": [1,2]}',),
            ('{"e": null}',),
        ],
        "js string",
    )
    rows = {(r.key, r.vtype): r for r in json_profile(df, "js").collect()}
    assert rows[("a", "integer")].n == 2
    assert rows[("a", "double")].n == 1
    assert rows[("b", "string")].n == 2
    assert rows[("c", "boolean")].n == 1
    assert ("d", "complex") in rows or ("d", "string") in rows
    assert rows[("e", "null")].n == 1
    assert rows[("b", "string")].presence == 0.5
    assert rows[("b", "string")].n_distinct == 2


def test_forget_keys_cascade_and_audit(spark):
    from clinical_data_lake_spark.operators.quality import forget_keys

    users = spark.createDataFrame([(i, f"u{i}") for i in range(10)], "uid int, name string")
    acts = spark.createDataFrame(
        [(i % 10, i) for i in range(40)], "uid int, act int"
    )
    forget = spark.createDataFrame([(2,), (7,)], "uid int")
    filtered, audit = forget_keys(
        {"users": (users, "uid"), "acts": (acts, "uid")}, forget, "uid"
    )
    assert filtered["users"].filter("uid in (2,7)").count() == 0
    assert filtered["acts"].filter("uid in (2,7)").count() == 0
    rows = {r.table_name: r for r in audit.collect()}
    assert (rows["users"].n_before, rows["users"].n_removed, rows["users"].n_after) == (10, 2, 8)
    assert (rows["acts"].n_before, rows["acts"].n_removed, rows["acts"].n_after) == (40, 8, 32)


def test_dp_noisy_counts_mechanism(spark):
    from clinical_data_lake_spark.operators.aggregates import dp_noisy_counts

    df = spark.createDataFrame(
        [(chr(97 + i % 20),) for i in range(2000)], "g string"
    )
    out = {r.g: r.noisy_count for r in dp_noisy_counts(df, ["g"], epsilon=1.0).collect()}
    # exact count per group is 100; Laplace(1) noise is almost surely
    # within +-15 and NEVER exactly zero for all groups
    assert all(85 < v < 115 for v in out.values())
    assert any(abs(v - 100.0) > 1e-9 for v in out.values())
    # deterministic per seed; different seed -> different noise
    again = {r.g: r.noisy_count for r in dp_noisy_counts(df, ["g"], epsilon=1.0).collect()}
    assert out == again
    other = {r.g: r.noisy_count for r in
             dp_noisy_counts(df, ["g"], epsilon=1.0, seed=7).collect()}
    assert other != out
    # epsilon scales the noise: eps=0.1 -> 10x wider
    wide = {r.g: r.noisy_count for r in
            dp_noisy_counts(df, ["g"], epsilon=0.1).collect()}
    import statistics
    assert statistics.mean(abs(v - 100) for v in wide.values()) > \
        statistics.mean(abs(v - 100) for v in out.values())


def test_proportion_ci_wilson_closed_form(spark):
    from clinical_data_lake_spark.ml.stats import proportion_ci

    # 20 of 80 successes: compare to hand-computed Wilson bounds
    import math

    df = spark.createDataFrame(
        [("g", 1)] * 20 + [("g", 0)] * 60, "g string, f int"
    )
    r = proportion_ci(df, ["g"], F.col("f") == 1).collect()[0]
    z = 1.959963984540054
    n, p = 80.0, 0.25
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    assert (r.n, r.successes, r.p_hat) == (80, 20, 0.25)
    assert r.ci_low == pytest.approx(round(center - half, 6))
    assert r.ci_high == pytest.approx(round(center + half, 6))
    assert 0.0 < r.ci_low < 0.25 < r.ci_high < 1.0


def test_herfindahl_extremes(spark):
    from clinical_data_lake_spark.operators.aggregates import herfindahl

    # monopoly -> 1.0 ; even 4-way split -> 0.25
    mono = spark.createDataFrame([("g", "u1", 5.0)] * 4, "g string, e string, v double")
    r = herfindahl(mono, ["g"], "e", "v").collect()[0]
    assert (r.n_entities, r.hhi) == (1, 1.0)
    even = spark.createDataFrame(
        [("g", f"u{i}", 5.0) for i in range(4)], "g string, e string, v double"
    )
    r2 = herfindahl(even, ["g"], "e", "v").collect()[0]
    assert (r2.n_entities, r2.hhi) == (4, 0.25)
    # count-based variant (value_col=None)
    cnt = herfindahl(even, ["g"], "e").collect()[0]
    assert cnt.hhi == 0.25
