"""Gap-fill / LOCF semantics on planted sparse series (the sf testdata
exercises the operator at volume; these pin the per-cell behavior)."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from clinical_data_lake_spark.operators.timeseries import resample_daily


def _ts(day: int, hour: int = 12) -> datetime.datetime:
    return datetime.datetime(2024, 3, day, hour, 0, 0)


def test_resample_daily_fills_gaps_and_carries(spark):
    events = spark.createDataFrame(
        [
            Row(user_id=1, ts=_ts(1), value=10.0),
            Row(user_id=1, ts=_ts(1, 13), value=2.5),
            # day 2 and 3 silent
            Row(user_id=1, ts=_ts(4), value=7.0),
            Row(user_id=2, ts=_ts(5), value=1.0),
        ]
    )
    out = {
        (r.user_id, r.day.isoformat()): r
        for r in resample_daily(events).collect()
    }
    assert len(out) == 5  # user 1: days 1-4; user 2: day 5

    d1 = out[(1, "2024-03-01")]
    assert (d1.n_events, d1.day_sum, d1.locf_sum) == (2, 12.5, 12.5)
    for gap_day in ("2024-03-02", "2024-03-03"):
        g = out[(1, gap_day)]
        assert g.n_events == 0 and g.day_sum is None
        assert g.locf_sum == 12.5  # carried from day 1
    d4 = out[(1, "2024-03-04")]
    assert (d4.n_events, d4.day_sum, d4.locf_sum) == (1, 7.0, 7.0)

    b = out[(2, "2024-03-05")]
    assert (b.n_events, b.day_sum, b.locf_sum) == (1, 1.0, 1.0)


def test_resample_daily_single_day_key_is_one_row(spark):
    events = spark.createDataFrame(
        [Row(user_id=9, ts=_ts(10), value=3.0), Row(user_id=9, ts=_ts(10, 23), value=4.0)]
    )
    rows = resample_daily(events).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_events, r.day_sum, r.locf_sum) == (2, 7.0, 7.0)


def test_ewma_matches_pandas_adjust_true(spark):
    import pandas as pd
    from clinical_data_lake_spark.operators.timeseries import ewma

    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    df = spark.createDataFrame([Row(k=1, t=i, v=v) for i, v in enumerate(vals)])
    got = [
        round(r.ewma, 9)
        for r in ewma(df, "k", "t", "v", alpha=0.3).orderBy("t").collect()
    ]
    want = [round(x, 9) for x in pd.Series(vals).ewm(alpha=0.3, adjust=True).mean()]
    assert got == want


def test_ewma_long_key_matches_pandas_past_old_horizon(spark):
    """5,000-row key: the block-rescaled cumsums must smooth the whole
    series (the previous single-cumsum form overflowed a double and
    went NULL past ~1990 rows at alpha=0.3). Compared against pandas
    ewm(adjust=True) at 1e-12 relative error — the closed form and the
    pandas recurrence round differently in the last couple of bits, so
    literal bit equality between the two ALGORITHMS is not defined;
    1e-12 is ~4 orders tighter than the certified 6-decimal output."""
    import pandas as pd
    from clinical_data_lake_spark.operators.timeseries import ewma

    rng = [(i * 1103515245 + 12345) % 1000 / 100.0 for i in range(5000)]
    df = spark.createDataFrame([Row(k=1, t=i, v=v) for i, v in enumerate(rng)])
    got = [
        r.ewma for r in ewma(df, "k", "t", "v", alpha=0.3).orderBy("t").collect()
    ]
    want = pd.Series(rng).ewm(alpha=0.3, adjust=True).mean().tolist()
    assert all(g is not None for g in got), "NULLs: horizon regression"
    worst = max(abs(g - w) / max(abs(w), 1e-30) for g, w in zip(got, want))
    assert worst < 1e-12, f"max relative error {worst}"


def test_ewma_is_per_key(spark):
    from clinical_data_lake_spark.operators.timeseries import ewma

    df = spark.createDataFrame(
        [Row(k=1, t=0, v=10.0), Row(k=1, t=1, v=0.0), Row(k=2, t=0, v=5.0)]
    )
    out = {(r.k, r.t): r.ewma for r in ewma(df, "k", "t", "v").collect()}
    assert out[(2, 0)] == 5.0            # key 2 unaffected by key 1
    assert out[(1, 0)] == 10.0
    assert 0.0 < out[(1, 1)] < 10.0


def test_rolling_zscore_matches_pandas(spark):
    """z of each value vs the mean/std (ddof=1) of the previous n rows,
    NULL below min_periods or on a constant window."""
    import pandas as pd
    from clinical_data_lake_spark.operators.windows import rolling_zscore

    vals = [5.0, 5.0, 5.0, 9.0, 1.0, 5.0, 7.0, 3.0, 5.0, 50.0]
    df = spark.createDataFrame(
        [Row(k=1, t=i, e=i, v=v) for i, v in enumerate(vals)]
    )
    got = {
        r.t: r.z
        for r in rolling_zscore(
            df, "k", ["t", "e"], "v", n=4, min_periods=3, alias="z"
        ).collect()
    }
    s = pd.Series(vals)
    roll = s.rolling(4, min_periods=3).agg(["mean", "std"]).shift(1)
    for i in range(len(vals)):
        m, sd = roll["mean"].iloc[i], roll["std"].iloc[i]
        if pd.isna(m) or pd.isna(sd) or sd == 0:
            assert got[i] is None, (i, got[i])
        else:
            assert got[i] == round((vals[i] - m) / sd, 6), i
    # the planted outlier scores extreme
    assert got[9] is not None and got[9] > 5


def test_compact_table_merges_small_files(spark, tmp_path):
    from clinical_data_lake_spark import catalog

    path = str(tmp_path / "many_small")
    spark.range(0, 10_000).selectExpr("id", "id * 2 AS v").repartition(
        37
    ).write.parquet(path)
    import glob
    before = len(glob.glob(path + "/part-*"))
    assert before == 37
    n = catalog.compact_table(spark, path, target_file_mb=256)
    assert n == 1  # tiny table -> single file
    after = len(glob.glob(path + "/part-*"))
    assert after == 1
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.agg(F.sum("v")).collect()[0][0] == 99990000
    import os
    assert not os.path.exists(path + ".bak") and not os.path.exists(path + ".staging")


def test_merge_intervals_islands_and_nesting(spark):
    from clinical_data_lake_spark.operators.timeseries import merge_intervals

    rows = [
        Row(k=1, s=0, e=10),
        Row(k=1, s=5, e=7),    # nested inside [0,10]
        Row(k=1, s=10, e=15),  # touching: merges
        Row(k=1, s=20, e=25),  # gap: new island
        Row(k=2, s=0, e=1),
    ]
    out = sorted(
        (r.k, r.start, r.end, r.n_merged)
        for r in merge_intervals(spark.createDataFrame(rows), "k", "s", "e").collect()
    )
    assert out == [(1, 0, 15, 3), (1, 20, 25, 1), (2, 0, 1, 1)]


def test_merge_intervals_long_chain_via_running_max(spark):
    """A long interval spanning several later short ones must absorb
    them all — the case a lag(end)-based island flag gets wrong."""
    from clinical_data_lake_spark.operators.timeseries import merge_intervals

    rows = [Row(k=1, s=0, e=100)] + [
        Row(k=1, s=i * 10, e=i * 10 + 5) for i in range(1, 9)
    ]
    out = merge_intervals(spark.createDataFrame(rows), "k", "s", "e").collect()
    assert len(out) == 1 and out[0].start == 0 and out[0].end == 100
    assert out[0].n_merged == 9


def test_time_weighted_avg_closed_form(spark):
    import datetime as dt

    from clinical_data_lake_spark.operators.timeseries import time_weighted_avg

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 10.0),
        (1, t0 + dt.timedelta(seconds=10), 20.0),
        (1, t0 + dt.timedelta(seconds=40), 99.0),  # final reading: no weight
        (2, t0, 7.0),                               # single reading
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = {r.user_id: r for r in time_weighted_avg(df).collect()}
    # user 1: 10.0 held 10s, 20.0 held 30s -> (100 + 600) / 40 = 17.5
    assert out[1].n_obs == 3
    assert out[1].span_s == 40.0
    assert out[1].twa == 17.5
    # plain AVG would say 43.0 — the whole point of time weighting
    assert out[2].n_obs == 1 and out[2].span_s == 0.0 and out[2].twa == 7.0


def test_retention_matrix_closed_form(spark):
    import datetime as dt

    from clinical_data_lake_spark.operators.cohort import retention_matrix

    mon1 = dt.datetime(2024, 1, 1, 12)   # Monday
    mon2 = mon1 + dt.timedelta(weeks=1)
    rows = [
        # cohort week 1: users 1, 2; user 1 returns in week 2
        (1, mon1), (2, mon1), (1, mon2),
        # cohort week 2: user 3
        (3, mon2),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {(str(r.cohort_week), r.age_weeks): r for r in retention_matrix(df).collect()}
    w1, w2 = "2024-01-01", "2024-01-08"
    assert out[(w1, 0)].n_active == 2 and out[(w1, 0)].cohort_size == 2
    assert out[(w1, 0)].retention == 1.0
    assert out[(w1, 1)].n_active == 1 and out[(w1, 1)].retention == 0.5
    assert out[(w2, 0)].n_active == 1 and out[(w2, 0)].cohort_size == 1
    assert len(out) == 3


def test_ngram_probe_matches_symmetric_jaccard(spark):
    """The asymmetric probe must agree exactly with the symmetric
    all-pairs operator restricted to probe-involving pairs."""
    from clinical_data_lake_spark.io import read_table
    from clinical_data_lake_spark.llm.dedup import (
        ngram_jaccard_pairs,
        ngram_probe_pairs,
    )
    from conftest import SF_SMALL

    docs = read_table(spark, SF_SMALL, "documents")
    probe = docs.filter("doc_id < 20")
    got = sorted(
        (r.doc_id, r.probe_id, round(r.jaccard, 6))
        for r in ngram_probe_pairs(docs, probe, threshold=0.1).collect()
    )
    sym = ngram_jaccard_pairs(docs, threshold=0.1).collect()
    want = sorted(
        (b, a, round(j, 6))
        for r in sym
        for a, b, j in [(r.doc_a, r.doc_b, r.jaccard)]
        for a, b in ([(a, b)] if a < 20 else []) + ([(b, a)] if b < 20 else [])
    )
    assert got == want
    assert got, "fixture has no near-dup probe pairs"
    assert all(d != p for d, p, _ in got)  # self-pairs excluded


def test_ngram_probe_cap_matches_filtered_reference(spark):
    """max_probe_freq drops probe stop-shingles from BOTH sides'
    statistics: the capped output equals a brute-force jaccard over
    shingle sets with those shingles removed."""
    import re

    from clinical_data_lake_spark.llm.dedup import ngram_probe_pairs

    boiler = "all rights reserved by the corpus"
    docs = [
        (i, f"{boiler} unique words number {i} alpha beta gamma delta {i}")
        for i in range(6)
    ] + [(10, "alpha beta gamma delta epsilon unique words number 1")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    probe = df.filter("doc_id < 6")

    def sh(t):
        w = re.sub(r"\s+", " ", t.lower().strip()).split(" ")
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    sets = {d: sh(t) for d, t in docs}
    cap = 3
    from collections import Counter

    pf = Counter(s for d, t in docs if d < 6 for s in sets[d])
    stop = {s for s, c in pf.items() if c > cap}
    fsets = {d: sets[d] - stop for d in sets}
    want = sorted(
        (c, p, round(len(fsets[c] & fsets[p]) / len(fsets[c] | fsets[p]), 9))
        for c in sets for p in sets
        if p < 6 and c != p and fsets[c] | fsets[p]
        and len(fsets[c] & fsets[p]) / len(fsets[c] | fsets[p]) >= 0.05
    )
    got = sorted(
        (r.doc_id, r.probe_id, round(r.jaccard, 9))
        for r in ngram_probe_pairs(
            df, probe, threshold=0.05, max_probe_freq=cap
        ).collect()
    )
    assert got == want
    assert stop, "fixture must actually trigger the cap"
    assert got, "capped fixture still has qualifying pairs"


# ---------------------------------------------------- period growth

def test_period_growth_closed_form(spark):
    import datetime as _dt

    from clinical_data_lake_spark.operators.timeseries import period_growth

    d = lambda s: _dt.datetime.fromisoformat(s)  # noqa: E731
    # three ISO weeks: 2 rows -> 4 rows (+100%) -> 1 row (-75%)
    ev = spark.createDataFrame(
        [(d("2024-01-01T10:00"), 1.0), (d("2024-01-02T10:00"), 1.0),
         (d("2024-01-08T10:00"), 2.0), (d("2024-01-09T10:00"), 2.0),
         (d("2024-01-10T10:00"), 2.0), (d("2024-01-11T10:00"), 2.0),
         (d("2024-01-15T10:00"), 8.0)],
        ["ts", "value"],
    )
    out = {str(r.period_start): r for r in
           period_growth(ev, value_col="value", period="week").collect()}
    w1, w2, w3 = out["2024-01-01"], out["2024-01-08"], out["2024-01-15"]
    assert w1.cnt_growth is None and w1.sum_growth is None
    assert w2.cnt_growth == 1.0 and w2.sum_growth == 3.0   # 2 -> 8
    assert w3.cnt_growth == -0.75 and w3.sum_growth == 0.0  # 8 -> 8
