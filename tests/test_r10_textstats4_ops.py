"""Round-10 session-3: weighted log-odds terms, vocabulary overlap,
seasonal anomaly, indirect standardization (SIR)."""

from __future__ import annotations

import math

import pytest

from clinical_data_lake_spark.functions.text import (
    log_odds_terms,
    vocab_overlap,
)
from clinical_data_lake_spark.ml.stats import sir_indirect
from clinical_data_lake_spark.operators.timeseries import seasonal_anomaly


# -- log_odds_terms -------------------------------------------------------


def test_log_odds_distinctive_term_ranks_first(spark):
    docs = [
        ("a", "apple apple apple banana common common"),
        ("b", "cherry cherry cherry banana common common"),
    ]
    df = spark.createDataFrame(docs, "cls string, text string")
    out = log_odds_terms(df, "cls", top_k=2).collect()
    top = {r.cls: r.term for r in out if r.rnk == 1}
    assert top["a"] == "apple" and top["b"] == "cherry"
    # shared terms score ~0; distinctive ones positive
    za = {r.term: r.z for r in out if r.cls == "a"}
    assert za["apple"] > 0


def test_log_odds_matches_python_reference(spark):
    docs = [("a", "x x x y"), ("b", "y y z z z")]
    df = spark.createDataFrame(docs, "cls string, text string")
    rows = {
        (r.cls, r.term): r for r in log_odds_terms(df, "cls", top_k=5).collect()
    }

    counts = {"a": {"x": 3, "y": 1}, "b": {"y": 2, "z": 3}}
    ft = {"x": 3, "y": 3, "z": 3}
    n_tot = 9
    a0 = 100.0
    for cls in ("a", "b"):
        n_c = sum(counts[cls].values())
        n_rest = n_tot - n_c
        for term in counts[cls]:
            y_c = counts[cls][term]
            y_rest = ft[term] - y_c
            at = round(a0 * ft[term] / n_tot, 12)
            r1 = round((y_c + at) / (n_c + a0 - y_c - at), 12)
            r2 = round((y_rest + at) / (n_rest + a0 - y_rest - at), 12)
            delta = math.log(r1) - math.log(r2)
            var = 1 / (y_c + at) + 1 / (y_rest + at)
            got = rows[(cls, term)]
            assert got.delta == pytest.approx(round(delta, 6), abs=1e-6)
            assert got.z == pytest.approx(
                round(delta / math.sqrt(var), 6), abs=1e-6
            )


def test_log_odds_prior_shrinks_hapax(spark):
    # a term seen once only in class a: with a corpus-wide prior its
    # |z| stays small relative to a term seen many times
    docs = [("a", "rare " + "big " * 20), ("b", "other " * 20)]
    df = spark.createDataFrame(docs, "cls string, text string")
    out = {r.term: r.z for r in log_odds_terms(df, "cls", top_k=10).collect() if r.cls == "a"}
    assert abs(out["rare"]) < abs(out["big"])


# -- vocab_overlap --------------------------------------------------------


def test_vocab_overlap_closed_form(spark):
    docs = [
        ("s1", "a b c"),
        ("s2", "b c d"),
        ("s3", "x y z"),
    ]
    df = spark.createDataFrame(docs, "source string, text string")
    rows = {
        (r.src_a, r.src_b): r for r in vocab_overlap(df, top_k=10).collect()
    }
    r12 = rows[("s1", "s2")]
    assert r12.k_a == 3 and r12.k_b == 3 and r12.n_common == 2
    assert r12.jaccard == pytest.approx(0.5)
    assert rows[("s1", "s3")].n_common == 0
    assert rows[("s1", "s3")].jaccard == 0.0
    assert len(rows) == 3  # all unordered pairs present


def test_vocab_overlap_topk_cut_is_deterministic(spark):
    # k=1: top term by count desc then term asc
    docs = [("s1", "b b a a"), ("s2", "a a c")]
    df = spark.createDataFrame(docs, "source string, text string")
    r = vocab_overlap(df, top_k=1).collect()[0]
    # s1 top: a (tie 2-2, asc); s2 top: a -> overlap 1
    assert r.n_common == 1 and r.jaccard == pytest.approx(1.0)


# -- seasonal_anomaly -----------------------------------------------------


def test_seasonal_anomaly_flags_planted_spike(spark):
    from pyspark.sql import functions as F

    rows = []
    # key k: 1 event at hour 3 every day for 10 days; day 5 has 30
    for d in range(1, 11):
        n = 30 if d == 5 else 1
        for i in range(n):
            rows.append((f"2024-02-{d:02d} 03:00:{i % 60:02d}", "k"))
    df = spark.createDataFrame(rows, "ts string, key string").select(
        F.to_timestamp("ts").alias("ts"), "key"
    )
    out = seasonal_anomaly(df, "ts", "key", z_threshold=2.0).collect()
    flagged = [(str(r.day), r.hour) for r in out]
    assert ("2024-02-05", 3) in flagged
    spike = [r for r in out if str(r.day) == "2024-02-05"][0]
    assert spike.n == 30 and spike.z > 2.0


def test_seasonal_anomaly_zero_fill_counts_silence(spark):
    from pyspark.sql import functions as F

    # hour 7 fires 5 times a day except one silent day -> silence z < 0
    rows = []
    for d in range(1, 9):
        if d == 4:
            continue
        for i in range(5):
            rows.append((f"2024-02-{d:02d} 07:0{i}:00", "k"))
    # one unrelated event on day 4 so the day exists in the calendar
    rows.append(("2024-02-04 09:00:00", "k"))
    df = spark.createDataFrame(rows, "ts string, key string").select(
        F.to_timestamp("ts").alias("ts"), "key"
    )
    out = seasonal_anomaly(df, "ts", "key", z_threshold=1.5).collect()
    silent = [r for r in out if str(r.day) == "2024-02-04" and r.hour == 7]
    assert silent and silent[0].n == 0 and silent[0].z < 0


# -- sir_indirect ---------------------------------------------------------


def test_sir_uniform_rates_give_sir_one(spark):
    # identical rates in every stratum for both groups -> SIR = 1
    rows = [
        ("g1", "s1", 10.0, 2),
        ("g1", "s2", 20.0, 4),
        ("g2", "s1", 30.0, 6),
        ("g2", "s2", 40.0, 8),
    ]
    df = spark.createDataFrame(rows, "g string, s string, pt double, ev int")
    out = {r.g: r for r in sir_indirect(df, "g", ["s"], "pt", "ev").collect()}
    assert out["g1"].sir == pytest.approx(1.0, abs=1e-6)
    assert out["g2"].sir == pytest.approx(1.0, abs=1e-6)
    assert out["g1"].sir_lo < 1.0 < out["g1"].sir_hi


def test_sir_excess_risk_detected(spark):
    # stratum rate reference 0.1/unit; g2 doubles it
    rows = [
        ("g1", "s1", 100.0, 10),
        ("g2", "s1", 100.0, 30),
    ]
    df = spark.createDataFrame(rows, "g string, s string, pt double, ev int")
    out = {r.g: r for r in sir_indirect(df, "g", ["s"], "pt", "ev").collect()}
    # reference lambda = 40/200 = 0.2 -> E = 20 for both
    assert out["g2"].expected == pytest.approx(20.0)
    assert out["g2"].sir == pytest.approx(1.5)
    assert out["g1"].sir == pytest.approx(0.5)


def test_sir_byar_ci_matches_reference(spark):
    rows = [("g1", "s1", 100.0, 9), ("g2", "s1", 100.0, 9)]
    df = spark.createDataFrame(rows, "g string, s string, pt double, ev int")
    r = sir_indirect(df, "g", ["s"], "pt", "ev").collect()[0]
    o, e, z = 9.0, 9.0, 1.959963984540054
    lo = o / e * (1 - 1 / (9 * o) - z / (3 * math.sqrt(o))) ** 3
    hi = (o + 1) / e * (1 - 1 / (9 * (o + 1)) + z / (3 * math.sqrt(o + 1))) ** 3
    assert r.sir_lo == pytest.approx(round(lo, 6), abs=1e-6)
    assert r.sir_hi == pytest.approx(round(hi, 6), abs=1e-6)


def test_sir_zero_observed_null_lower(spark):
    rows = [("g1", "s1", 50.0, 0), ("g2", "s1", 50.0, 4)]
    df = spark.createDataFrame(rows, "g string, s string, pt double, ev int")
    out = {r.g: r for r in sir_indirect(df, "g", ["s"], "pt", "ev").collect()}
    assert out["g1"].observed == 0 and out["g1"].sir_lo is None
    assert out["g1"].sir_hi is not None
