"""Round-10 session-3: span-level duplicate removal, seasonal baseline
trainer (the streaming anomaly scorer's parity lives in
test_streaming.py)."""

from __future__ import annotations

import pytest

from clinical_data_lake_spark.llm.dedup import dedup_span_removal
from clinical_data_lake_spark.operators.timeseries import seasonal_baseline


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_span_removal_drops_shared_span_keeps_unique(spark):
    shared = "alpha beta gamma delta epsilon"  # a 5-gram both docs carry
    d1 = f"unique one two three four {shared}"
    d2 = f"{shared} other five six seven eight"
    df = _docs(spark, [(1, d1), (2, d2)])
    out = {r.doc_id: r for r in dedup_span_removal(df, n=5).collect()}
    assert out[1].n_words == 10 and out[1].n_removed == 5
    assert out[1].cleaned_text == "unique one two three four"
    assert out[2].cleaned_text == "other five six seven eight"


def test_span_removal_overlapping_grams_cover_union(spark):
    # 6 shared words -> two overlapping duplicated 5-grams cover all 6
    shared = "a b c d e f"
    df = _docs(spark, [(1, f"x {shared}"), (2, f"{shared} y")])
    out = {r.doc_id: r for r in dedup_span_removal(df, n=5).collect()}
    assert out[1].n_removed == 6 and out[1].cleaned_text == "x"
    assert out[2].cleaned_text == "y"


def test_span_removal_fully_duplicated_doc_survives_empty(spark):
    t = "one two three four five"
    df = _docs(spark, [(1, t), (2, t)])
    out = {r.doc_id: r for r in dedup_span_removal(df, n=5).collect()}
    assert out[1].cleaned_text == "" and out[1].n_removed == 5
    assert set(out) == {1, 2}  # nobody disappears


def test_span_removal_unique_docs_untouched(spark):
    df = _docs(
        spark,
        [(1, "completely unique words here now"), (2, "another different doc text body")],
    )
    out = {r.doc_id: r for r in dedup_span_removal(df, n=5).collect()}
    assert all(r.n_removed == 0 for r in out.values())
    assert out[1].cleaned_text == "completely unique words here now"


def test_span_removal_short_docs_have_no_grams(spark):
    df = _docs(spark, [(1, "tiny doc"), (2, "tiny doc")])
    out = {r.doc_id: r for r in dedup_span_removal(df, n=5).collect()}
    # identical but shorter than n: no n-gram exists, nothing removed
    assert all(r.n_removed == 0 for r in out.values())


def test_span_removal_repeat_within_one_doc_not_removed(spark):
    # min_docs=2 counts DISTINCT docs: an n-gram repeated inside a
    # single doc is repetition (functions.text.repetition_profile's
    # job), not cross-doc duplication
    t = "a b c d e " * 2
    df = _docs(spark, [(1, t.strip()), (2, "totally different words here now")])
    out = {r.doc_id: r for r in dedup_span_removal(df, n=5).collect()}
    assert out[1].n_removed == 0


# -- seasonal_baseline ------------------------------------------------------


def test_seasonal_baseline_closed_form(spark):
    from pyspark.sql import functions as F

    rows = []
    # hour 3: 2 events on day 1, 0 on day 2 -> mu 1.0, var 1.0
    rows += [("2024-02-01 03:00:00", "k"), ("2024-02-01 03:30:00", "k")]
    rows += [("2024-02-02 09:00:00", "k")]  # creates day 2 in calendar
    df = spark.createDataFrame(rows, "ts string, key string").select(
        F.to_timestamp("ts").alias("ts"), "key"
    )
    base = {
        (r.key, r.hour): r for r in seasonal_baseline(df, "ts", "key").collect()
    }
    r3 = base[("k", 3)]
    assert r3.n_days == 2
    assert r3.mu == pytest.approx(1.0)
    assert r3.sigma == pytest.approx(1.0)
    # an always-zero hour has zero variance -> sigma NULL
    assert base[("k", 5)].sigma is None
