"""Unit pins for the r14 additions: multi-ledger admission decisions,
the IVF admission occupancy-drift audit, and the two-vocab fertility
drift table."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from clinical_data_lake_spark.functions.text import (
    bpe_ish_token_count,
    fertility_drift,
    tokenizer_fertility,
)
from clinical_data_lake_spark.llm import dedup, similarity
from clinical_data_lake_spark.operators.caching import release_persisted


# ------------------------------------------------- multi-ledger dedup
def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


WEB = [
    (1, "the quick brown fox jumps over the lazy dog tonight"),
    (2, "completely unrelated web page about cooking pasta dishes"),
]
BOOKS = [
    (11, "a long passage from a famous novel about whales at sea"),
    (12, "the quick brown fox jumps over the lazy dog tonight"),
]


def test_multi_ledger_decisions_are_per_source(spark):
    # doc 21: exact dup of web#1 AND books#12 -> exact_dup in both.
    # doc 22: near dup of books#11 only -> accept in web, near in books.
    # doc 23: fresh -> accept in both.
    batch = _docs(
        spark,
        [
            (21, "the quick brown fox jumps over the lazy dog tonight"),
            (22, "a long passage from a famous novel about whales at night"),
            (23, "entirely new content that matches nothing else here"),
        ],
    )
    out = dedup.multi_ledger_dedup(
        batch,
        [("web", _docs(spark, WEB)), ("books", _docs(spark, BOOKS))],
        threshold=0.5,
    )
    got = {(r["doc_id"], r["source"]): r["decision"] for r in out.collect()}
    release_persisted()
    assert got == {
        (21, "web"): "exact_dup",
        (21, "books"): "exact_dup",
        (22, "web"): "accept",
        (22, "books"): "near_dup",
        (23, "web"): "accept",
        (23, "books"): "accept",
    }


def test_multi_ledger_single_source_equals_incremental(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    batch, ledger = docs.filter(h >= "c0"), docs.filter(h < "c0")
    multi = {
        (r["doc_id"], r["decision"])
        for r in dedup.multi_ledger_dedup(
            batch, [("only", ledger)], threshold=0.2
        ).collect()
    }
    release_persisted()
    single = {
        (r["doc_id"], r["decision"])
        for r in dedup.incremental_dedup(batch, ledger, threshold=0.2).collect()
    }
    release_persisted()
    assert multi == single


def test_multi_ledger_null_text_accepts_everywhere(spark):
    batch = spark.createDataFrame(
        [Row(doc_id=1, text=None)], "doc_id long, text string"
    )
    out = dedup.multi_ledger_dedup(
        batch, [("web", _docs(spark, WEB)), ("books", _docs(spark, BOOKS))]
    )
    got = {(r["doc_id"], r["source"]): r["decision"] for r in out.collect()}
    release_persisted()
    assert got == {(1, "web"): "accept", (1, "books"): "accept"}


def test_multi_ledger_validates_inputs(spark):
    b = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError, match="non-empty"):
        dedup.multi_ledger_dedup(b, [])
    with pytest.raises(ValueError, match="unique"):
        dedup.multi_ledger_dedup(b, [("a", b), ("a", b)])
    with pytest.raises(ValueError, match="positive"):
        dedup.multi_ledger_dedup(b, [("a", b)], max_doc_freq=None)


# --------------------------------------------------- IVF admission
def test_ivf_admission_counts_and_shares(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    is_new = F.substring(F.md5(F.col("vec_id").cast("string")), 1, 2) >= "d0"
    base, batch = emb.filter(~is_new), emb.filter(is_new)
    n_base, n_batch = base.count(), batch.count()
    rows = similarity.ivf_admission_audit(base, batch, n_cells=8).collect()
    release_persisted()
    assert sum(r["n_base"] for r in rows) == n_base
    assert sum(r["n_new"] for r in rows) == n_batch
    # each side's shares sum to ~1 (rounding at 6 digits, <= n_cells terms)
    assert math.isclose(sum(r["share_base"] for r in rows), 1.0, abs_tol=1e-4)
    assert math.isclose(sum(r["share_new"] for r in rows), 1.0, abs_tol=1e-4)
    for r in rows:
        assert math.isclose(
            r["share_drift"], round(r["share_new"] - r["share_base"], 6),
            abs_tol=1e-9,
        )


def test_ivf_admission_base_assignment_is_batch_independent(spark):
    # the index is STALE by design: admitting a batch must not move any
    # base vector's cell (centroids come from base alone)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    is_new = F.substring(F.md5(F.col("vec_id").cast("string")), 1, 2) >= "d0"
    base, batch = emb.filter(~is_new), emb.filter(is_new)
    with_batch = {
        r["cell"]: r["n_base"]
        for r in similarity.ivf_admission_audit(base, batch, n_cells=8).collect()
    }
    release_persisted()
    alone = {
        r["cell"]: r["n_base"]
        for r in similarity.ivf_admission_audit(
            base, base.limit(1), n_cells=8
        ).collect()
    }
    release_persisted()
    assert {c: n for c, n in with_batch.items() if n > 0} == {
        c: n for c, n in alone.items() if n > 0
    }


# --------------------------------------------------- fertility drift
def test_fertility_drift_closed_form(spark):
    # "abcdefgh xy": words of len 8 and 2.
    #   piece_len 4: ceil(8/4)+ceil(2/4) = 2+1 = 3 subwords / 2 words
    #   piece_len 3: ceil(8/3)+ceil(2/3) = 3+1 = 4 subwords / 2 words
    docs = spark.createDataFrame([Row(lang="en", text="abcdefgh xy")])
    r = fertility_drift(docs, lang_col="lang").collect()[0]
    assert (r["n_docs"], r["n_words"]) == (1, 2)
    assert (r["n_subwords_a"], r["n_subwords_b"]) == (3, 4)
    assert r["fertility_a"] == 1.5
    assert r["fertility_b"] == 2.0
    assert r["drift"] == 0.5
    assert r["budget_ratio"] == round(4 / 3, 6)


def test_fertility_drift_vocab_a_matches_single_vocab_readout(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    drift = {
        r["lang"]: r["fertility_a"]
        for r in fertility_drift(docs, lang_col="lang").collect()
    }
    single = {
        r["lang"]: r["fertility"]
        for r in tokenizer_fertility(docs, lang_col="lang").collect()
    }
    assert drift == single


def test_bpe_piece_len_monotone(spark):
    # shorter pieces can never emit fewer tokens
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bad = docs.select(
        bpe_ish_token_count("text", 4).alias("a"),
        bpe_ish_token_count("text", 3).alias("b"),
    ).filter(F.col("b") < F.col("a"))
    assert bad.count() == 0


# --------------------------------------------------- ANN recall drift
def test_ivf_recall_drift_full_probe_is_exact_on_both_phases(spark):
    # n_probe == n_cells degenerates IVF to brute force, so recall must
    # be exactly 1.0 on BOTH corpus states and drift exactly 0.0
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    is_new = F.substring(F.md5(F.col("vec_id").cast("string")), 1, 2) >= "d0"
    rows = similarity.ivf_recall_drift(
        emb.filter(F.col("vec_id") < 3),
        emb.filter(~is_new),
        emb,
        n_cells=4,
        n_probe=4,
    ).collect()
    release_persisted()
    assert len(rows) == 3
    for r in rows:
        assert r["recall_base"] == 1.0 and r["recall_grown"] == 1.0
        assert r["recall_drift"] == 0.0


def test_ivf_recall_drift_bounds(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    is_new = F.substring(F.md5(F.col("vec_id").cast("string")), 1, 2) >= "d0"
    rows = similarity.ivf_recall_drift(
        emb.filter(F.col("vec_id") < 5), emb.filter(~is_new), emb,
        n_cells=16, n_probe=4,
    ).collect()
    release_persisted()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r["recall_base"] <= 1.0
        assert 0.0 <= r["recall_grown"] <= 1.0
        assert r["n_hit_base"] == round(r["recall_base"] * 10)
        assert r["n_hit_grown"] == round(r["recall_grown"] * 10)


# --------------------------------------------------- ingest drift
def test_ingest_drift_identical_sides_are_stable(spark):
    # ledger vs itself: every PSI term is exactly 0 (p == q), so the
    # topline must be 0.0/stable for all three metrics
    from clinical_data_lake_spark.llm.corpus import ingest_drift

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = ingest_drift(docs, docs).collect()
    release_persisted()
    assert {r["metric"] for r in rows} == {"quality", "tokens", "lang"}
    for r in rows:
        assert r["psi"] == 0.0 and r["status"] == "stable"


def test_ingest_drift_detects_planted_shift(spark):
    # batch whose language mix is disjoint from the ledger must flag
    # the lang metric as drifted
    from clinical_data_lake_spark.llm.corpus import ingest_drift

    ledger = spark.createDataFrame(
        [Row(lang="en", text=f"some english document number {i} here")
         for i in range(50)]
    )
    batch = spark.createDataFrame(
        [Row(lang="de", text=f"ein deutsches dokument nummer {i} hier")
         for i in range(50)]
    )
    got = {r["metric"]: r for r in ingest_drift(ledger, batch).collect()}
    release_persisted()
    assert got["lang"]["status"] == "drifted"
    assert got["lang"]["psi"] > 0.25


def test_ingest_drift_ignores_null_text(spark):
    from clinical_data_lake_spark.llm.corpus import ingest_drift

    base = [Row(lang="en", text=f"doc {i} with some words") for i in range(20)]
    ledger = spark.createDataFrame(base)
    with_nulls = spark.createDataFrame(
        base + [Row(lang="xx", text=None)] * 5,
        "lang string, text string",
    )
    rows = ingest_drift(ledger, with_nulls).collect()
    release_persisted()
    # the NULL-text rows carry no signal: batch == ledger after the
    # filter, so everything is exactly stable (incl. the lang metric —
    # the 'xx' rows were dropped with their NULL texts)
    for r in rows:
        assert r["psi"] == 0.0 and r["status"] == "stable"


def test_ingest_drift_sample_requires_id(spark):
    from clinical_data_lake_spark.llm.corpus import ingest_drift

    docs = spark.createDataFrame([Row(doc_id=1, lang="en", text="a b c")])
    with pytest.raises(ValueError, match="id_col"):
        ingest_drift(docs, docs, sample_hex="40")


def test_ingest_drift_sampled_identical_sides_still_stable(spark):
    # the hash sample keeps the SAME docs on both sides, so ledger vs
    # itself stays exactly 0.0/stable under sampling too
    from clinical_data_lake_spark.llm.corpus import ingest_drift

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = ingest_drift(
        docs, docs, id_col="doc_id", sample_hex="80"
    ).collect()
    release_persisted()
    for r in rows:
        assert r["psi"] == 0.0 and r["status"] == "stable"
