"""Unit pins for the r15 additions: admission-ledger compaction/GC
decisions, the fused IVF re-fit policy, tokenizer-swap packing drift,
and the sampled ingest-drift twin."""

from __future__ import annotations

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from clinical_data_lake_spark.llm import corpus, dedup, packing, similarity
from clinical_data_lake_spark.operators.caching import release_persisted


# ------------------------------------------------- ledger compaction
def _ledger(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, ingest_ts=ts, text=t) for i, ts, t in rows]
    )


def test_ledger_compaction_decisions(spark):
    # doc 1: two versions -> ts=1 superseded, ts=2 live.
    # docs 2,3: exact dups (after normalization) -> 2 keeps, 3 retired.
    # doc 4: unique live content -> keep.
    # doc 1's live text dups nothing (its OLD text matched doc 2, but
    # superseded content must NOT hold a canonical slot).
    led = _ledger(
        spark,
        [
            (1, 1, "shared   duplicate content here"),
            (1, 2, "doc one replacement content"),
            (2, 1, "shared duplicate content here"),
            (3, 1, "  Shared Duplicate   content HERE "),
            (4, 1, "unique content nothing else matches"),
        ],
    )
    out = dedup.ledger_compaction(led)
    got = {(r["doc_id"], r["ingest_ts"]): r["decision"] for r in out.collect()}
    assert got == {
        (1, 1): "superseded",
        (1, 2): "keep",
        (2, 1): "keep",
        (3, 1): "dup_retired",
        (4, 1): "keep",
    }


def test_ledger_compaction_null_texts_not_pooled(spark):
    # two unrelated NULL-text rows must BOTH keep (no shared canonical
    # group through the NULL fingerprint)
    led = spark.createDataFrame(
        [(7, 1, None), (8, 1, None)],
        "doc_id long, ingest_ts long, text string",
    )
    got = {
        r["doc_id"]: r["decision"]
        for r in dedup.ledger_compaction(led).collect()
    }
    assert got == {7: "keep", 8: "keep"}


def test_ledger_compaction_covers_every_row(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    reing = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) >= "d0"
    led = docs.select(
        "doc_id", "text", F.lit(1).cast("long").alias("ingest_ts")
    ).unionByName(
        docs.filter(reing).select(
            "doc_id", "text", F.lit(2).cast("long").alias("ingest_ts")
        )
    )
    n_in = led.count()
    out = dedup.ledger_compaction(led)
    assert out.count() == n_in  # a decision for EVERY ledger row
    # every re-ingested doc's ts=1 row is superseded, and the compacted
    # ledger keeps at most one live row per doc id
    per_id = (
        out.filter(F.col("decision") != "superseded")
        .groupBy("doc_id")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert per_id == 1


# ------------------------------------------------- ivf refit policy
def _emb(spark, rows):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in rows]
    )


def test_refit_policy_hold_when_batch_matches_base(spark):
    # batch distributed like the base -> tiny drift, recall holds
    base = _emb(
        spark,
        [(i, [1.0, 0.0]) for i in range(0, 8)]
        + [(i, [0.0, 1.0]) for i in range(8, 16)],
    )
    batch = _emb(
        spark,
        [(100, [1.0, 0.01]), (101, [0.01, 1.0])],
    )
    queries = _emb(spark, [(200, [1.0, 0.05]), (201, [0.05, 1.0])])
    out = similarity.ivf_refit_policy(
        base, batch, queries, k=3, n_cells=2, n_probe=2
    ).collect()
    release_persisted()
    assert len(out) == 1
    r = out[0]
    assert r["decision"] == "hold" and r["reason"] == "none"
    assert abs(r["recall_drop"]) <= 0.05


def test_refit_policy_fires_on_occupancy_pileup(spark):
    # base spreads over cells; the batch piles into one direction ->
    # large total-variation drift fires the occupancy trigger even
    # with recall intact (n_probe = n_cells -> recall 1.0 both sides)
    base = _emb(
        spark,
        [(i, [1.0, 0.0]) for i in range(0, 6)]
        + [(i, [0.0, 1.0]) for i in range(6, 12)],
    )
    batch = _emb(spark, [(100 + i, [0.0, 1.0]) for i in range(6)])
    queries = _emb(spark, [(200, [0.6, 0.8])])
    r = similarity.ivf_refit_policy(
        base, batch, queries, k=3, n_cells=2, n_probe=2
    ).collect()[0]
    release_persisted()
    assert r["decision"] == "refit"
    assert r["reason"] == "occupancy"
    assert r["tv_drift"] > 0.1
    assert r["recall_drop"] <= 0.05


def test_refit_policy_matches_component_audits(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    is_new = F.substring(F.md5(F.col("vec_id").cast("string")), 1, 2) >= "d0"
    base, batch = emb.filter(~is_new), emb.filter(is_new)
    queries = emb.filter(F.col("vec_id") < 5)
    pol = similarity.ivf_refit_policy(
        base, batch, queries, k=10, n_cells=16, n_probe=4
    ).collect()[0]
    release_persisted()
    occ = similarity.ivf_admission_audit(base, batch, n_cells=16).collect()
    release_persisted()
    tv = round(sum(abs(r["share_drift"]) for r in occ) / 2.0, 6)
    assert pol["tv_drift"] == pytest.approx(tv, abs=1e-9)
    rec = similarity.ivf_recall_drift(
        queries, base, emb, k=10, n_cells=16, n_probe=4
    ).collect()
    release_persisted()
    rb = round(sum(r["recall_base"] for r in rec) / len(rec), 6)
    assert pol["recall_base"] == pytest.approx(rb, abs=1e-9)


# ------------------------------------------------- packing drift
def test_packing_drift_closed_form(spark):
    # 4 docs, one shard (ids 0,8,16,24 ≡ 0 mod 8): words of length 8
    # -> vocab A (piece 4) = 2 tokens/word, vocab B (piece 3) = 3.
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(["abcdefgh"] * 10)) for i in (0, 8, 16, 24)]
    )
    r = packing.packing_drift(
        docs, budget=32, piece_len_a=4, piece_len_b=3, shards=8
    ).collect()[0]
    release_persisted()
    # A: 4 docs x 20 tokens = 80 tokens -> ceil(80/32) = 3 bins
    # B: 4 docs x 30 tokens = 120 tokens -> ceil(120/32) = 4 bins
    assert r["n_docs"] == 4
    assert (r["n_tokens_a"], r["n_tokens_b"]) == (80, 120)
    assert (r["n_bins_a"], r["n_bins_b"]) == (3, 4)
    assert r["fill_frac_a"] == pytest.approx(80 / 96, abs=1e-6)
    assert r["fill_frac_b"] == pytest.approx(120 / 128, abs=1e-6)
    # A: doc starts at 0,20,40,60 ends 20,40,60,80: docs 2,3 cross a
    # 32-boundary (20-40 crosses 32; 40-60 crosses... 60<64 no; 60-80
    # crosses 64) -> splits docs at offsets 20 and 60 -> 2 splits
    assert r["split_frac_a"] == pytest.approx(2 / 4, abs=1e-6)
    assert r["budget_ratio"] == pytest.approx(1.5, abs=1e-6)
    assert r["bin_ratio"] == pytest.approx(4 / 3, abs=1e-6)


def test_packing_drift_excludes_null_text(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="aaaa bbbb"),
            Row(doc_id=2, text=None),
        ]
    )
    r = packing.packing_drift(docs, budget=8, shards=1).collect()[0]
    release_persisted()
    assert r["n_docs"] == 1


# ------------------------------------------------- sampled ingest drift
def test_ingest_drift_sampled_requires_id(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    with pytest.raises(ValueError, match="sample_hex requires id_col"):
        corpus.ingest_drift(docs, docs, sample_hex="80")


def test_ingest_drift_sampled_same_metrics_schema(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    exact = corpus.ingest_drift(docs.filter(h < "d0"), docs.filter(h >= "d0"))
    sampled = corpus.ingest_drift(
        docs.filter(h < "d0"),
        docs.filter(h >= "d0"),
        id_col="doc_id",
        sample_hex="80",
    )
    assert exact.columns == sampled.columns
    ex = {r["metric"]: r["psi"] for r in exact.collect()}
    release_persisted()
    sa = {r["metric"]: r["psi"] for r in sampled.collect()}
    release_persisted()
    assert set(sa) == {"quality", "tokens", "lang"} == set(ex)
    # the 50% sample estimates the same shift: same order of magnitude,
    # never a category explosion (all PSIs finite and small on the
    # homogeneous test corpus)
    for m, v in sa.items():
        assert v is not None and abs(v) < 1.0


def test_ledger_compaction_is_admission_safe(spark):
    """GC-safety: incremental_dedup decisions against the COMPACTED
    ledger equal decisions against the ledger's live content (version
    winners), because dup_retired rows carry the same fingerprint and
    shingle set as their kept canonical row. Uncapped df isolates the
    semantic claim (the df cap counts copies, so retiring duplicates
    legitimately lowers stop-shingle df at scale)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    batch = docs.filter(h >= "e0").select("doc_id", "text")
    led_docs = docs.filter(h < "e0")
    reing = F.substring(F.md5(F.col("doc_id").cast("string")), 3, 1) < "4"
    ledger = led_docs.select(
        "doc_id", "text", F.lit(1).cast("long").alias("ingest_ts")
    ).unionByName(
        led_docs.filter(reing).select(
            "doc_id", "text", F.lit(2).cast("long").alias("ingest_ts")
        )
    )
    decisions = dedup.ledger_compaction(ledger)
    # live content = the per-id version winners (keep + dup_retired)
    live = ledger.join(
        decisions.filter(F.col("decision") != "superseded").select(
            "doc_id", "ingest_ts"
        ),
        on=["doc_id", "ingest_ts"],
        how="left_semi",
    )
    compacted = ledger.join(
        decisions.filter(F.col("decision") == "keep").select(
            "doc_id", "ingest_ts"
        ),
        on=["doc_id", "ingest_ts"],
        how="left_semi",
    )
    adm_live = {
        (r["doc_id"], r["decision"])
        for r in dedup.incremental_dedup(
            batch, live, threshold=0.3, max_doc_freq=None
        ).collect()
    }
    release_persisted()
    adm_comp = {
        (r["doc_id"], r["decision"])
        for r in dedup.incremental_dedup(
            batch, compacted, threshold=0.3, max_doc_freq=None
        ).collect()
    }
    release_persisted()
    assert adm_live == adm_comp


# ------------------------------------------------- admission trend
def test_admission_trend_rates_and_deltas(spark):
    dec = spark.createDataFrame(
        [(0, "accept"), (0, "accept"), (0, "exact_dup"), (0, "near_dup"),
         (1, "accept"), (1, "exact_dup"),
         (2, "exact_dup"), (2, "near_dup")],
        "slice_id long, decision string",
    )
    rows = {r["slice_id"]: r for r in dedup.admission_trend(dec).collect()}
    assert rows[0]["n_docs"] == 4 and rows[0]["n_accept"] == 2
    assert rows[0]["accept_rate"] == pytest.approx(0.5)
    assert rows[0]["accept_delta"] is None  # first slice: no reference
    assert rows[1]["accept_rate"] == pytest.approx(0.5)
    assert rows[1]["accept_delta"] == pytest.approx(0.0)
    assert rows[2]["n_accept"] == 0 and rows[2]["accept_rate"] == 0.0
    assert rows[2]["accept_delta"] == pytest.approx(-0.5)


# ------------------------------------------------- snapshot diff
def test_snapshot_diff_classification(spark):
    old = spark.createDataFrame(
        [(1, "alpha content", "web"), (2, "beta content", "web"),
         (3, "gamma content", "books"), (5, None, "web")],
        "doc_id long, text string, source string",
    )
    new = spark.createDataFrame(
        [(1, "alpha content", "web"),        # same
         (2, "beta content REVISED", "web"), # changed
         (4, "delta content", "books"),      # added (3 removed)
         (5, None, "web")],                  # NULL == NULL -> same
        "doc_id long, text string, source string",
    )
    rows = {r["source"]: r for r in corpus.snapshot_diff(old, new).collect()}
    web = rows["web"]
    assert (web["n_old"], web["n_new"]) == (3, 3)
    assert (web["n_added"], web["n_removed"], web["n_changed"], web["n_same"]) == (0, 0, 1, 2)
    assert web["churn_rate"] == pytest.approx(1 / 3, abs=1e-6)
    books = rows["books"]
    assert (books["n_added"], books["n_removed"]) == (1, 1)
    assert books["churn_rate"] == pytest.approx(2.0, abs=1e-6)


def test_snapshot_diff_new_source_null_churn(spark):
    old = spark.createDataFrame(
        [(1, "alpha", "web")], "doc_id long, text string, source string"
    )
    new = spark.createDataFrame(
        [(1, "alpha", "web"), (9, "fresh", "papers")],
        "doc_id long, text string, source string",
    )
    rows = {r["source"]: r for r in corpus.snapshot_diff(old, new).collect()}
    assert rows["papers"]["n_old"] == 0
    assert rows["papers"]["churn_rate"] is None  # brand-new source
