"""Unit pins for the r13 additions: URL canonicalization, the
watermark-lateness audit, hash-sampled clip bounds, the portable
minhash banding sweep, plus the r12-ADVICE regression guards
(recall_at_k cap, mixture_plan NULL-slice survival)."""

from __future__ import annotations

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from clinical_data_lake_spark.functions.text import canonicalize_url
from clinical_data_lake_spark.llm import dedup, similarity
from clinical_data_lake_spark.llm.corpus import mixture_plan
from clinical_data_lake_spark.operators.caching import release_persisted
from clinical_data_lake_spark.streaming.events import watermark_lateness_audit


# ---------------------------------------------------------------- URLs
@pytest.mark.parametrize(
    "raw,want",
    [
        # scheme + www + trailing slash
        ("https://www.Example.com/a/b/", "example.com/a/b"),
        ("http://example.com/a/b", "example.com/a/b"),
        # default ports stripped, non-default kept
        ("http://example.com:80/x", "example.com/x"),
        ("https://example.com:443/x", "example.com/x"),
        ("https://example.com:8443/x", "example.com:8443/x"),
        # credentials dropped
        ("https://user:pw@example.com/x", "example.com/x"),
        # fragment stripped
        ("https://example.com/x#frag", "example.com/x"),
        # tracking params dropped, survivors sorted, empty ? dropped
        ("https://example.com/x?utm_source=a&utm_medium=b", "example.com/x"),
        ("https://example.com/x?b=2&a=1", "example.com/x?a=1&b=2"),
        ("https://example.com/x?gclid=1&a=1", "example.com/x?a=1"),
        ("https://example.com/x?fbclid=9", "example.com/x"),
        ("https://example.com/x?ref=hn&z=1&a=2", "example.com/x?a=2&z=1"),
        # path case preserved; host case folded
        ("https://EXAMPLE.com/CaseSensitive", "example.com/CaseSensitive"),
        # no scheme at all
        ("www.example.com/x/", "example.com/x"),
        # root URL: path collapses to empty
        ("https://example.com/", "example.com"),
        # multiple trailing slashes
        ("https://example.com/a///", "example.com/a"),
        # refresh param is NOT on the tracking list (prefix-anchored)
        ("https://example.com/x?refresh=1", "example.com/x?refresh=1"),
    ],
)
def test_canonicalize_url(spark, raw, want):
    got = (
        spark.createDataFrame([Row(url=raw)])
        .select(canonicalize_url("url").alias("c"))
        .collect()[0]["c"]
    )
    assert got == want, f"{raw}: {got} != {want}"


def test_canonicalize_url_groups_variants(spark):
    variants = [
        "https://www.example.com/articles/7",
        "http://example.com:80/articles/7/",
        "https://EXAMPLE.com/articles/7?utm_source=feed",
        "https://example.com/articles/7",
    ]
    df = spark.createDataFrame([Row(url=u) for u in variants]).select(
        canonicalize_url("url").alias("c")
    )
    assert df.distinct().count() == 1


# ------------------------------------------------- watermark lateness
def test_watermark_lateness_semantics(spark):
    # 4 slices of 2 events (num_batches=4, ids 0..7). Event times in
    # seconds from epoch. Slice maxes: s0=1000, s1=2000, s2=2000,
    # s3=5000. Watermark (prior-slice max): s0=None, s1=1000, s2=2000,
    # s3=2000.
    rows = [
        (0, 900), (1, 1000),      # slice 0: never droppable
        (2, 500), (3, 2000),      # slice 1: wm=1000 -> id2 late at d<500
        (4, 1995), (5, 2000),     # slice 2: wm=2000 -> id4 late at d<5
        (6, 100), (7, 5000),      # slice 3: wm=2000 -> id6 late at d<1900
    ]
    ev = spark.createDataFrame(
        [Row(event_id=i, ts=t) for i, t in rows]
    ).select("event_id", F.timestamp_seconds("ts").alias("ts"))
    out = {
        r["delay_s"]: r
        for r in watermark_lateness_audit(
            ev, delays_s=(0, 10, 600, 3600), num_batches=4
        ).collect()
    }
    assert all(r["n_events"] == 8 for r in out.values())
    assert out[0]["n_late"] == 3        # ids 2, 4, 6
    assert out[10]["n_late"] == 2       # id4 (lateness 5) survives
    assert out[600]["n_late"] == 1      # only id6 (lateness 1900)
    assert out[3600]["n_late"] == 0
    assert out[3600]["frac_late"] == 0.0


def test_watermark_lateness_single_batch_drops_nothing(spark):
    ev = spark.createDataFrame(
        [Row(event_id=i, ts=1000 - 100 * i) for i in range(5)]
    ).select("event_id", F.timestamp_seconds("ts").alias("ts"))
    out = watermark_lateness_audit(ev, delays_s=(0,), num_batches=1).collect()
    assert out[0]["n_late"] == 0


# -------------------------------------------------- sampled clip bounds
def test_clip_bounds_sampled_full_sample_matches_exact(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        r["pos"]: r
        for r in similarity.embedding_clip_bounds(emb).collect()
    }
    release_persisted()
    full = {
        r["pos"]: r
        for r in similarity.embedding_clip_bounds_sampled(
            emb, n_256=256
        ).collect()
    }
    release_persisted()
    assert set(full) == set(exact)
    for pos, r in full.items():
        assert r["n_sample"] == exact[pos]["n"]
        assert r["p_lo"] == exact[pos]["p_lo"]
        assert r["p_hi"] == exact[pos]["p_hi"]
        assert r["clip_frac"] == exact[pos]["clip_frac"]


def test_clip_bounds_sampled_quarter_sample(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = similarity.embedding_clip_bounds_sampled(emb, n_256=64).collect()
    release_persisted()
    n_vec = emb.filter(F.col("embedding").isNotNull()).count()
    for r in out:
        assert r["n"] == n_vec
        # hash-sample: ~1/4 of coordinates, binomial spread
        assert 0 < r["n_sample"] < r["n"]
        assert r["p_lo"] <= r["p_hi"]
        assert 0.0 <= r["clip_frac"] <= 1.0
    frac = sum(r["n_sample"] for r in out) / sum(r["n"] for r in out)
    assert 0.15 < frac < 0.35


def test_clip_bounds_sampled_rejects_bad_n256(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError):
        similarity.embedding_clip_bounds_sampled(emb, n_256=0)


# ------------------------------------------------------ recall_at_k cap
def test_recall_at_k_caps_overwide_lists(spark):
    # exact list carries 4 rows for one query with k=2 — a misuse that
    # used to report recall 2.0 silently; now capped at 1.0.
    exact = spark.createDataFrame(
        [Row(query_id=1, neighbor_id=n) for n in (10, 11, 12, 13)]
    )
    approx = exact
    qids = spark.createDataFrame([Row(query_id=1)])
    out = similarity.recall_at_k(exact, approx, qids, k=2).collect()
    assert out[0]["n_hit"] == 2
    assert out[0]["recall"] == 1.0


# ------------------------------------------------- mixture_plan NULLs
def test_mixture_plan_keeps_null_group_slice(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, lang="en" if i % 3 else None,
             text="alpha beta gamma delta") for i in range(30)]
    )
    out = mixture_plan(docs, group_col="lang", text_col="text")
    langs = {r["lang"] for r in out.collect()}
    assert None in langs, "NULL-lang slice dropped from the planning table"
    nrow = [r for r in out.collect() if r["lang"] is None][0]
    assert nrow["n_docs"] == 10
    assert nrow["n_tokens"] == 40


# ---------------------------------------------------- minhash sweep
def test_minhash_sweep_catches_planted_near_dups(spark):
    base = ("the quick brown fox jumps over the lazy dog again and again "
            "while the observer counts tokens carefully every single time")
    rows = [Row(doc_id=0, text=base), Row(doc_id=1, text=base + " x")]
    rows += [
        Row(doc_id=10 + i, text=f"totally unrelated document number {i} "
            f"with its own distinct vocabulary item{i} token{i} word{i} "
            f"filler{i} extra{i} more{i} padding{i}")
        for i in range(8)
    ]
    docs = spark.createDataFrame(rows)
    out = dedup.minhash_lsh_sweep(docs).collect()
    release_persisted()
    assert len(out) == 3
    by_cfg = {(r["bands"], r["rows_per_band"]): r for r in out}
    assert set(by_cfg) == {(8, 8), (16, 4), (32, 2)}
    for r in out:
        assert r["n_true"] == 1          # the planted pair, same for all
        assert 0 <= r["n_caught"] <= r["n_true"]
        assert r["n_cand"] >= r["n_caught"]
        assert r["recall"] is None or 0.0 <= r["recall"] <= 1.0
    # 32 bands x 2 rows at j~0.95: collision prob 1-(1-j^2)^32 ~ 1.0
    assert by_cfg[(32, 2)]["n_caught"] == 1
    assert by_cfg[(32, 2)]["recall"] == 1.0


def test_minhash_sweep_rejects_bad_config(spark):
    docs = spark.createDataFrame([Row(doc_id=0, text="a b c d e")])
    with pytest.raises(ValueError):
        dedup.minhash_lsh_sweep(docs, configs=((7, 9),)).collect()


def test_portable_signatures_shape(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(20)
    sig = dedup.portable_minhash_signatures(docs, num_hashes=16).collect()
    assert all(len(r["signature"]) == 16 for r in sig)
    assert all(
        0 <= v < (1 << 31) for r in sig for v in r["signature"]
    )


# -------------------------------------------- incremental dedup
def _mk_docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def test_incremental_dedup_decisions(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    ledger = _mk_docs(spark, [
        (0, base),
        (1, "one two three four five six seven eight nine ten"),
        (2, "completely different ledger content entirely here now ok yes"),
    ])
    batch = _mk_docs(spark, [
        (10, base),                                  # exact dup of 0
        (11, base + " extra"),                       # near dup of 0
        (12, "fresh unseen document with novel words only here below"),
    ])
    out = {
        r["doc_id"]: r["decision"]
        for r in dedup.incremental_dedup(
            batch, ledger, threshold=0.5
        ).collect()
    }
    release_persisted()
    assert out == {10: "exact_dup", 11: "near_dup", 12: "accept"}


def test_incremental_dedup_covers_every_batch_doc(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ledger = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    out = dedup.incremental_dedup(batch, ledger, threshold=0.2)
    rows = out.collect()
    release_persisted()
    assert len(rows) == batch.count()
    assert {r["decision"] for r in rows} <= {"exact_dup", "near_dup", "accept"}
    assert len({r["doc_id"] for r in rows}) == len(rows)  # one decision/doc


def test_cross_jaccard_is_directed_and_exact(spark):
    a = _mk_docs(spark, [(0, "w1 w2 w3 w4 w5 w6")])
    b = _mk_docs(spark, [(100, "w1 w2 w3 w4 w5 w6 w7")])
    out = dedup.cross_jaccard_pairs(a, b, threshold=0.1,
                                    max_doc_freq=None).collect()
    release_persisted()
    # shingles a: 4 (w1..w6 3-grams), b: 5; intersection 4 -> j = 4/5
    assert len(out) == 1
    r = out[0]
    assert (r["doc_a"], r["doc_b"]) == (0, 100)
    assert abs(r["jaccard"] - 0.8) < 1e-12


def test_cross_jaccard_ledger_cap_drops_stop_shingles(spark):
    hot = "the same boilerplate line repeated everywhere"
    ledger = _mk_docs(spark, [(i, hot) for i in range(5)])
    batch = _mk_docs(spark, [(100, hot)])
    # cap 3 < 5 ledger docs sharing every shingle -> all dropped
    out = dedup.cross_jaccard_pairs(batch, ledger, threshold=0.1,
                                    max_doc_freq=3).collect()
    release_persisted()
    assert out == []


# ------------------------------------------------------ shard plan
def test_shard_plan_matches_naive_cumsum(spark):
    from clinical_data_lake_spark.llm.corpus import shard_plan

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {r["shard_id"]: (r["n_docs"], r["n_tokens"])
           for r in shard_plan(docs, shard_tokens=500).collect()}
    release_persisted()
    rows = sorted(
        (r["doc_id"], len(r["text"].split()))
        for r in docs.select("doc_id", "text").collect()
    )
    want = {}
    cum = 0
    for _id, nt in rows:
        sid = cum // 500
        cum += nt
        d, t = want.get(sid, (0, 0))
        want[sid] = (d + 1, t + nt)
    assert got == want


def test_shard_plan_shards_are_token_balanced(spark):
    from clinical_data_lake_spark.llm.corpus import shard_plan

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = shard_plan(docs, shard_tokens=1000).collect()
    release_persisted()
    # every shard except possibly the last must reach the budget
    # (a doc straddles its start shard, so >= budget - max_doc_tokens
    # is the guarantee; use >= 1000 - 200 conservatively)
    sids = sorted(r["shard_id"] for r in out)
    assert sids == list(range(len(sids)))  # contiguous from 0
    for r in out:
        if r["shard_id"] != sids[-1]:
            assert r["n_tokens"] >= 800


def test_shard_plan_rejects_bad_budget(spark):
    from clinical_data_lake_spark.llm.corpus import shard_plan

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    with pytest.raises(ValueError):
        shard_plan(docs, shard_tokens=0)
