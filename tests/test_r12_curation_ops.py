"""Closed-form units for the r12 session-3 training-data curation pack:
cluster_safe_split, dup_rate_profile, ngram_diversity, zipf_fit,
pii_profile, embedding_norm_profile, truncation_loss."""

from __future__ import annotations

import math

import pytest

from clinical_data_lake_spark.functions.text import (
    ngram_diversity,
    pii_profile,
    zipf_fit,
)
from clinical_data_lake_spark.llm.dedup import (
    cluster_safe_split,
    dup_rate_profile,
)
from clinical_data_lake_spark.llm.packing import truncation_loss
from clinical_data_lake_spark.llm.similarity import embedding_norm_profile
from clinical_data_lake_spark.operators.sampling import hash_split


# ---------------------------------------------------------------- split


def _docs(spark, ids):
    return spark.createDataFrame([(i, f"text {i}") for i in ids],
                                 "doc_id long, text string")


def test_cluster_safe_split_keeps_clusters_together(spark):
    docs = _docs(spark, range(1, 8))
    # clusters: {1,2,3} (chain), {5,6}; 4 and 7 are singletons
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    out = {r.doc_id: r for r in cluster_safe_split(docs, pairs).collect()}
    assert len(out) == 7
    # min-id cluster labels
    assert [out[i].cluster_id for i in (1, 2, 3)] == [1, 1, 1]
    assert [out[i].cluster_id for i in (5, 6)] == [5, 5]
    assert out[4].cluster_id == 4 and out[7].cluster_id == 7
    # the leakage guarantee: one split per cluster
    assert len({out[i].split for i in (1, 2, 3)}) == 1
    assert len({out[i].split for i in (5, 6)}) == 1
    # singletons match the plain hash_split of their own id
    plain = {
        r.doc_id: r.split
        for r in hash_split(docs.selectExpr("doc_id"), "doc_id").collect()
    }
    assert out[4].split == plain[4] and out[7].split == plain[7]


def test_cluster_safe_split_covers_all_docs_once(spark):
    docs = _docs(spark, range(100))
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40, 2)], "doc_a long, doc_b long"
    )
    rows = cluster_safe_split(docs, pairs).collect()
    assert len(rows) == 100
    assert {r.split for r in rows} <= {"train", "val", "test"}


# ------------------------------------------------------------- dup rate


def test_dup_rate_profile_closed_form(spark):
    docs = spark.createDataFrame(
        [
            ("en", "s0", "a b"),
            ("en", "s0", "A  b "),   # normalizes to the same text
            ("en", "s0", "c"),
            ("fr", "s1", "x"),
        ],
        "lang string, source string, text string",
    )
    out = {(r.lang, r.source): r for r in dup_rate_profile(docs).collect()}
    en = out[("en", "s0")]
    assert (en.n_docs, en.n_distinct, en.n_redundant, en.max_group) == (
        3, 2, 1, 2,
    )
    assert en.dup_rate == pytest.approx(round(1 / 3, 6))
    fr = out[("fr", "s1")]
    assert (fr.n_docs, fr.n_distinct, fr.n_redundant, fr.dup_rate) == (
        1, 1, 0, 0.0,
    )


# ------------------------------------------------------------ diversity


def test_ngram_diversity_closed_form(spark):
    docs = spark.createDataFrame(
        [("en", "a b c d"), ("en", "a b c"), ("fr", "p q")],
        "lang string, text string",
    )
    out = {r.lang: r for r in ngram_diversity(docs).collect()}
    # en trigrams: "a b c", "b c d", "a b c" -> 3 total, 2 distinct
    assert (out["en"].n_ngrams, out["en"].n_distinct) == (3, 2)
    assert out["en"].diversity == pytest.approx(round(2 / 3, 6))
    # fr has no trigram (2 tokens) -> no row
    assert "fr" not in out


# ----------------------------------------------------------------- zipf


def test_zipf_fit_recovers_exact_power_law(spark):
    # frequencies 24/r at ranks 1..4 -> slope exactly -1,
    # intercept ln(24)
    words = (["aa"] * 24) + (["bb"] * 12) + (["cc"] * 8) + (["dd"] * 6)
    docs = spark.createDataFrame(
        [("en", " ".join(words))], "lang string, text string"
    )
    r = zipf_fit(docs).collect()[0]
    assert r.n_terms == 4
    assert r.zipf_slope == pytest.approx(-1.0, abs=1e-9)
    assert r.zipf_intercept == pytest.approx(math.log(24.0), abs=1e-9)


def test_zipf_fit_flat_distribution_zero_slope(spark):
    # equal frequencies -> ln f constant -> slope 0
    docs = spark.createDataFrame(
        [("en", "aa bb cc dd aa bb cc dd")], "lang string, text string"
    )
    r = zipf_fit(docs).collect()[0]
    assert r.zipf_slope == pytest.approx(0.0, abs=1e-12)
    assert r.zipf_intercept == pytest.approx(math.log(2.0), abs=1e-9)


# ------------------------------------------------------------------ pii


def test_pii_profile_planted_matches(spark):
    docs = spark.createDataFrame(
        [
            ("en", "s0", "contact a@b.com or c@d.org today"),
            ("en", "s0", "call 12345 now"),
            ("en", "s0", "clean text"),
        ],
        "lang string, source string, text string",
    )
    r = pii_profile(docs).collect()[0]
    assert (r.n_docs, r.docs_with_email, r.n_emails) == (3, 1, 2)
    assert (r.docs_with_number, r.n_numbers) == (1, 1)
    assert r.email_rate == pytest.approx(round(1 / 3, 6))
    assert r.number_rate == pytest.approx(round(1 / 3, 6))


def test_pii_profile_short_digit_runs_dont_count(spark):
    docs = spark.createDataFrame(
        [("en", "s0", "room 101 floor 3")],
        "lang string, source string, text string",
    )
    r = pii_profile(docs).collect()[0]
    assert r.n_numbers == 0 and r.docs_with_number == 0


# ----------------------------------------------------------------- norm


def test_embedding_norm_profile_closed_form(spark):
    emb = spark.createDataFrame(
        [
            (0, [3.0, 4.0], 0),     # norm 5
            (1, [1.0, 0.0], 0),     # unit
            (2, [0.0, 0.0], 0),     # dead
            (3, [0.6, 0.8], 1),     # unit
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = {r.label: r for r in embedding_norm_profile(emb).collect()}
    z = out[0]
    assert z.n_vectors == 3
    assert z.mean_norm == pytest.approx(2.0)
    assert (z.min_norm, z.max_norm) == (0.0, 5.0)
    assert z.dead_frac == pytest.approx(round(1 / 3, 6))
    assert z.unit_frac == pytest.approx(round(1 / 3, 6))
    assert out[1].unit_frac == pytest.approx(1.0)


# ------------------------------------------------------------ truncation


def test_truncation_loss_closed_form(spark):
    docs = spark.createDataFrame(
        [("en", " ".join(["w"] * 3)), ("en", " ".join(["w"] * 10))],
        "lang string, text string",
    )
    out = {
        r.max_len: r
        for r in truncation_loss(docs, limits=(4, 8)).collect()
    }
    assert (out[4].n_docs, out[4].n_truncated) == (2, 1)
    assert (out[4].n_tokens, out[4].n_tokens_lost) == (13, 6)
    assert out[4].loss_rate == pytest.approx(round(6 / 13, 6))
    assert (out[8].n_truncated, out[8].n_tokens_lost) == (1, 2)
    assert out[8].loss_rate == pytest.approx(round(2 / 13, 6))


def test_truncation_loss_requires_limits(spark):
    docs = spark.createDataFrame([("en", "a b")], "lang string, text string")
    with pytest.raises(ValueError):
        truncation_loss(docs, limits=())


# ----------------------------------------------------- batch 2: bounds


def test_embedding_clip_bounds_closed_form(spark):
    from clinical_data_lake_spark.llm.similarity import embedding_clip_bounds

    emb = spark.createDataFrame(
        [(i, [float(v)]) for i, v in enumerate([0.0, 1.0, 2.0, 3.0, 100.0])],
        "vec_id long, embedding array<float>",
    )
    r = embedding_clip_bounds(emb).collect()[0]
    # quantile_cont over [0,1,2,3,100]: p01 = 0 + 0.04*(1-0) = 0.04,
    # p99 = 3 + 0.96*(100-3) = 96.12; 0.0 and 100.0 fall outside
    assert r.pos == 0 and r.n == 5
    assert r.p_lo == pytest.approx(0.04)
    assert r.p_hi == pytest.approx(96.12)
    assert r.clip_frac == pytest.approx(0.4)


def test_cross_slice_dups_closed_form(spark):
    from clinical_data_lake_spark.llm.dedup import cross_slice_dups

    docs = spark.createDataFrame(
        [
            ("s0", "a"), ("s0", "b"),
            ("s1", "a"),
            ("s2", "a"), ("s2", "b"), ("s2", "b  "),  # dup within s2
        ],
        "source string, text string",
    )
    out = {(r.slice_a, r.slice_b): r.n_shared
           for r in cross_slice_dups(docs).collect()}
    assert out == {("s0", "s1"): 1, ("s0", "s2"): 2, ("s1", "s2"): 1}


def test_mixture_plan_replays_rate_formula(spark):
    import math

    from clinical_data_lake_spark.llm.corpus import mixture_plan

    docs = spark.createDataFrame(
        [("en", "w w")] * 4 + [("fr", "w w w")],
        "lang string, text string",
    )
    out = {r.lang: r for r in mixture_plan(docs).collect()}
    n, wsum = 5, math.sqrt(4) + math.sqrt(1)
    for lang, n_docs, n_tokens in (("en", 4, 8), ("fr", 1, 3)):
        rate = min(1.0, 0.5 * n * math.sqrt(n_docs) / wsum / n_docs)
        cell = math.floor(rate * 65536.0)
        r = out[lang]
        assert (r.n_docs, r.n_tokens, r.rate_65536) == (n_docs, n_tokens, cell)
        assert r.exp_tokens == pytest.approx(round(n_tokens * cell / 65536.0, 2))


def test_quantized_recall_bounded_and_typed(spark):
    from clinical_data_lake_spark.driver_queries import q_quantized_recall

    from conftest import SF_SMALL

    rows = q_quantized_recall(spark, SF_SMALL).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r.n_hit <= 10
        assert r.recall == pytest.approx(r.n_hit / 10.0)


def test_cross_slice_dups_prefix_matches_shared_openings(spark):
    from clinical_data_lake_spark.llm.dedup import cross_slice_dups

    opening = " ".join(f"w{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            ("s0", opening + " tail one"),
            ("s1", opening + " different ending"),
            ("s0", "something else entirely"),
        ],
        "source string, text string",
    )
    # full-text: nothing shared
    assert cross_slice_dups(docs).count() == 0
    # prefix-8: the shared opening counts
    out = cross_slice_dups(docs, prefix_words=8).collect()
    assert len(out) == 1
    assert (out[0].slice_a, out[0].slice_b, out[0].n_shared) == ("s0", "s1", 1)


# ------------------------------------------------------ batch 3: leaks


def test_split_leakage_audit_counts_cross_split_pairs(spark):
    from clinical_data_lake_spark.llm.dedup import split_leakage_audit

    pairs = spark.createDataFrame(
        [(1, 2), (3, 4)], "doc_a long, doc_b long"
    )
    assignment = spark.createDataFrame(
        [(1, "train"), (2, "val"), (3, "train"), (4, "train")],
        "doc_id long, split string",
    )
    out = {(r.split_a, r.split_b): r
           for r in split_leakage_audit(pairs, assignment).collect()}
    assert out[("train", "val")].n_pairs == 1
    assert out[("train", "val")].leaked == 1
    assert out[("train", "train")].n_pairs == 1
    assert out[("train", "train")].leaked == 0


def test_cluster_safe_split_audit_is_leak_free(spark):
    from clinical_data_lake_spark.llm.dedup import (
        cluster_safe_split,
        split_leakage_audit,
    )

    docs = _docs(spark, range(200))
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 120, 2)]
        + [(i, i + 2) for i in range(0, 60, 3)],
        "doc_a long, doc_b long",
    )
    safe = cluster_safe_split(docs, pairs)
    audit = split_leakage_audit(pairs, safe).collect()
    # THE property cluster_safe_split sells: zero off-diagonal pairs
    assert all(r.leaked == 0 for r in audit)
    assert sum(r.n_pairs for r in audit) == pairs.count()


def test_lang_mismatch_profile_closed_form(spark):
    from clinical_data_lake_spark.functions.text import lang_mismatch_profile

    docs = spark.createDataFrame(
        [
            ("en", "the cat sat"),        # pred en
            ("en", "der und die sind"),   # pred de (mislabeled)
            ("fr", "zz qq ww"),           # pred und
        ],
        "lang string, text string",
    )
    out = {(r.lang, r.pred_lang): r
           for r in lang_mismatch_profile(docs).collect()}
    assert out[("en", "en")].n_docs == 1
    assert out[("en", "de")].n_docs == 1
    assert out[("en", "de")].cell_rate == pytest.approx(0.5)
    assert out[("fr", "und")].cell_rate == pytest.approx(1.0)


def test_cluster_safe_split_empty_pair_graph(spark):
    """No near-dup pairs at all: every doc is its own cluster and the
    split equals the plain hash split exactly."""
    docs = _docs(spark, range(10))
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    out = {r.doc_id: r for r in cluster_safe_split(docs, pairs).collect()}
    plain = {
        r.doc_id: r.split
        for r in hash_split(docs.selectExpr("doc_id"), "doc_id").collect()
    }
    assert len(out) == 10
    assert all(out[i].cluster_id == i and out[i].split == plain[i]
               for i in range(10))
