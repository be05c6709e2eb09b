"""Units for the round-7 quality/linkage operators: blocked fuzzy join,
bigram LM scoring, alpha-mixture sampling, winsorization. Each operator
also has a DuckDB oracle twin (test_oracle_parity.py); these tests pin
the closed-form/boundary behaviors the hash compare can't explain.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from clinical_data_lake_spark.functions.text import bigram_lm_scores
from clinical_data_lake_spark.operators.aggregates import winsorize
from clinical_data_lake_spark.operators.joins import fuzzy_join
from clinical_data_lake_spark.operators.sampling import (
    alpha_mixture_rates,
    sample_alpha_mixture,
)


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


NAMES = [
    "warfarin", "warfarn", "warfarin na", "apixaban", "apixabann",
    "metformin", "metformin er", "metfromin", "a", "ab", "abc",
    "xx", "yy", "zzzz", "metforminhydrochloride",
]


class TestFuzzyJoin:
    def test_matches_brute_force_exactly(self, spark):
        """Length-band blocking is lossless: the emitted pair set equals
        the brute-force levenshtein filter, including pairs whose
        length range straddles two band boundaries (3-band case)."""
        for d in (0, 1, 2, 3):
            want = sorted(
                (a, b, _levenshtein(a, b))
                for a in NAMES
                for b in NAMES
                if _levenshtein(a, b) <= d
            )
            a = spark.createDataFrame([(n,) for n in NAMES], ["name_a"])
            b = spark.createDataFrame([(n,) for n in NAMES], ["name_b"])
            got = sorted(
                (r.name_a, r.name_b, r.edit_dist)
                for r in fuzzy_join(a, b, "name_a", "name_b", max_dist=d).collect()
            )
            assert got == want, f"max_dist={d}"

    def test_zero_distance_is_equality_join(self, spark):
        a = spark.createDataFrame([(n,) for n in NAMES], ["name_a"])
        b = spark.createDataFrame([(n,) for n in NAMES], ["name_b"])
        got = fuzzy_join(a, b, "name_a", "name_b", max_dist=0).collect()
        assert sorted(r.name_a for r in got) == sorted(NAMES)
        assert all(r.name_a == r.name_b and r.edit_dist == 0 for r in got)

    def test_prefix_blocking_drops_cross_prefix_pairs(self, spark):
        """block_prefix trades recall: 'metformin'/'metfromin' share the
        3-char prefix and survive; 'warfarin'/'arfarin'-style pairs
        differing at position 1 do not."""
        rows = [("metformin",), ("metfromin",), ("warfarin",), ("aarfarin",)]
        a = spark.createDataFrame(rows, ["name_a"])
        b = spark.createDataFrame(rows, ["name_b"])
        got = {
            (r.name_a, r.name_b)
            for r in fuzzy_join(
                a, b, "name_a", "name_b", max_dist=2, block_prefix=3
            ).collect()
            if r.name_a < r.name_b
        }
        assert ("metformin", "metfromin") in got
        assert ("aarfarin", "warfarin") not in got


class TestBigramLM:
    def test_closed_form_two_doc_corpus(self, spark):
        """Hand-computed smoothed bigram probabilities on a 2-doc corpus."""
        docs = spark.createDataFrame(
            [(1, "a b a b"), (2, "a b")], ["doc_id", "text"]
        )
        out = {r.doc_id: r for r in bigram_lm_scores(docs).collect()}
        # unigram counts: a->3, b->3 ; V=2 ; bigrams: 'a b'x3, 'b a'x1
        p_ab = (3 + 0.5) / (3 + 0.5 * 2)
        p_ba = (1 + 0.5) / (3 + 0.5 * 2)
        lp_ab = round(math.log(p_ab), 6)
        lp_ba = round(math.log(p_ba), 6)
        assert out[1].n_bigrams == 3
        assert out[1].avg_logprob == pytest.approx(
            round((2 * lp_ab + lp_ba) / 3, 6), abs=2e-6
        )
        assert out[2].n_bigrams == 1
        assert out[2].avg_logprob == pytest.approx(lp_ab, abs=2e-6)

    def test_short_docs_get_null_score(self, spark):
        docs = spark.createDataFrame(
            [(1, "word"), (2, ""), (3, "two tokens here")], ["doc_id", "text"]
        )
        out = {r.doc_id: r for r in bigram_lm_scores(docs).collect()}
        assert out[1].n_bigrams == 0 and out[1].avg_logprob is None
        assert out[2].n_bigrams == 0 and out[2].avg_logprob is None
        assert out[3].n_bigrams == 2 and out[3].avg_logprob is not None

    def test_repetitive_text_scores_higher(self, spark):
        """A looping document is more predictable under the corpus LM
        than a same-length all-distinct document — the signal the
        quality gate thresholds on."""
        docs = spark.createDataFrame(
            [(1, "spam ham " * 50), (2, " ".join(f"w{i}" for i in range(100)))],
            ["doc_id", "text"],
        )
        out = {r.doc_id: r.avg_logprob for r in bigram_lm_scores(docs).collect()}
        assert out[1] > out[2]


class TestAlphaMixture:
    GROUPS = [("en", 800), ("de", 150), ("fr", 50)]

    def _docs(self, spark):
        rows = [
            (f"{g}-{i}", g) for g, n in self.GROUPS for i in range(n)
        ]
        return spark.createDataFrame(rows, ["doc_id", "lang"])

    def test_alpha_one_is_uniform_rate(self, spark):
        """alpha=1 keeps natural proportions: every group's rate is the
        global target fraction."""
        rates = {
            r.lang: r.rate_65536
            for r in alpha_mixture_rates(
                self._docs(spark), "lang", alpha=1.0, target_frac=0.25
            ).collect()
        }
        assert all(v == int(0.25 * 65536) for v in rates.values())

    def test_alpha_zero_equalizes_group_volumes(self, spark):
        """alpha=0: every group contributes the same EXPECTED row count
        (T/3 each), so per-group rates scale inversely with size."""
        rates = {
            r.lang: r.rate_65536
            for r in alpha_mixture_rates(
                self._docs(spark), "lang", alpha=0.0, target_frac=0.3
            ).collect()
        }
        t_per_group = 0.3 * 1000 / 3
        for g, n in self.GROUPS:
            want = min(1.0, t_per_group / n)
            assert rates[g] == int(want * 65536)

    def test_small_groups_flatten_under_low_alpha(self, spark):
        """0 < alpha < 1 up-samples the tail relative to the head."""
        rates = {
            r.lang: r.rate_65536
            for r in alpha_mixture_rates(
                self._docs(spark), "lang", alpha=0.3, target_frac=0.5
            ).collect()
        }
        assert rates["fr"] > rates["de"] > rates["en"]

    def test_sampling_is_deterministic_and_rate_shaped(self, spark):
        docs = self._docs(spark)
        s1 = sample_alpha_mixture(docs, "lang", "doc_id", 0.5, 0.5)
        s2 = sample_alpha_mixture(docs.repartition(7), "lang", "doc_id", 0.5, 0.5)
        got1 = sorted(r.doc_id for r in s1.collect())
        got2 = sorted(r.doc_id for r in s2.collect())
        assert got1 == got2  # membership is a pure function of the key
        by_lang = (
            s1.groupBy("lang").count().toPandas().set_index("lang")["count"]
        )
        # kept fraction tracks the quantized rate within md5 noise
        rates = {
            r.lang: r.rate_65536 / 65536
            for r in alpha_mixture_rates(docs, "lang", 0.5, 0.5).collect()
        }
        for g, n in self.GROUPS:
            assert abs(by_lang[g] / n - rates[g]) < 0.12


class TestWinsorize:
    def test_clamps_to_group_percentiles(self, spark):
        rows = [("a", i, float(i)) for i in range(1, 101)] + [("b", 0, 1000.0)]
        df = spark.createDataFrame(rows, ["grp", "rid", "value"])
        out = winsorize(df, ["grp"], "value", lower=0.10, upper=0.90)
        a_vals = [r.value_winsor for r in out.filter("grp = 'a'").collect()]
        # exact interpolated p10/p90 of 1..100 are 10.9 and 90.1
        assert min(a_vals) == pytest.approx(10.9)
        assert max(a_vals) == pytest.approx(90.1)
        # interior values pass through untouched
        mid = out.filter("grp = 'a' AND rid = 50").head()
        assert mid.value_winsor == 50.0
        # singleton group: both bounds equal the value, identity
        b = out.filter("grp = 'b'").head()
        assert b.value_winsor == 1000.0

    def test_no_fact_shuffle(self, spark):
        """The fact side must reach the join without an Exchange — the
        bounds table broadcasts."""
        df = spark.range(1000).select(
            (F.col("id") % 3).alias("grp"), F.col("id").cast("double").alias("value")
        )
        plan = winsorize(df, ["grp"], "value")._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestBM25:
    def test_closed_form_two_docs(self, spark):
        import math

        from clinical_data_lake_spark.functions.text import bm25_scores

        docs = spark.createDataFrame(
            [(1, "hash hash join"), (2, "sort sort sort"), (3, "hash sort")],
            ["doc_id", "text"],
        )
        out = {r.doc_id: r for r in bm25_scores(docs, ["hash"]).collect()}
        # N=3, df(hash)=2, dl1=3, dl3=2, avgdl=8/3
        idf = math.log(1 + (3 - 2 + 0.5) / (2 + 0.5))
        def s(tf, dl):
            return round(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / (8 / 3))), 6)
        assert out[1].n_matched == 1
        assert out[1].score == pytest.approx(s(2, 3), abs=2e-6)
        assert out[3].score == pytest.approx(s(1, 2), abs=2e-6)
        assert out[2].n_matched == 0 and out[2].score == 0.0

    def test_rarer_term_scores_higher(self, spark):
        from clinical_data_lake_spark.functions.text import bm25_scores

        docs = spark.createDataFrame(
            [(i, "common filler words here") for i in range(20)]
            + [(100, "common rare")],
            ["doc_id", "text"],
        )
        out = {r.doc_id: r.score for r in bm25_scores(docs, ["common", "rare"]).collect()}
        assert out[100] > max(v for k, v in out.items() if k != 100)


class TestRRF:
    def test_fusion_prefers_docs_in_both_lists(self, spark):
        from clinical_data_lake_spark.llm.similarity import rrf_fuse

        a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], ["id", "rnk"])
        b = spark.createDataFrame([(3, 1), (4, 2)], ["id", "rnk"])
        out = rrf_fuse(a, b, "id", top=10).collect()
        order = [r.id for r in out]
        # doc 3 (rank 3 + rank 1) beats doc 1 (rank 1 only)
        assert order[0] == 3
        assert set(order) == {1, 2, 3, 4}
        got3 = [r for r in out if r.id == 3][0]
        assert got3.rrf == pytest.approx(1 / 63 + 1 / 61, abs=1e-6)
        got4 = [r for r in out if r.id == 4][0]
        assert got4.rank_a is None and got4.rank_b == 2

    def test_top_truncation_deterministic(self, spark):
        from clinical_data_lake_spark.llm.similarity import rrf_fuse

        a = spark.createDataFrame([(i, i + 1) for i in range(30)], ["id", "rnk"])
        b = spark.createDataFrame([(i + 100, i + 1) for i in range(30)], ["id", "rnk"])
        out = rrf_fuse(a, b, "id", top=5).collect()
        # equal contributions tie -> id tiebreak picks the smallest ids
        assert [r.id for r in out] == [0, 100, 1, 101, 2]


class TestClassTfidf:
    def test_distinctive_terms_rank_first(self, spark):
        """A term exclusive to one class must out-rank terms shared by
        every class within that class's keyword list."""
        from clinical_data_lake_spark.functions.text import class_tfidf_terms

        docs = spark.createDataFrame(
            [
                (1, "a", "common words everywhere plus warfarin warfarin"),
                (2, "a", "common words everywhere plus warfarin dosing"),
                (3, "b", "common words everywhere plus metformin metformin"),
                (4, "b", "common words everywhere plus metformin dosing"),
            ],
            ["doc_id", "cls", "text"],
        )
        out = class_tfidf_terms(docs, "cls", top_k=3).collect()
        top = {r.cls: [x.term for x in sorted(out, key=lambda y: y.rnk) if x.cls == r.cls]
               for r in out}
        assert top["a"][0] == "warfarin"
        assert top["b"][0] == "metformin"
        # shared filler never beats the class-exclusive term
        for cls in ("a", "b"):
            assert "common" not in top[cls][:1]

    def test_top_k_and_determinism(self, spark):
        from clinical_data_lake_spark.functions.text import class_tfidf_terms

        docs = spark.createDataFrame(
            [(i, f"c{i % 3}", f"w{i % 7} w{(i + 1) % 7} shared") for i in range(60)],
            ["doc_id", "cls", "text"],
        )
        out1 = sorted(map(tuple, class_tfidf_terms(docs, "cls", top_k=4).collect()))
        out2 = sorted(map(tuple, class_tfidf_terms(docs.repartition(7), "cls", top_k=4).collect()))
        assert out1 == out2
        per_cls = {}
        for cls, term, w, rnk in out1:
            per_cls.setdefault(cls, []).append(rnk)
        assert all(sorted(v) == list(range(1, 5)) for v in per_cls.values())


class TestAsofTolerance:
    def test_stale_matches_null_out(self, spark):
        import datetime as dt

        from clinical_data_lake_spark.operators.joins import asof_join

        t0 = dt.datetime(2024, 1, 10)
        left = spark.createDataFrame(
            [(1, 7, t0), (2, 7, t0 + dt.timedelta(days=5))],
            ["eid", "k", "ts"],
        )
        right = spark.createDataFrame(
            [(7, t0 - dt.timedelta(days=2), 100.0)], ["k", "rts", "val"]
        )
        out = {
            r.eid: r.val
            for r in asof_join(
                left, right, "k", "ts", "rts", ["val"], tolerance_s=3 * 86400
            ).collect()
        }
        assert out[1] == 100.0       # 2 days old: within the 3-day bound
        assert out[2] is None        # 7 days old: stale -> nulled, row kept
        assert len(out) == 2

    def test_no_tolerance_unchanged(self, spark):
        import datetime as dt

        from clinical_data_lake_spark.operators.joins import asof_join

        t0 = dt.datetime(2024, 1, 10)
        left = spark.createDataFrame([(1, 7, t0)], ["eid", "k", "ts"])
        right = spark.createDataFrame(
            [(7, t0 - dt.timedelta(days=365), 5.0)], ["k", "rts", "val"]
        )
        r = asof_join(left, right, "k", "ts", "rts", ["val"]).head()
        assert r.val == 5.0  # without tolerance, arbitrarily old matches carry


# ------------------------------------------------ Fellegi-Sunter score

def test_fs_match_score_closed_form(spark):
    import math

    from pyspark.sql import Row

    from clinical_data_lake_spark.operators.joins import fs_match_score

    pairs = spark.createDataFrame(
        [Row(pid=1, a=True, b=True), Row(pid=2, a=True, b=False),
         Row(pid=3, a=False, b=False), Row(pid=4, a=None, b=True)]
    )
    out = {r.pid: r for r in fs_match_score(
        pairs,
        {"f1": (F.col("a"), 0.9, 0.1), "f2": (F.col("b"), 0.8, 0.4)},
        threshold=3.0,
    ).collect()}
    w1a, w1d = math.log2(9), math.log2(0.1 / 0.9)
    w2a, w2d = math.log2(2), math.log2(0.2 / 0.6)
    assert abs(out[1].score - round(w1a + w2a, 6)) < 1e-9
    assert out[1].is_match is True
    assert abs(out[2].score - round(w1a + w2d, 6)) < 1e-9
    assert out[2].is_match is False
    # NULL agreement counts as disagreement, explicitly
    assert out[4].agree_f1 is False
    assert abs(out[4].score - round(w1d + w2a, 6)) < 1e-9


def test_fs_match_score_rejects_bad_mu(spark):
    from pyspark.sql import Row

    from clinical_data_lake_spark.operators.joins import fs_match_score

    pairs = spark.createDataFrame([Row(a=True)])
    with pytest.raises(ValueError, match="must be in"):
        fs_match_score(pairs, {"f": (F.col("a"), 1.0, 0.1)})
