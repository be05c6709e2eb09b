"""r10 operators: duplicated-gram coverage, RFM segmentation,
fairness audit, Poisson bootstrap, l-diversity detail."""

from __future__ import annotations

import hashlib
import math

import pytest

from clinical_data_lake_spark.llm.dedup import dup_gram_coverage
from clinical_data_lake_spark.ml.stats import (
    POISSON1_CDF,
    fairness_audit,
    poisson_bootstrap_mean,
)
from clinical_data_lake_spark.operators.cohort import rfm_segments
from clinical_data_lake_spark.operators.quality import l_diversity_classes


# -- dup_gram_coverage --------------------------------------------------


def test_dup_gram_coverage_closed_form(spark):
    # doc 1 and doc 2 share the run "a b c d e" exactly once; all other
    # grams are unique. doc 3 is too short for any 5-gram.
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g"),  # grams: abcde bcdef cdefg -> 3
            (2, "x a b c d e y"),  # grams: xabcd abcde bcdey -> 3
            (3, "p q r s"),  # no 5-gram
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dup_gram_coverage(docs, n=5).collect()}
    assert set(out) == {1, 2}
    for d in (1, 2):
        assert out[d].n_grams == 3
        assert out[d].dup_grams == 1  # only "a b c d e"
        assert out[d].dup_fraction == pytest.approx(round(1 / 3, 6))


def test_dup_gram_coverage_counts_positions_not_types(spark):
    # the same duplicated gram occurring twice IN one doc counts both
    # positions (coverage, not vocabulary)
    docs = spark.createDataFrame(
        [
            (1, "a b c d e z a b c d e"),  # "a b c d e" at 2 positions
            (2, "a b c d e"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dup_gram_coverage(docs, n=5).collect()}
    assert out[1].n_grams == 7
    assert out[1].dup_grams == 2
    assert out[2].n_grams == 1 and out[2].dup_grams == 1


# -- rfm_segments -------------------------------------------------------


def test_rfm_scores_on_five_distinct_customers(spark):
    # five customers with strictly increasing frequency/monetary and
    # strictly increasing recency -> scores are exactly 1..5 (and the
    # recency score inverts)
    rows = []
    for i in range(1, 6):  # customer i: i orders, last order day i
        for j in range(i):
            rows.append((i, f"2024-01-{i:02d}", 100.0 * i))
    orders = spark.createDataFrame(
        rows, "o_custkey long, d string, o_totalprice double"
    ).selectExpr(
        "o_custkey", "CAST(d AS TIMESTAMP) AS o_orderdate", "o_totalprice"
    )
    out = {r.key: r for r in rfm_segments(orders).collect()}
    assert len(out) == 5
    for i in range(1, 6):
        r = out[i]
        assert r.frequency == i
        assert r.monetary == pytest.approx(100.0 * i * i)
        assert r.f_score == i
        # most recent (largest day) -> rec_days smallest -> score 5
        assert r.r_score == i
        assert r.rfm == f"{r.r_score}{r.f_score}{r.m_score}"
    # monetary strictly increases with i here (100*i^2), so m_score = i
    assert [out[i].m_score for i in range(1, 6)] == [1, 2, 3, 4, 5]


def test_rfm_identical_customers_all_mid_scores(spark):
    # all customers identical -> every value sits ON every boundary ->
    # strict comparisons never fire -> all scores 1 + (inverted) 1
    orders = spark.createDataFrame(
        [(i, "2024-03-01", 50.0) for i in range(1, 4)],
        "o_custkey long, d string, o_totalprice double",
    ).selectExpr(
        "o_custkey", "CAST(d AS TIMESTAMP) AS o_orderdate", "o_totalprice"
    )
    for r in rfm_segments(orders).collect():
        assert (r.r_score, r.f_score, r.m_score) == (1, 1, 1)


# -- fairness_audit -----------------------------------------------------


def test_fairness_audit_closed_form(spark):
    # group A: 2 TP, 1 FP, 1 TN, 0 FN ; group B: 0 TP, 0 FP, 2 TN, 2 FN
    rows = [
        ("A", 1.0, True), ("A", 1.0, True), ("A", 1.0, False), ("A", 0.0, False),
        ("B", 0.0, True), ("B", 0.0, True), ("B", 0.0, False), ("B", 0.0, False),
    ]
    df = spark.createDataFrame(rows, "g string, score double, label boolean")
    out = {r.g: r for r in
           fairness_audit(df, "g", "score", "label", threshold=0.5).collect()}
    a, b = out["A"], out["B"]
    assert (a.n, b.n) == (4, 4)
    assert a.pred_pos_rate == pytest.approx(0.75)
    assert b.pred_pos_rate == pytest.approx(0.0)
    assert a.tpr == pytest.approx(1.0)
    assert b.tpr == pytest.approx(0.0)
    # overall: pred-pos 3/8, tpr 2/4
    assert a.dp_gap == pytest.approx(0.75 - 3 / 8)
    assert b.dp_gap == pytest.approx(0.0 - 3 / 8)
    assert a.eo_gap == pytest.approx(1.0 - 0.5)
    assert b.eo_gap == pytest.approx(0.0 - 0.5)


def test_fairness_audit_null_rates_when_undefined(spark):
    # group with no positive labels: tpr undefined -> NULL, eo_gap NULL
    rows = [("A", 1.0, False), ("A", 0.0, False), ("B", 1.0, True)]
    df = spark.createDataFrame(rows, "g string, score double, label boolean")
    out = {r.g: r for r in
           fairness_audit(df, "g", "score", "label", threshold=0.5).collect()}
    assert out["A"].tpr is None and out["A"].eo_gap is None
    assert out["A"].fpr == pytest.approx(0.5)
    assert out["B"].fpr is None  # no negatives in B


# -- poisson_bootstrap_mean ---------------------------------------------


def _py_poisson_weight(doc_id: int, b: int) -> int:
    grp = (b - 1) // 4 + 1
    slot = (b - 1) % 4
    h = hashlib.md5(f"{doc_id}|{grp}".encode()).hexdigest()
    u = int(h[slot * 8:slot * 8 + 8], 16) / 2.0**32
    for k, c in enumerate(POISSON1_CDF):
        if u <= c:
            return k
    return len(POISSON1_CDF)


def test_poisson_bootstrap_matches_pure_python_reference(spark):
    vals = [(i, float(10 + i)) for i in range(1, 31)]
    df = spark.createDataFrame(vals, "id long, v double")
    n_boot = 25
    got = poisson_bootstrap_mean(df, "id", "v", n_boot=n_boot).collect()[0]
    # replicate means computed independently in pure python
    means = []
    for b in range(1, n_boot + 1):
        sw = swx = 0
        for i, v in vals:
            w = _py_poisson_weight(i, b)
            sw += w
            swx += w * v
        means.append(round(swx / sw, 9))
    means.sort()

    def q_cont(sorted_vals, p):
        idx = (len(sorted_vals) - 1) * p
        lo, hi = math.floor(idx), math.ceil(idx)
        frac = idx - lo
        return sorted_vals[lo] + (sorted_vals[hi] - sorted_vals[lo]) * frac

    assert got.n == 30 and got.n_boot == n_boot
    assert got.mean == pytest.approx(round(sum(v for _, v in vals) / 30, 6))
    assert got.ci_lo == pytest.approx(round(q_cont(means, 0.025), 6), abs=1e-6)
    assert got.ci_hi == pytest.approx(round(q_cont(means, 0.975), 6), abs=1e-6)
    assert got.ci_lo <= got.mean <= got.ci_hi


def test_poisson_bootstrap_constant_column_degenerate_ci(spark):
    df = spark.createDataFrame(
        [(i, 7.5) for i in range(1, 50)], "id long, v double"
    )
    got = poisson_bootstrap_mean(df, "id", "v", n_boot=10).collect()[0]
    assert got.mean == got.ci_lo == got.ci_hi == pytest.approx(7.5)


# -- l_diversity_classes ------------------------------------------------


def test_l_diversity_flags_and_entropy(spark):
    rows = (
        # class (1,'X'): 3 equally likely values -> entropy_l = 3, ok
        [(1, "X", v) for v in (1, 2, 3)]
        # class (2,'Y'): one value only -> distinct 1, entropy_l 1, not ok
        + [(2, "Y", 9)] * 4
        # class (3,'Z'): skewed 8/1/1 -> distinct 3 but entropy_l < 3
        + [(3, "Z", 1)] * 8
        + [(3, "Z", 2), (3, "Z", 3)]
    )
    df = spark.createDataFrame(rows, "q1 int, q2 string, s int")
    out = {(r.q1, r.q2): r for r in
           l_diversity_classes(df, ["q1", "q2"], "s", l=3).collect()}
    assert out[(1, "X")].entropy_l == pytest.approx(3.0, abs=1e-5)
    assert out[(1, "X")].ok is True
    assert out[(2, "Y")].distinct_l == 1
    assert out[(2, "Y")].entropy_l == pytest.approx(1.0)
    assert out[(2, "Y")].ok is False
    z = out[(3, "Z")]
    assert z.distinct_l == 3 and z.class_size == 10
    # entropy of (0.8, 0.1, 0.1) with 6dp-rounded terms
    terms = [round(-p * math.log(p), 6) for p in (0.8, 0.1, 0.1)]
    assert z.entropy_l == pytest.approx(round(math.exp(sum(terms)), 6))
    assert z.ok is False


# -- label_propagation ---------------------------------------------------


def test_lpa_two_cliques_with_bridge(spark):
    from clinical_data_lake_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)],
        "src long, dst long",
    )
    out = {r.node: r.label for r in label_propagation(edges, k=3).collect()}
    # hand-run of the synchronous min-tie-break schedule: the two
    # triangles settle into separate communities despite the bridge
    assert out == {1: 1, 2: 1, 3: 1, 4: 3, 5: 3, 6: 3}


def test_lpa_star_oscillation_is_deterministic(spark):
    from clinical_data_lake_spark.operators.graph import label_propagation

    star = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long"
    )
    # synchronous LPA oscillates on a star: center and leaves swap
    # labels each round — after k=3 (odd) the swap is in effect; the
    # POINT is that the schedule is deterministic and replayable
    out = {r.node: r.label for r in label_propagation(star, k=3).collect()}
    assert out == {0: 1, 1: 0, 2: 0, 3: 0}
    again = {r.node: r.label for r in label_propagation(star, k=3).collect()}
    assert again == out


# -- histogram rollup ----------------------------------------------------


def test_histogram_rollup_counts_and_clamping(spark):
    from clinical_data_lake_spark.operators.aggregates import histogram_rollup

    df = spark.createDataFrame(
        [("a", -5.0), ("a", 0.0), ("a", 3.5), ("a", 9.99), ("a", 42.0)],
        "k string, v double",
    )
    out = {(r.k, r.bin): r.cnt
           for r in histogram_rollup(df, ["k"], "v", 0.0, 10.0, 10).collect()}
    # -5 clamps into bin 0 (with 0.0); 42 clamps into bin 9 (with 9.99)
    assert out == {("a", 0): 2, ("a", 3): 1, ("a", 9): 2}


def test_histogram_quantile_closed_form_and_merge_equivalence(spark):
    from clinical_data_lake_spark.operators.aggregates import (
        histogram_quantile,
        histogram_rollup,
    )

    rows = [("a", "d1" if i <= 5 else "d2", float(i)) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "k string, day string, v double")
    # direct coarse histogram
    direct = histogram_rollup(df, ["k"], "v", 0.0, 10.0, 10)
    q_direct = histogram_quantile(direct, ["k"], 0.5, 0.0, 10.0, 10).collect()[0]
    # fine (k, day) histograms merged up — must be IDENTICAL (the
    # mergeability contract: fixed bins => counts just add)
    fine = histogram_rollup(df, ["k", "day"], "v", 0.0, 10.0, 10)
    q_merged = histogram_quantile(fine, ["k"], 0.5, 0.0, 10.0, 10).collect()[0]
    assert (q_direct.n, q_direct.q_est) == (q_merged.n, q_merged.q_est) == (10, 6.0)
    # closed form: target = 5, bins 1..4 hold 4 values, bin 5 holds
    # one -> frac = (5-4)/1 -> q = (5 + 1) * width = 6.0


# -- skyline_2d ----------------------------------------------------------


def test_skyline_staircase_closed_form(spark):
    from clinical_data_lake_spark.operators.sorts import skyline_2d

    pts = [(1, 5), (2, 4), (3, 3), (2, 5), (3, 1), (0, 6), (2, 5)]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in pts], "k string, x long, y long"
    )
    got = {(r.x, r.y) for r in skyline_2d(df, ["k"], "x", "y").collect()}
    # the classic staircase: (3,3), (2,5), (0,6); (1,5) is weakly
    # dominated by (2,5), duplicates collapse
    assert got == {(3, 3), (2, 5), (0, 6)}


def test_skyline_per_group_and_single_point(spark):
    from clinical_data_lake_spark.operators.sorts import skyline_2d

    df = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, 2), ("b", 9, 9)], "k string, x long, y long"
    )
    got = {(r.k, r.x, r.y) for r in skyline_2d(df, ["k"], "x", "y").collect()}
    # (1,1) dominated inside group a; group b's lone point survives
    assert got == {("a", 2, 2), ("b", 9, 9)}


# -- ab_power_analysis ---------------------------------------------------


def test_ab_power_closed_form(spark):
    from clinical_data_lake_spark.ml.stats import Z_80, Z_975, ab_power_analysis

    rows = [("A", True)] * 30 + [("A", False)] * 70 + \
           [("B", True)] * 10 + [("B", False)] * 90
    df = spark.createDataFrame(rows, "variant string, success boolean")
    out = {r.variant: r for r in
           ab_power_analysis(df, "variant", "success").collect()}
    p = 40 / 200
    for v, n, ph in (("A", 100, 0.3), ("B", 100, 0.1)):
        r = out[v]
        assert r.n == n and r.p_hat == pytest.approx(ph)
        assert r.p_pooled == pytest.approx(p)
        want = (Z_975 + Z_80) * math.sqrt(2 * p * (1 - p) / n)
        assert r.mde_abs == pytest.approx(round(want, 6))
        assert r.mde_rel == pytest.approx(round(want / p, 6))


def test_ab_power_zero_rate_null_relative(spark):
    from clinical_data_lake_spark.ml.stats import ab_power_analysis

    df = spark.createDataFrame(
        [("A", False)] * 5 + [("B", False)] * 5, "variant string, success boolean"
    )
    for r in ab_power_analysis(df, "variant", "success").collect():
        assert r.p_pooled == 0.0 and r.mde_abs == 0.0 and r.mde_rel is None


# -- mahalanobis2 --------------------------------------------------------


def test_mahalanobis_catches_combination_outlier(spark):
    """A point typical in each coordinate but impossible as a PAIR
    must flag; univariate extremes of a correlated cloud must not."""
    from clinical_data_lake_spark.ml.stats import mahalanobis2

    rows = [(i, float(i), float(2 * i)) for i in range(1, 41)]  # y = 2x
    rows.append((99, 10.0, 70.0))  # x typical, y typical, pair absurd
    df = spark.createDataFrame(rows, "id long, x double, y double")
    out = {r.id: r for r in mahalanobis2(df, "x", "y").collect()}
    assert out[99].is_outlier is True
    # the extreme-but-on-trend ends of the cloud stay inliers
    assert out[1].is_outlier is False and out[40].is_outlier is False


def test_mahalanobis_degenerate_covariance_nulls(spark):
    from clinical_data_lake_spark.ml.stats import mahalanobis2

    # y constant: det(S) = 0 -> md2/flag NULL, no divide-by-noise
    df = spark.createDataFrame(
        [(i, float(i), 5.0) for i in range(10)], "id long, x double, y double"
    )
    for r in mahalanobis2(df, "x", "y").collect():
        assert r.md2 is None and r.is_outlier is None


# -- prefixspan_patterns -------------------------------------------------


def test_prefixspan_closed_form(spark):
    """Hand-checkable sequences: support counts entities, not
    occurrences; order need not be adjacent; ties break by the id
    order column."""
    from clinical_data_lake_spark.operators.itemsets import prefixspan_patterns

    rows = [
        # user 1: a, x, b  -> supports a, b, x, a>b, a>x, x>b, ...
        (1, 1, 1, "a"), (1, 2, 2, "x"), (1, 3, 3, "b"),
        # user 2: a, b
        (2, 1, 4, "a"), (2, 2, 5, "b"),
        # user 3: b, a  (b BEFORE a: supports b>a, not a>b)
        (3, 1, 6, "b"), (3, 2, 7, "a"),
    ]
    df = spark.createDataFrame(rows, "u long, ts long, id long, t string")
    out = {r.pattern: r.freq for r in prefixspan_patterns(
        df, "u", ["ts", "id"], "t", min_support=0.5, max_len=2
    ).collect()}
    # threshold = ceil(0.5 * 3) = 2 sequences
    assert out["a"] == 3 and out["b"] == 3
    assert out["a>b"] == 2  # users 1 and 2, NOT 3
    assert "b>a" not in out  # only user 3
    assert "x" not in out  # only user 1
    # repeated occurrences in one sequence count that entity once
    rows2 = rows + [(1, 4, 8, "b")]  # user 1 has b twice
    df2 = spark.createDataFrame(rows2, "u long, ts long, id long, t string")
    out2 = {r.pattern: r.freq for r in prefixspan_patterns(
        df2, "u", ["ts", "id"], "t", min_support=0.5, max_len=2
    ).collect()}
    assert out2["a>b"] == 2


# -- build_eras ----------------------------------------------------------


def test_build_eras_gap_bridging_and_nesting(spark):
    from clinical_data_lake_spark.operators.cohort import build_eras

    iv = spark.createDataFrame(
        [
            # era 1: 0-10 covers 5-7 (nested); gap 3 bridges 12
            ("u", "rx", 0, 10), ("u", "rx", 5, 7), ("u", "rx", 12, 14),
            # 18 > 14 + 3 -> new era
            ("u", "rx", 18, 20),
            # other concept untouched
            ("u", "dx", 0, 1),
        ],
        "k string, c string, s long, e long",
    )
    out = {(r.k, r.c, r.era_start): r
           for r in build_eras(iv, ["k", "c"], "s", "e", gap=3).collect()}
    e1 = out[("u", "rx", 0)]
    assert (e1.era_end, e1.n_events, e1.covered) == (14, 3, 14)
    e2 = out[("u", "rx", 18)]
    assert (e2.era_end, e2.n_events, e2.covered) == (20, 1, 2)
    assert out[("u", "dx", 0)].n_events == 1


def test_build_eras_duplicate_rows_merge(spark):
    from clinical_data_lake_spark.operators.cohort import build_eras

    iv = spark.createDataFrame(
        [("u", 1, 2), ("u", 1, 2), ("u", 1, 2)], "k string, s long, e long"
    )
    rows = build_eras(iv, ["k"], "s", "e", gap=0).collect()
    assert len(rows) == 1
    assert (rows[0].n_events, rows[0].covered) == (3, 3)


def test_build_eras_invalid_interval_raises(spark):
    import pytest as _pytest

    from clinical_data_lake_spark.operators.cohort import build_eras

    iv = spark.createDataFrame([("u", 5, 3)], "k string, s long, e long")
    with _pytest.raises(Exception):
        build_eras(iv, ["k"], "s", "e").collect()


# -- cohens_kappa / odds_ratio -------------------------------------------


def test_cohens_kappa_closed_forms(spark):
    from clinical_data_lake_spark.ml.stats import cohens_kappa

    # perfect agreement -> kappa 1
    df = spark.createDataFrame(
        [("x", "x")] * 5 + [("y", "y")] * 5, "ra string, rb string"
    )
    r = cohens_kappa(df, "ra", "rb").collect()[0]
    assert (r.p_o, r.kappa) == (1.0, 1.0)
    # the textbook 2x2: a=20 agree-yes, d=15 agree-no, b=5, c=10
    rows = ([("y", "y")] * 20 + [("y", "n")] * 5
            + [("n", "y")] * 10 + [("n", "n")] * 15)
    r2 = cohens_kappa(
        spark.createDataFrame(rows, "ra string, rb string"), "ra", "rb"
    ).collect()[0]
    po = 35 / 50
    pe = (25 / 50) * (30 / 50) + (25 / 50) * (20 / 50)
    import pytest as _p
    assert r2.p_o == _p.approx(po) and r2.p_e == _p.approx(pe)
    assert r2.kappa == _p.approx(round((po - pe) / (1 - pe), 6))
    # both raters constant -> p_e = 1 -> kappa NULL, not 1
    const = spark.createDataFrame([("x", "x")] * 4, "ra string, rb string")
    assert cohens_kappa(const, "ra", "rb").collect()[0].kappa is None


def test_odds_ratio_closed_form_and_zero_cell(spark):
    import math as m

    from clinical_data_lake_spark.ml.stats import Z_975, odds_ratio

    rows = ([(True, True)] * 20 + [(True, False)] * 10
            + [(False, True)] * 5 + [(False, False)] * 15)
    df = spark.createDataFrame(rows, "ex boolean, oc boolean")
    r = odds_ratio(df, "ex", "oc").collect()[0]
    want = (20 * 15) / (10 * 5)
    import pytest as _p
    assert (r.a, r.b, r.c, r.d) == (20, 10, 5, 15)
    assert r.odds_ratio == _p.approx(round(want, 6))
    se = m.sqrt(1 / 20 + 1 / 10 + 1 / 5 + 1 / 15)
    assert r.ci_lo == _p.approx(round(m.exp(m.log(want) - Z_975 * se), 6))
    assert r.ci_hi == _p.approx(round(m.exp(m.log(want) + Z_975 * se), 6))
    # zero cell -> undefined, NULLs (no silent continuity correction)
    z = spark.createDataFrame(
        [(True, True)] * 3 + [(False, False)] * 3, "ex boolean, oc boolean"
    )
    rz = odds_ratio(z, "ex", "oc").collect()[0]
    assert rz.odds_ratio is None and rz.ci_lo is None and rz.ci_hi is None


# -- growth_accounting ---------------------------------------------------


def test_growth_accounting_closed_form(spark):
    from clinical_data_lake_spark.operators.cohort import growth_accounting

    # weeks W1 (Jan 6 2025, a Monday), W2, W4:
    #   u1 active W1, W2        -> new@W1, retained@W2
    #   u2 active W1, W4        -> new@W1, resurrected@W4
    #   u3 active W2            -> new@W2, churned into W3 (no W3 row)
    rows = [
        (1, "2025-01-06"), (1, "2025-01-14"),
        (2, "2025-01-07"), (2, "2025-01-29"),
        (3, "2025-01-15"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, d string").selectExpr(
        "user_id", "CAST(d AS TIMESTAMP) AS ts"
    )
    out = {str(r.week): r for r in growth_accounting(ev).collect()}
    w1, w2, w4 = "2025-01-06", "2025-01-13", "2025-01-27"
    assert (out[w1].n_new, out[w1].n_retained, out[w1].n_churned) == (2, 0, 0)
    r2 = out[w2]
    # W2: u1 retained, u3 new; churned = active(W1)=2 - retained(W2)=1
    assert (r2.n_active, r2.n_new, r2.n_retained, r2.n_resurrected) == (2, 1, 1, 0)
    assert r2.n_churned == 1
    assert r2.quick_ratio == pytest.approx(1.0)  # (1 new + 0 res) / 1 churned
    r4 = out[w4]
    # W4: only u2 resurrected; W3 had zero active -> churned 0 -> NULL ratio
    assert (r4.n_active, r4.n_resurrected, r4.n_churned) == (1, 1, 0)
    assert r4.quick_ratio is None


# -- cuped_adjust --------------------------------------------------------


def test_cuped_removes_covariate_variance(spark):
    """With y = 2x + group_effect + small noise, CUPED must recover a
    large variance reduction and keep group means' DIFFERENCE intact
    (pooled theta preserves the contrast)."""
    import random as _r

    from clinical_data_lake_spark.ml.stats import cuped_adjust

    rnd = _r.Random(7)
    rows = []
    for g, lift in (("A", 0.0), ("B", 5.0)):
        for _ in range(400):
            x = rnd.gauss(50, 10)
            y = 2 * x + lift + rnd.gauss(0, 1)
            rows.append((g, y, x))
    df = spark.createDataFrame(rows, "g string, y double, x double")
    out = {r.g: r for r in cuped_adjust(df, "g", "y", "x").collect()}
    for g in ("A", "B"):
        assert out[g].var_reduction > 0.9  # x explains ~99.75% here
        assert out[g].sd_adj < out[g].sd_raw * 0.35
    raw_diff = out["B"].mean_raw - out["A"].mean_raw
    adj_diff = out["B"].mean_adj - out["A"].mean_adj
    # the adjusted contrast stays near the true lift of 5 and is much
    # CLOSER to it than the raw contrast is allowed to wander
    assert abs(adj_diff - 5.0) < 0.5
    assert abs(adj_diff - raw_diff) < abs(raw_diff) + 5  # sanity


def test_cuped_degenerate_covariate_noop(spark):
    from clinical_data_lake_spark.ml.stats import cuped_adjust

    df = spark.createDataFrame(
        [("A", float(v), 3.0) for v in (1, 2, 3, 4)],
        "g string, y double, x double",
    )
    r = cuped_adjust(df, "g", "y", "x").collect()[0]
    # constant covariate: theta 0 -> adjusted == raw, reduction 0
    assert r.mean_adj == r.mean_raw
    assert r.sd_adj == r.sd_raw
    assert r.var_reduction == 0.0
