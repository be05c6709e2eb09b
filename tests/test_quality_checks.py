"""Units for the data-quality expectation report and rolling median —
planted-violation counts the oracle hash can't explain on clean data.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clinical_data_lake_spark.operators import quality as dq
from clinical_data_lake_spark.operators.windows import rolling_median


@pytest.fixture(scope="module")
def dirty(spark):
    rows = [
        # (id, code, score, ref)
        (1, "A", 10.0, 100),
        (2, "B", -5.0, 100),      # range violation
        (3, None, 50.0, 101),     # null code
        (4, "Z", 200.0, None),    # set violation + range violation, null ref ok
        (4, "A", 20.0, 999),      # duplicate id + orphan ref
    ]
    return spark.createDataFrame(rows, ["id", "code", "score", "ref"])


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame([(100,), (101,)], ["dim_id"])


def test_planted_violation_counts(spark, dirty, dim):
    rep = {
        r.check_name: r
        for r in dq.check_report(
            dirty,
            {
                "not_null:code": dq.not_null("code"),
                "range:score": dq.in_range("score", 0, 100),
                "set:code": dq.in_set("code", ["A", "B"]),
            },
            unique_keys=["id"],
            fks={"fk:ref": (dim, "ref", "dim_id")},
        ).collect()
    }
    assert all(r.n_rows == 5 for r in rep.values())
    assert rep["not_null:code"].n_violations == 1
    assert rep["range:score"].n_violations == 2
    # NULL code is not in ('A','B') -> counts as a set violation too
    assert rep["set:code"].n_violations == 2
    assert rep["unique:id"].n_violations == 1
    assert rep["fk:ref"].n_violations == 1  # 999; NULL ref is not an orphan
    assert not any(r.passed for r in rep.values())


def test_clean_table_passes(spark, dim):
    clean = spark.createDataFrame([(1, "A", 1.0, 100), (2, "B", 2.0, 101)],
                                  ["id", "code", "score", "ref"])
    rep = dq.check_report(
        clean,
        {"not_null:code": dq.not_null("code")},
        unique_keys=["id"],
        fks={"fk:ref": (dim, "ref", "dim_id")},
    ).collect()
    assert len(rep) == 3
    assert all(r.passed and r.n_violations == 0 for r in rep)


def test_single_aggregation_pass_for_row_checks(spark, dirty):
    """All row-level predicates + uniqueness fold into ONE scan: the
    executed plan must contain no more than one table scan of the
    input (no per-check jobs)."""
    rep = dq.check_report(
        dirty,
        {
            "a": dq.not_null("code"),
            "b": dq.in_range("score", 0, 100),
            "c": dq.matches("code", "[A-Z]"),
        },
        unique_keys=["id"],
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 1


def test_rolling_median_closed_form(spark):
    rows = [(i, 1, float(v)) for i, v in enumerate([5, 1, 9, 3, 7])]
    df = spark.createDataFrame(rows, ["seq", "k", "v"])
    out = {
        r.seq: r.med
        for r in rolling_median(df, "k", "seq", "v", n_rows=3, alias="med").collect()
    }
    # trailing-3 medians of [5], [5,1], [5,1,9], [1,9,3], [9,3,7]
    assert out == {0: 5.0, 1: 3.0, 2: 5.0, 3: 3.0, 4: 7.0}


def test_rolling_median_resists_outlier(spark):
    rows = [(i, 1, 10.0 if i != 5 else 10000.0) for i in range(10)]
    df = spark.createDataFrame(rows, ["seq", "k", "v"])
    out = rolling_median(df, "k", "seq", "v", n_rows=5, alias="med").collect()
    assert all(r.med == 10.0 for r in out)


def test_event_transitions_closed_form(spark):
    from clinical_data_lake_spark.operators.windows import event_transitions

    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"),
        (2, 1, "a"), (2, 2, "b"),
    ]
    df = spark.createDataFrame(rows, ["k", "seq", "lbl"])
    got = {
        (r.from_label, r.to_label): r.cnt
        for r in event_transitions(df, "k", ["seq"], "lbl").collect()
    }
    assert got == {("a", "b"): 2, ("b", "a"): 1}


def test_hll_merge_within_tolerance(spark):
    """Merging daily sketches up loses no coverage: the merged
    estimate, the direct all-time estimate, and a differently
    partitioned rollup all land within rsd of the exact distinct
    count (estimates are NOT bit-stable across merge orders — the
    sketch representation depends on promotion order — which is why
    the operator's contract, and the driver query, are
    tolerance-based)."""
    from pyspark.sql import functions as F

    from clinical_data_lake_spark.operators.aggregates import hll_merge, hll_rollup

    df = spark.range(20000).select(
        (F.col("id") % 7).alias("g"),
        (F.col("id") % 4).alias("day"),
        (F.col("id") % 1000).alias("uid"),
    )
    daily = hll_rollup(df, ["g", "day"], "uid", lg_k=12)
    merged = {r.g: r.approx_distinct for r in hll_merge(daily, ["g"]).collect()}
    direct = {
        r.g: r.approx_distinct
        for r in hll_merge(hll_rollup(df, ["g"], "uid", lg_k=12), ["g"]).collect()
    }
    repart = {
        r.g: r.approx_distinct
        for r in hll_merge(
            hll_rollup(df.repartition(17), ["g", "day"], "uid", lg_k=12), ["g"]
        ).collect()
    }
    exact = {r.g: r.nd for r in df.groupBy("g").agg(
        F.count_distinct("uid").alias("nd")).collect()}
    for g, nd in exact.items():
        for est in (merged[g], direct[g], repart[g]):
            assert abs(est - nd) <= 0.05 * nd, (g, est, nd)


def test_rolling_corr_closed_form(spark):
    import math

    from clinical_data_lake_spark.operators.windows import rolling_corr

    # y = 2x + noise-free -> corr exactly 1 once min_periods reached;
    # anti-correlated tail flips the sign
    rows = [(i, 1, float(i), 2.0 * i) for i in range(10)] + [
        (i, 2, float(i), -3.0 * i) for i in range(10)
    ]
    df = spark.createDataFrame(rows, ["seq", "k", "x", "y"])
    out = rolling_corr(df, "k", ["seq"], "x", "y", n=5, min_periods=3).collect()
    by = {(r.k, r.seq): r.rolling_corr for r in out}
    assert by[(1, 1)] is None  # below min_periods
    assert by[(1, 5)] == 1.0
    assert by[(2, 7)] == -1.0


def test_rolling_corr_constant_window_is_null(spark):
    from clinical_data_lake_spark.operators.windows import rolling_corr

    rows = [(i, 1, 5.0, float(i)) for i in range(8)]
    df = spark.createDataFrame(rows, ["seq", "k", "x", "y"])
    out = rolling_corr(df, "k", ["seq"], "x", "y", n=5, min_periods=3).collect()
    assert all(r.rolling_corr is None for r in out)  # x constant -> guarded NULL


# ----------------------------------------------------------- table_diff

from pyspark.sql import Row  # noqa: E402
from clinical_data_lake_spark.operators.quality import table_diff  # noqa: E402


def test_table_diff_planted_differences(spark):
    left = spark.createDataFrame(
        [Row(k=1, a="x", b=1.0), Row(k=2, a="y", b=2.0),
         Row(k=3, a="z", b=3.0), Row(k=4, a=None, b=4.0)]
    )
    right = spark.createDataFrame(
        [Row(k=1, a="x", b=1.0),      # identical
         Row(k=2, a="y2", b=2.0),     # a changed
         Row(k=4, a=None, b=9.0),     # b changed, null a matches null-safely
         Row(k=5, a="new", b=5.0)]    # only right
    )
    rep = {r.metric: r.n for r in table_diff(left, right, keys=["k"]).collect()}
    assert rep == {
        "rows_left": 4, "rows_right": 4, "only_left": 1, "only_right": 1,
        "matched": 1, "changed": 2, "changed:a": 1, "changed:b": 1,
    }


def test_table_diff_identical_tables(spark):
    df = spark.createDataFrame([Row(k=1, a="x"), Row(k=2, a=None)])
    rep = {r.metric: r.n for r in table_diff(df, df, keys=["k"]).collect()}
    assert rep["matched"] == 2 and rep["changed"] == 0
    assert rep["only_left"] == 0 and rep["only_right"] == 0


def test_table_diff_compare_subset_prunes(spark):
    left = spark.createDataFrame([Row(k=1, a="x", noise="p")])
    right = spark.createDataFrame([Row(k=1, a="x", noise="q")])
    rep = {r.metric: r.n
           for r in table_diff(left, right, keys=["k"], compare_cols=["a"]).collect()}
    assert rep["matched"] == 1 and "changed:noise" not in rep


# ------------------------------------------------------- k-anonymity

from clinical_data_lake_spark.operators.quality import k_anonymity_report  # noqa: E402


def test_k_anonymity_flags_small_classes(spark):
    df = spark.createDataFrame(
        # class (a,1): 3 rows; class (b,1): 1 row -> at risk at k=2
        [Row(q1="a", q2=1, s=10), Row(q1="a", q2=1, s=20),
         Row(q1="a", q2=1, s=10), Row(q1="b", q2=1, s=30)]
    )
    r = k_anonymity_report(df, ["q1", "q2"], k=2, sensitive_col="s").collect()[0]
    assert (r.n_rows, r.n_classes, r.min_class_size) == (4, 2, 1)
    assert (r.n_rows_at_risk, r.n_classes_at_risk) == (1, 1)
    assert r.min_l == 1 and r.k_anonymous is False


def test_k_anonymity_holds_and_null_min_l_without_sensitive(spark):
    df = spark.createDataFrame(
        [Row(q1="a", s=1), Row(q1="a", s=2), Row(q1="b", s=3), Row(q1="b", s=3)]
    )
    r = k_anonymity_report(df, ["q1"], k=2).collect()[0]
    assert r.k_anonymous is True and r.min_l is None and r.n_rows_at_risk == 0


def test_event_path_ngrams_closed_form(spark):
    from clinical_data_lake_spark.operators.windows import event_path_ngrams

    # user 1: A B C D -> paths ABC, BCD; user 2: A B C -> ABC
    rows = [(1, i, t) for i, t in enumerate("ABCD")] + \
           [(2, i, t) for i, t in enumerate("ABC")]
    df = spark.createDataFrame(rows, ["u", "i", "lbl"])
    out = [(r.path, r.cnt) for r in
           event_path_ngrams(df, "u", ["i"], "lbl", n=3, k=10).collect()]
    assert out == [("A>B>C", 2), ("B>C>D", 1)]
