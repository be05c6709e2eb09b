"""Unit tests for the ml/ package (M1-M8, R1) — the non-SQL-expressible
pieces get invariant checks per SURVEY.md §5.4: classifier beats chance
on separable data, chi-square matches the closed form, indexers reuse
across train/test, split is seed-stable.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from clinical_data_lake_spark.ml import featurize, stats, train


@pytest.fixture(scope="module")
def labeled_df(spark):
    """Linearly separable-ish data: label 1 iff x1 > 0 (plus noise dim)."""
    rnd = random.Random(11)
    rows = []
    for i in range(400):
        x1 = rnd.uniform(-1, 1)
        rows.append(Row(id=i, x1=x1, x2=rnd.uniform(-1, 1), label=int(x1 > 0)))
    return spark.createDataFrame(rows)


def test_decision_tree_beats_chance(spark, labeled_df):
    df = featurize.assemble_features(labeled_df, ["x1", "x2"])
    train_df, test_df = featurize.seeded_split(df, 0.7, seed=42)
    model = train.train_decision_tree(train_df, max_depth=4)
    auc = train.evaluate_auc(model, test_df)
    assert auc > 0.9  # separable on x1; a working tree is near-perfect


def test_seeded_split_is_deterministic(spark, labeled_df):
    a_train, a_test = featurize.seeded_split(labeled_df, 0.7, seed=42)
    b_train, b_test = featurize.seeded_split(labeled_df, 0.7, seed=42)
    assert sorted(r.id for r in a_train.collect()) == sorted(r.id for r in b_train.collect())
    assert a_train.count() + a_test.count() == 400


def test_string_indexers_reuse_on_test(spark):
    train_df = spark.createDataFrame(
        [Row(k=i, seg=s) for i, s in enumerate(["a", "a", "a", "b", "b", "c"])]
    )
    test_df = spark.createDataFrame([Row(k=10, seg="b"), Row(k=11, seg="zzz")])
    models = featurize.fit_string_indexers(train_df, ["seg"])
    out_train = {r.seg: r.seg_idx for r in featurize.apply_string_indexers(train_df, models).collect()}
    assert out_train == {"a": 0.0, "b": 1.0, "c": 2.0}  # frequencyDesc
    out_test = featurize.apply_string_indexers(test_df, models)
    rows = out_test.collect()  # handleInvalid=skip drops unseen labels
    assert [(r.seg, r.seg_idx) for r in rows] == [("b", 1.0)]


def test_chisq_2x2_matches_closed_form(spark):
    # contingency: n_11=30, n_10=10, n_01=10, n_00=50
    rows = []
    eid = 0
    for fa, fb, n in ((1, 1, 30), (1, 0, 10), (0, 1, 10), (0, 0, 50)):
        for _ in range(n):
            rows.append(Row(entity=eid, fa=fa, fb=fb))
            eid += 1
    ents = spark.createDataFrame(rows)
    a_ids = ents.filter("fa = 1").select("entity")
    b_ids = ents.filter("fb = 1").select("entity")
    got = stats.chisq_2x2(ents, "entity", a_ids, b_ids).collect()[0]
    assert (got.n_11, got.n_10, got.n_01, got.n_00) == (30, 10, 10, 50)
    a, b, c, d = 30.0, 10.0, 10.0, 50.0
    n = a + b + c + d
    want = n * abs(a * d - b * c) ** 2 / ((a + b) * (c + d) * (a + c) * (b + d))
    assert got.chi2 == pytest.approx(want)
    # p-value: strong association -> tiny p
    assert stats.pvalue_1dof(got.chi2) < 1e-6
    # independence case: equal proportions -> chi2 == 0
    rows0 = [Row(entity=i, fa=i % 2, fb=(i // 2) % 2) for i in range(100)]
    e0 = spark.createDataFrame(rows0)
    z = stats.chisq_2x2(
        e0, "entity", e0.filter("fa=1").select("entity"), e0.filter("fb=1").select("entity")
    ).collect()[0]
    assert z.chi2 == pytest.approx(0.0)
    assert stats.pvalue_1dof(0.0) == pytest.approx(1.0)


def test_chisq_2x2_degenerate_marginal_is_zero(spark):
    """A flag constant across all entities (zero marginal) must yield
    chi2 = 0, not an ANSI divide-by-zero (regression: found by the
    end-to-end workflow test at sf0.001 where every user had the
    b-flag)."""
    rows = [Row(entity=i, fa=i % 2, fb=1) for i in range(20)]
    e = spark.createDataFrame(rows)
    got = stats.chisq_2x2(
        e, "entity", e.filter("fa=1").select("entity"), e.select("entity")
    ).collect()[0]
    assert got.n_10 == 0 and got.n_00 == 0  # nobody lacks flag b
    assert got.chi2 == 0.0


def test_chisq_association_vector_form(spark, labeled_df):
    # discretize x1 so ChiSquareTest sees categorical-ish features
    df = labeled_df.select(
        (F.col("x1") > 0).cast("double").alias("f1"),
        (F.col("x2") > 0).cast("double").alias("f2"),
        "label",
    )
    res = stats.chisq_association(df, ["f1", "f2"], "label").collect()[0]
    p = list(res.pValues)
    assert p[0] < 1e-10  # f1 defines the label
    assert p[1] > 0.01  # f2 is noise


def test_tune_decision_tree_picks_reasonable_model(spark, labeled_df):
    df = featurize.assemble_features(labeled_df, ["x1", "x2"])
    tvs = train.tune_decision_tree(
        df, max_depths=(2, 4), max_binses=(8,), impurities=("gini",)
    )
    assert max(tvs.validationMetrics) > 0.9


def test_model_store_roundtrip(spark, labeled_df, tmp_path):
    from pyspark.ml.classification import DecisionTreeClassificationModel

    df = featurize.assemble_features(labeled_df, ["x1", "x2"])
    model = train.train_decision_tree(df, max_depth=3)
    store = train.ModelStore(str(tmp_path))
    store.save(model, "dtree", 1)
    loaded = store.load(DecisionTreeClassificationModel, "dtree", 1)
    orig = model.transform(df).select("id", "prediction").collect()
    rt = loaded.transform(df).select("id", "prediction").collect()
    assert sorted(map(tuple, orig)) == sorted(map(tuple, rt))


def test_featurize_events_end_to_end(spark):
    import datetime

    rows = []
    t0 = datetime.datetime(2026, 1, 1)
    # user 1: clicks on days 0,1,2; user 2: views only (not in cohort)
    for d in range(3):
        rows.append(Row(event_id=d, user_id=1, event_type="click",
                        ts=t0 + datetime.timedelta(days=d)))
    rows.append(Row(event_id=10, user_id=2, event_type="view", ts=t0))
    ev = spark.createDataFrame(rows)
    cohort = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    feats, models = featurize.featurize_events(
        ev, cohort, "user_id", "event_type", "ts",
        flag_needles=["click"], days=7, assemble=True,
    )
    got = {r.event_id: r for r in feats.collect()}
    assert set(got) == {0, 1, 2}  # user 2 excluded by semi join
    assert got[0].recent_flag_0 == 0  # empty trailing frame -> 0
    assert got[1].recent_flag_0 == 1
    assert got[2].recent_flag_0 == 2
    assert got[2].label == 1
    assert "features" in feats.columns


def test_fit_linear_per_group_recovers_exact_coefficients(spark):
    """On exactly-linear data the normal equations must recover the
    per-group coefficients to float precision; degenerate (tiny) groups
    yield null models instead of crashing."""
    from clinical_data_lake_spark.ml.train import fit_linear_per_group

    rows = []
    for g, (a, b1, b2) in {"g1": (2.0, 3.0, -1.0), "g2": (-5.0, 0.5, 4.0)}.items():
        for i in range(40):
            x1, x2 = float(i), float((i * 7) % 11)
            rows.append((g, x1, x2, a + b1 * x1 + b2 * x2))
    rows.append(("tiny", 1.0, 2.0, 3.0))  # n < k+2 -> null model
    df = spark.createDataFrame(rows, schema="g string, x1 double, x2 double, y double")
    out = {r.g: r for r in fit_linear_per_group(df, ["g"], ["x1", "x2"], "y").collect()}
    assert abs(out["g1"].intercept - 2.0) < 1e-8
    assert abs(out["g1"].coefs[0] - 3.0) < 1e-8 and abs(out["g1"].coefs[1] + 1.0) < 1e-8
    assert abs(out["g2"].coefs[1] - 4.0) < 1e-8
    assert out["g1"].r2 > 0.999999
    assert out["tiny"].coefs is None and out["tiny"].n == 1


def test_isotonic_calibration_pav_closed_form(spark):
    from clinical_data_lake_spark.ml.train import calibrate_isotonic

    df = spark.createDataFrame(
        [(1.0, 0.0), (2.0, 1.0), (3.0, 0.0), (4.0, 1.0)], ["score", "label"]
    )
    out, model = calibrate_isotonic(df)
    got = {r.score: r.calibrated for r in out.collect()}
    # PAV of labels [0,1,0,1] pools the middle violators to 0.5
    assert got == {1.0: 0.0, 2.0: 0.5, 3.0: 0.5, 4.0: 1.0}
    # monotone on unseen scores too (interpolation)
    import pandas as pd  # noqa: F401
    probe = spark.createDataFrame([(2.5, 0.0)], ["score", "label"])
    val = model.transform(probe).collect()[0].calibrated
    assert 0.0 <= val <= 1.0 and abs(val - 0.5) < 1e-9


def test_isotonic_calibration_already_monotone_identity(spark):
    from clinical_data_lake_spark.ml.train import calibrate_isotonic

    df = spark.createDataFrame(
        [(float(i), float(i >= 3)) for i in range(6)], ["score", "label"]
    )
    out, _ = calibrate_isotonic(df)
    got = {r.score: r.calibrated for r in out.collect()}
    assert got == {0.0: 0.0, 1.0: 0.0, 2.0: 0.0, 3.0: 1.0, 4.0: 1.0, 5.0: 1.0}
