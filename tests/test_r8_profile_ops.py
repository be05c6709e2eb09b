"""Units for the r8 profiling/eval operators: correlation matrix,
label entropy, rare-category collapse, confusion matrix, PR curve."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from clinical_data_lake_spark.ml.stats import (
    confusion_at_threshold,
    corr_matrix,
    pr_curve,
)
from clinical_data_lake_spark.operators.aggregates import label_entropy
from clinical_data_lake_spark.operators.projections import collapse_rare


def test_corr_matrix_closed_form(spark):
    # y = 2x (corr 1), z = -x (corr -1 with both), c constant (NULL)
    rows = [(float(i), 2.0 * i, -float(i), 7.0) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "x double, y double, z double, c double")
    out = {(r.col_a, r.col_b): r for r in
           corr_matrix(df, ["x", "y", "z", "c"]).collect()}
    assert len(out) == 6
    assert out[("x", "y")].corr == pytest.approx(1.0, abs=1e-6)
    assert out[("x", "z")].corr == pytest.approx(-1.0, abs=1e-6)
    assert out[("y", "z")].corr == pytest.approx(-1.0, abs=1e-6)
    assert out[("x", "c")].corr is None  # zero variance
    assert all(r.n == 10 for r in out.values())


def test_corr_matrix_drops_null_rows(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 2.0), (None, 9.0), (3.0, 3.0)], "x double, y double"
    )
    r = corr_matrix(df, ["x", "y"]).collect()[0]
    assert r.n == 3 and r.corr == pytest.approx(1.0, abs=1e-6)


def test_label_entropy_closed_form(spark):
    rows = [("u", "a")] * 5 + [("u", "b")] * 5 + [("v", "a")] * 4
    df = spark.createDataFrame(rows, "k string, lbl string")
    out = {r.k: r for r in label_entropy(df, ["k"], "lbl").collect()}
    assert out["u"].entropy == pytest.approx(math.log(2), abs=1e-5)
    assert out["u"].norm_entropy == pytest.approx(1.0, abs=1e-5)
    assert out["v"].entropy == 0.0 and out["v"].norm_entropy is None
    assert (out["u"].n, out["u"].n_labels) == (10, 2)


def test_collapse_rare_preserves_nulls_and_frequent(spark):
    rows = [("a",)] * 5 + [("b",)] * 2 + [(None,)]
    df = spark.createDataFrame(rows, "c string")
    out = [r.c for r in collapse_rare(df, "c", min_count=3).collect()]
    assert out.count("a") == 5
    assert out.count("(rare)") == 2
    assert out.count(None) == 1


def test_confusion_at_threshold_closed_form(spark):
    rows = [(0.9, True), (0.8, False), (0.3, True), (0.1, False)]
    df = spark.createDataFrame(rows, "s double, y boolean")
    r = confusion_at_threshold(df, "s", "y", 0.5).collect()[0]
    assert (r.tp, r.fp, r.tn, r.fn) == (1, 1, 1, 1)
    assert r.accuracy == 0.5 and r.precision == 0.5 and r.recall == 0.5
    assert r.f1 == 0.5
    # degenerate: nothing predicted positive -> precision NULL
    r2 = confusion_at_threshold(df, "s", "y", 100.0).collect()[0]
    assert r2.precision is None and r2.recall == 0.0


def test_pr_curve_monotone_recall_and_final_point(spark):
    rows = [(float(i), 1 if i > 70 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "s double, y int")
    out = sorted(pr_curve(df, "s", "y").collect(), key=lambda r: r.bin_rank)
    recalls = [r.recall for r in out]
    assert recalls == sorted(recalls)  # deeper cut -> recall never drops
    assert out[-1].recall == 1.0
    assert out[0].precision == 1.0  # top decile all positive (scores 90+)
