"""Units for the r8 batch-11 operators: class balancing and the
multiclass confusion read-out."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clinical_data_lake_spark.ml.stats import multiclass_confusion
from clinical_data_lake_spark.operators.sampling import balance_classes


def test_balance_classes_equal_sizes_and_determinism(spark):
    df = spark.range(100).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, "rare").otherwise("common").alias("lbl"),
    )
    out = balance_classes(df, "lbl", "id")
    sizes = {r.lbl: r.n for r in
             out.groupBy("lbl").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sizes == {"rare": 10, "common": 10}
    # deterministic: same rows every run and under different partitioning
    a = sorted(r.id for r in out.collect())
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = sorted(r.id for r in balance_classes(df, "lbl", "id").collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert a == b
    # different seed -> (almost surely) different selection
    c = sorted(r.id for r in balance_classes(df, "lbl", "id", seed=7).collect())
    assert c != a


def test_multiclass_confusion_closed_form(spark):
    rows = (
        [("a", "a")] * 8 + [("a", "b")] * 2          # a: 8/10 right
        + [("b", "b")] * 3 + [("b", "c")] * 1        # b: 3/4 right
        + [("c", "c")] * 0 + [("d", "a")] * 1        # d never predicted right
    )
    df = spark.createDataFrame(rows, "actual string, predicted string")
    out = {r.label: r for r in
           multiclass_confusion(df, "actual", "predicted").collect()}
    assert out["a"].n_actual == 10 and out["a"].n_correct == 8
    assert out["a"].recall == pytest.approx(0.8)
    # a predicted 9 times (8 true + 1 from d)
    assert out["a"].n_predicted == 9
    assert out["a"].precision == pytest.approx(8 / 9, abs=1e-5)
    # c: only predicted, never actual -> recall NULL
    assert out["c"].n_actual == 0 and out["c"].recall is None
    assert out["d"].n_correct == 0 and out["d"].f1 is None
