"""Units for the r8 batch-7 operators: backtest folds, contamination
fraction, degree distribution."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from clinical_data_lake_spark.llm.corpus import contamination_fraction
from clinical_data_lake_spark.operators.graph import degree_distribution
from clinical_data_lake_spark.operators.sampling import backtest_folds


def test_backtest_folds_no_leakage_and_coverage(spark):
    # 40 hourly events over a uniform span -> 4 slices of ~10
    df = spark.range(40).select(
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(hours=F.col("id"))).alias("ts")
    )
    out = {r.fold: r for r in backtest_folds(df, "ts", n_folds=3).collect()}
    assert set(out) == {1, 2, 3}
    for i in (1, 2, 3):
        r = out[i]
        assert r.train_end < r.test_end
        assert r.n_train > 0 and r.n_test > 0
    # later folds train on strictly more data; train set = all rows
    # before the cutoff, so no future leakage by construction
    assert out[1].n_train < out[2].n_train < out[3].n_train
    assert out[1].test_end == out[2].train_end
    assert out[2].test_end == out[3].train_end


def test_contamination_fraction_closed_form(spark):
    corpus = spark.createDataFrame(
        [Row(doc_id=10, text="alpha beta gamma delta epsilon zeta")]
    )
    evals = spark.createDataFrame(
        [
            # identical -> contamination 1.0
            Row(doc_id=1, text="alpha beta gamma delta epsilon zeta"),
            # disjoint vocabulary -> 0.0
            Row(doc_id=2, text="uno dos tres cuatro cinco seis"),
            # shares exactly the first trigram of 4 -> 0.25
            Row(doc_id=3, text="alpha beta gamma nine ten eleven"),
        ]
    )
    out = {r.doc_id: r for r in contamination_fraction(corpus, evals).collect()}
    assert out[1].contamination == 1.0
    assert out[2].contamination == 0.0
    assert out[3].contamination == pytest.approx(0.25)
    assert out[3].n_shingles == 4 and out[3].n_hit == 1


def test_degree_distribution_closed_form(spark):
    # star 0-{1,2,3}: hub degree 3, three leaves degree 1
    e = spark.createDataFrame([(0, 1), (0, 2), (0, 3), (1, 0)], "src int, dst int")
    out = {r.degree: r.n_nodes for r in degree_distribution(e).collect()}
    assert out == {3: 1, 1: 3}  # duplicate/reversed edge collapsed
