"""Round-10 session-3: embedding-quality audit, FK fan-out profile."""

from __future__ import annotations

import math

import pytest

from clinical_data_lake_spark.llm.similarity import embedding_quality
from clinical_data_lake_spark.operators.quality import fk_fanout_profile


def test_embedding_quality_closed_form(spark):
    # label 0: two unit vectors along x and y -> centroid (.5,.5),
    # mean cos = cos(45deg) = 1/sqrt(2); mean norm = 1
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.0, 1.0], 0),
        (3, [3.0, 4.0], 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = {r.label: r for r in embedding_quality(df).collect()}
    assert out[0].n_members == 2
    assert out[0].mean_norm == pytest.approx(1.0)
    assert out[0].mean_cos == pytest.approx(1 / math.sqrt(2), abs=1e-6)
    # singleton class: member IS the centroid -> cos 1, norm 5
    assert out[1].mean_norm == pytest.approx(5.0)
    assert out[1].mean_cos == pytest.approx(1.0)


def test_embedding_quality_zero_vector_scores_zero_cos(spark):
    rows = [(1, [1.0, 0.0], 0), (2, [0.0, 0.0], 0)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    r = embedding_quality(df).collect()[0]
    # zero vector contributes cos 0 (guarded), not an ANSI error
    assert r.n_members == 2
    assert r.mean_norm == pytest.approx(0.5)


def test_embedding_quality_null_labels_excluded(spark):
    rows = [(1, [1.0], 0), (2, [1.0], None)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = embedding_quality(df).collect()
    assert len(out) == 1 and out[0].n_members == 1


def test_fk_fanout_closed_form(spark):
    rows = [(1,)] * 1 + [(2,)] * 2 + [(3,)] * 3 + [(4,)] * 10
    df = spark.createDataFrame(rows, "fk long")
    r = fk_fanout_profile(df, "fk").collect()[0]
    assert r.n_keys == 4 and r.n_rows == 16
    assert r.min_fanout == 1 and r.max_fanout == 10
    # percentile_cont over [1,2,3,10]: p50 = 2.5
    assert r.p50 == pytest.approx(2.5)
    assert r.mean_fanout == pytest.approx(4.0)


def test_fk_fanout_uniform_keys(spark):
    rows = [(k,) for k in range(5) for _ in range(3)]
    df = spark.createDataFrame(rows, "fk long")
    r = fk_fanout_profile(df, "fk").collect()[0]
    assert r.p50 == r.p99 == 3.0
    assert r.mean_fanout == pytest.approx(3.0)
