"""merge_into: Delta-MERGE-shaped condition-driven upsert on plain
DataFrames (r12). Clause semantics, the ambiguous-source guard, and
opt-outs pinned on hand-checkable rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clinical_data_lake_spark.operators.cdc import merge_into


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k int, name string, v double",
    )


def test_merge_update_insert_delete(spark):
    tgt = _target(spark)
    src = spark.createDataFrame(
        [(2, "B", 200.0), (3, "c", -1.0), (4, "d", 40.0)],
        "k int, name string, v double",
    )
    out = {
        r.k: r
        for r in merge_into(
            tgt, src, "k",
            delete_condition=F.col("src.v") < 0,
        ).collect()
    }
    assert set(out) == {1, 2, 4}  # 3 deleted, 4 inserted
    assert out[1].name == "a" and out[1].v == 10.0  # untouched
    assert out[2].name == "B" and out[2].v == 200.0  # updated
    assert out[4].name == "d" and out[4].v == 40.0  # inserted


def test_merge_update_condition_and_scoped_columns(spark):
    tgt = _target(spark)
    src = spark.createDataFrame(
        [(1, "A", 100.0), (2, "B", 5.0)], "k int, name string, v double"
    )
    # only rows whose source v exceeds the target v update, and only
    # the v column is in scope — name must stay the target's
    out = {
        r.k: r
        for r in merge_into(
            tgt, src, "k",
            update_cols=["v"],
            update_condition=F.col("src.v") > F.col("tgt.v"),
        ).collect()
    }
    assert out[1].v == 100.0 and out[1].name == "a"
    assert out[2].v == 20.0 and out[2].name == "b"  # condition false
    assert out[3].v == 30.0


def test_merge_insert_optout(spark):
    tgt = _target(spark)
    src = spark.createDataFrame([(9, "z", 9.0)], "k int, name string, v double")
    out = merge_into(tgt, src, "k", insert=False).collect()
    assert {r.k for r in out} == {1, 2, 3}


def test_merge_ambiguous_source_raises(spark):
    tgt = _target(spark)
    src = spark.createDataFrame(
        [(2, "B", 1.0), (2, "B2", 2.0)], "k int, name string, v double"
    )
    with pytest.raises(Exception, match="merge_into.*multiple source rows"):
        merge_into(tgt, src, "k").collect()


def test_merge_composite_keys_and_null_key_is_unmatched(spark):
    tgt = spark.createDataFrame(
        [(1, "x", 1.0), (1, "y", 2.0)], "k1 int, k2 string, v double"
    )
    src = spark.createDataFrame(
        [(1, "x", 10.0), (None, "y", 99.0)], "k1 int, k2 string, v double"
    )
    out = sorted(
        merge_into(tgt, src, ["k1", "k2"]).collect(),
        key=lambda r: (r.k1 is None, r.k1, r.k2),
    )
    # (1,x) updated; (1,y) untouched; (NULL,y) never matches -> insert
    assert [(r.k1, r.k2, r.v) for r in out] == [
        (1, "x", 10.0), (1, "y", 2.0), (None, "y", 99.0),
    ]


def test_merge_null_key_duplicates_are_inserts_not_ambiguity(spark):
    # rows with a null key can never equi-match the target, so two of
    # them are two inserts — the guard must not fire
    tgt = spark.createDataFrame([(1, 1.0)], "k int, v double")
    src = spark.createDataFrame(
        [(None, 8.0), (None, 9.0)], "k int, v double"
    )
    out = merge_into(tgt, src, "k").collect()
    assert sorted((r.k is None, r.v) for r in out) == [
        (False, 1.0), (True, 8.0), (True, 9.0),
    ]
