"""MERGE/CDC apply semantics on planted change feeds."""

from __future__ import annotations

from pyspark.sql import Row

from clinical_data_lake_spark.operators.cdc import apply_changes


def _snap(spark):
    return spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")]
    )


def test_apply_changes_upsert_delete_insert(spark):
    changes = spark.createDataFrame(
        [
            Row(k=1, v="a2", seq=10, op="U"),   # update existing
            Row(k=2, v=None, seq=11, op="D"),   # delete existing
            Row(k=9, v="new", seq=12, op="U"),  # insert new key
        ]
    )
    out = {r.k: r.v for r in apply_changes(_snap(spark), changes, keys="k").collect()}
    assert out == {1: "a2", 3: "c", 9: "new"}


def test_apply_changes_latest_seq_wins(spark):
    changes = spark.createDataFrame(
        [
            Row(k=1, v="old", seq=1, op="U"),
            Row(k=1, v="newest", seq=9, op="U"),
            Row(k=1, v="mid", seq=5, op="U"),
            Row(k=2, v="res", seq=3, op="U"),  # delete then re-insert: seq order decides
            Row(k=2, v=None, seq=2, op="D"),
        ]
    )
    out = {r.k: r.v for r in apply_changes(_snap(spark), changes, keys="k").collect()}
    assert out == {1: "newest", 2: "res", 3: "c"}


def test_apply_changes_delete_wins_when_latest(spark):
    changes = spark.createDataFrame(
        [
            Row(k=2, v="res", seq=3, op="U"),
            Row(k=2, v=None, seq=7, op="D"),
        ]
    )
    out = {r.k: r.v for r in apply_changes(_snap(spark), changes, keys="k").collect()}
    assert out == {1: "a", 3: "c"}


def test_apply_changes_seq_tie_resolves_to_upsert(spark):
    changes = spark.createDataFrame(
        [
            Row(k=1, v="u", seq=5, op="U"),
            Row(k=1, v=None, seq=5, op="D"),
        ]
    )
    out = {r.k: r.v for r in apply_changes(_snap(spark), changes, keys="k").collect()}
    assert out[1] == "u"
