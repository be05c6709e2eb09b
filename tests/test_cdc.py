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


def test_incremental_agg_equals_direct_recompute(spark):
    """Retract-then-add must reproduce the direct aggregate of the
    post-merge snapshot exactly — including brand-new keys (no
    retraction), upserts that MOVE a row across groups, and a group
    emptied to zero (dropped from the output)."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F
    from clinical_data_lake_spark.operators.cdc import apply_changes, incremental_agg

    snap = spark.createDataFrame(
        [
            Row(id=1, g="a", v=10.5),
            Row(id=2, g="a", v=1.25),
            Row(id=3, g="b", v=7.0),
        ]
    )
    changes = spark.createDataFrame(
        [
            Row(id=2, g="c", v=2.0, seq=1, op="U"),   # moves a -> c
            Row(id=3, g="b", v=0.0, seq=1, op="D"),   # empties group b
            Row(id=4, g="a", v=4.75, seq=1, op="U"),  # brand-new key
            Row(id=4, g="a", v=5.0, seq=2, op="U"),   # later wins
        ]
    )
    dv = F.col("v").cast("decimal(18,3)")
    agg_snap = snap.groupBy("g").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum(dv).cast("double").alias("sum_value")
    )
    got = {
        r.g: (r.cnt, r.sum_value)
        for r in incremental_agg(
            snap, changes, agg_snap, group_cols=["g"], value_col="v", keys="id"
        ).collect()
    }
    direct = {
        r.g: (r.cnt, r.sum_value)
        for r in apply_changes(snap, changes, keys="id")
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum(dv).cast("double").alias("sum_value"))
        .collect()
    }
    assert got == direct
    assert got == {"a": (2, 15.5), "c": (1, 2.0)}  # b dropped at zero
