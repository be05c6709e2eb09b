"""Units for the r8 batch-10 operators: snapshot change-feed
derivation (with the apply_changes round-trip law) and sequence-gap
detection."""

from __future__ import annotations

from pyspark.sql import functions as F

from clinical_data_lake_spark.operators.cdc import apply_changes, snapshot_changes
from clinical_data_lake_spark.operators.quality import sequence_gaps


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_snapshot_changes_ops_and_nullsafety(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k int, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0),      # unchanged -> no row
         (2, "b", 25.0),      # U (value)
         (3, "c", 30.0),      # U (NULL -> value, null-safe)
         (5, "e", 50.0)],     # I; key 4 -> D
        "k int, s string, v double",
    )
    out = {r.k: r for r in snapshot_changes(old, new, "k").collect()}
    assert set(out) == {2, 3, 4, 5}
    assert out[2].op == "U" and out[2].v == 25.0
    assert out[3].op == "U" and out[3].v == 30.0
    assert out[4].op == "D" and out[4].v == 40.0  # deletes carry OLD values
    assert out[5].op == "I" and out[5].v == 50.0


def test_snapshot_changes_roundtrip_law(spark):
    """apply_changes(old, snapshot_changes(old, new)) == new."""
    old = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
    ).filter(F.col("k") % 11 != 0)
    new = spark.range(100).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 5 == 0, F.lit(99.0))
        .otherwise((F.col("id") % 7).cast("double")).alias("v"),
    ).filter(F.col("k") % 13 != 0)
    feed = snapshot_changes(old, new, "k").withColumn("seq", F.lit(1))
    applied = apply_changes(old, feed.select("k", "v", "seq", "op"), "k")
    assert _rows(applied) == _rows(new)


def test_sequence_gaps_global_and_keyed(spark):
    df = spark.createDataFrame([(v,) for v in [1, 2, 5, 6, 10]], "x int")
    gaps = _rows(sequence_gaps(df, "x"))
    assert gaps == [(3, 4, 2), (7, 9, 3)]
    # dense sequence -> no gaps; duplicates ignored
    dense = spark.createDataFrame([(v,) for v in [4, 5, 5, 6]], "x int")
    assert sequence_gaps(dense, "x").count() == 0
    keyed = spark.createDataFrame(
        [("a", 1), ("a", 3), ("b", 1), ("b", 2)], "g string, x int"
    )
    kg = _rows(sequence_gaps(keyed, "x", keys=["g"]))
    assert kg == [("a", 2, 2, 1)]


def test_sequence_gaps_bucket_boundaries(spark):
    # a gap spanning a bucket boundary must still be found: values
    # 0..999 with 500..509 missing, 8 buckets puts the hole inside,
    # and removing 374..384 straddles the 3/8 boundary
    vals = [v for v in range(1000) if not (500 <= v <= 509 or 374 <= v <= 384)]
    df = spark.createDataFrame([(v,) for v in vals], "x int")
    gaps = _rows(sequence_gaps(df, "x", num_buckets=8))
    assert (500, 509, 10) in gaps and (374, 384, 11) in gaps
    assert len(gaps) == 2
