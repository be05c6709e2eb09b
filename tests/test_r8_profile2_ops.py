"""Units for the r8 batch-12 operators: nearest-direction as-of join
and the one-aggregate table profiler."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from clinical_data_lake_spark.operators.joins import nearest_asof_join
from clinical_data_lake_spark.operators.quality import profile_table


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_nearest_asof_picks_closer_side_and_breaks_ties_backward(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts("2024-01-01 10:00:00")),   # prev at 09:59, next 10:03 -> prev
         (1, 101, _ts("2024-01-01 10:02:00")),   # prev 09:59 (3m), next 10:03 (1m) -> next
         (1, 102, _ts("2024-01-01 10:01:00")),   # equidistant (2m both) -> backward
         (2, 200, _ts("2024-01-01 00:00:00"))],  # key with no right rows -> nulls
        "k int, lid int, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:59:00"), 1.0),
         (1, _ts("2024-01-01 10:03:00"), 2.0)],
        "k int, rts timestamp, v double",
    )
    out = {r.lid: r for r in
           nearest_asof_join(left, right, "k", "ts", "rts", ["v"]).collect()}
    assert out[100].v == 1.0
    assert out[101].v == 2.0
    assert out[102].v == 1.0  # tie -> earlier match
    assert out[200].v is None and out[200].matched_ts is None


def test_nearest_asof_exact_match_is_distance_zero(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01 10:00:00"))], "k int, lid int, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 7.0),
         (1, _ts("2024-01-01 10:00:01"), 8.0)],
        "k int, rts timestamp, v double",
    )
    r = nearest_asof_join(left, right, "k", "ts", "rts", ["v"]).collect()[0]
    assert r.v == 7.0


def test_profile_table_typed_minmax_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, "b", 2.5, None), (2, "a", None, None), (None, None, 10.0, None)],
        "i int, s string, d double, junk array<int>",
    )
    out = {r.column: r for r in profile_table(df).collect()}
    assert out["i"].n == 3 and out["i"].n_null == 1 and out["i"].n_distinct == 2
    assert out["i"].min_num == 1.0 and out["i"].max_num == 2.0
    assert out["s"].min_str == "a" and out["s"].max_str == "b"
    assert out["s"].min_num is None
    assert out["d"].min_num == 2.5 and out["d"].max_num == 10.0
    # unsupported types still profile counts, min/max all-NULL
    assert out["junk"].min_num is None and out["junk"].min_str is None
    assert out["junk"].n_null == 3


def test_profile_table_approx_mode_runs(spark):
    df = spark.range(1000).select(F.col("id"), (F.col("id") % 10).alias("m"))
    out = {r.column: r for r in profile_table(df, approx_distinct=True).collect()}
    assert out["m"].n_distinct == pytest.approx(10, abs=2)
    assert out["id"].n == 1000
