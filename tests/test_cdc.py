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


# ----------------------------------------------------------- SCD Type 2

from clinical_data_lake_spark.operators.cdc import scd2_build, scd2_lookup  # noqa: E402


def _feed(spark):
    return spark.createDataFrame(
        [
            # key 1: a -> a (compacted) -> b -> b (compacted)
            Row(k=1, ts=1, seq=1, v="a"),
            Row(k=1, ts=2, seq=2, v="a"),
            Row(k=1, ts=5, seq=3, v="b"),
            Row(k=1, ts=9, seq=4, v="b"),
            # key 2: single version
            Row(k=2, ts=3, seq=5, v="x"),
            # key 3: null attribute versions compact null-safely
            Row(k=3, ts=1, seq=6, v=None),
            Row(k=3, ts=4, seq=7, v=None),
            Row(k=3, ts=6, seq=8, v="z"),
        ]
    )


def test_scd2_build_compacts_and_closes_intervals(spark):
    dim = scd2_build(_feed(spark), keys="k", attr_cols=["v"], ts_col="ts", seq_col="seq")
    rows = sorted(
        ((r.k, r.v, r.valid_from, r.valid_to, r.is_current) for r in dim.collect()),
        key=lambda t: (t[0], t[2]),
    )
    assert rows == [
        (1, "a", 1, 5, False),
        (1, "b", 5, None, True),
        (2, "x", 3, None, True),
        (3, None, 1, 6, False),
        (3, "z", 6, None, True),
    ]


def test_scd2_build_same_ts_tiebreak_by_seq(spark):
    feed = spark.createDataFrame(
        [Row(k=1, ts=1, seq=2, v="late"), Row(k=1, ts=1, seq=1, v="early")]
    )
    dim = scd2_build(feed, keys="k", attr_cols=["v"], ts_col="ts", seq_col="seq")
    rows = sorted((r.v, r.valid_from, r.is_current) for r in dim.collect())
    assert rows == [("early", 1, False), ("late", 1, True)]


def test_scd2_lookup_point_in_time(spark):
    dim = scd2_build(_feed(spark), keys="k", attr_cols=["v"], ts_col="ts", seq_col="seq")
    facts = spark.createDataFrame(
        [
            Row(fid=1, k=1, ts=0),   # before first version -> NULL
            Row(fid=2, k=1, ts=2),   # inside [1, 5) -> a
            Row(fid=3, k=1, ts=5),   # boundary: half-open -> b
            Row(fid=4, k=1, ts=99),  # open current interval -> b
            Row(fid=5, k=9, ts=1),   # unknown key -> NULL
        ]
    )
    out = {r.fid: r.v for r in scd2_lookup(facts, dim, keys="k", fact_ts="ts").collect()}
    assert out == {1: None, 2: "a", 3: "b", 4: "b", 5: None}


def test_scd2_lookup_inner_drops_unmatched(spark):
    dim = scd2_build(_feed(spark), keys="k", attr_cols=["v"], ts_col="ts", seq_col="seq")
    facts = spark.createDataFrame([Row(fid=1, k=1, ts=0), Row(fid=2, k=2, ts=4)])
    out = scd2_lookup(facts, dim, keys="k", fact_ts="ts", how="inner").collect()
    assert [(r.fid, r.v) for r in out] == [(2, "x")]


def test_scd2_build_single_shuffle(spark):
    """The compaction lag and the closing lead must share ONE exchange."""
    dim = scd2_build(_feed(spark), keys="k", attr_cols=["v"], ts_col="ts", seq_col="seq")
    plan = dim._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange")
    assert n_exchange <= 1, plan
