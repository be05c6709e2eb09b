"""Bucketed co-located joins: both sides pre-shuffled on the join key
=> the join plan has NO shuffle exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clinical_data_lake_spark import catalog
from clinical_data_lake_spark.operators.bucketing import (
    join_bucketed,
    write_bucketed_table,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    loc = str(tmp_path_factory.mktemp("bucketdb"))
    catalog.create_database(spark, "bucketdb", location=loc)
    facts = spark.range(0, 20000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    dims = spark.range(0, 5000).select(
        F.col("id").alias("k"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )
    write_bucketed_table(facts, "bucketdb.facts", ["k"], 8, sort_cols=["k"])
    write_bucketed_table(dims, "bucketdb.dims", ["k"], 8, sort_cols=["k"])
    return "bucketdb.facts", "bucketdb.dims"


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = join_bucketed(spark, left, right, ["k"])
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
        assert j.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_values_correct(spark, bucketed_tables):
    left, right = bucketed_tables
    j = join_bucketed(spark, left, right, ["k"])
    row = j.filter("k = 42").collect()[0]
    assert row.v == 84 and row.name == "n42"


def test_bucketed_join_registry_query_plan_locked(spark):
    """The registered `bucketed_join` driver query must join its two
    bucketed catalog tables without a shuffle exchange on either side
    (exchanges above the aggregate are fine — the JOIN is the part
    bucketing pre-paid for)."""
    from clinical_data_lake_spark.driver_queries import QUERIES

    from conftest import SF_SMALL

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = QUERIES["bucketed_join"](spark, SF_SMALL)
        plan = df._jdf.queryExecution().executedPlan().toString()
        join_part = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning" not in join_part, plan
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_write_bucketed_refuses_foreign_directory(spark, tmp_path):
    """ADVICE r9: the default-db self-heal deleted <warehouse>/<table>
    unconditionally — a name collision with user-placed data destroyed
    it. Foreign-looking contents must raise; a genuine stale table
    write (part files + _SUCCESS) must still self-heal."""
    import os

    warehouse = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
    loc = os.path.join(warehouse, "adv_collision")
    os.makedirs(loc, exist_ok=True)
    with open(os.path.join(loc, "precious_user_data.csv"), "w") as fh:
        fh.write("a,b\n1,2\n")
    df = spark.range(0, 10).selectExpr("id as k", "id * 2 as v")
    try:
        with pytest.raises(ValueError, match="refusing to overwrite"):
            write_bucketed_table(df, "adv_collision", ["k"], 2)
        assert os.path.exists(os.path.join(loc, "precious_user_data.csv"))
    finally:
        import shutil

        shutil.rmtree(loc, ignore_errors=True)
        spark.sql("DROP TABLE IF EXISTS adv_collision")

    # stale managed-table layout still self-heals
    loc2 = os.path.join(warehouse, "adv_stale")
    os.makedirs(loc2, exist_ok=True)
    open(os.path.join(loc2, "_SUCCESS"), "w").close()
    open(os.path.join(loc2, "part-00000-old.snappy.parquet"), "w").close()
    try:
        write_bucketed_table(df, "adv_stale", ["k"], 2)
        assert spark.table("adv_stale").count() == 10
    finally:
        spark.sql("DROP TABLE IF EXISTS adv_stale")


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables):
    from clinical_data_lake_spark.operators.bucketing import agg_bucketed

    facts, _dims = bucketed_tables
    df = agg_bucketed(
        spark, facts, ["k"], {"total": F.sum("v"), "n": F.count(F.lit(1))}
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    # values still correct: k in 0..19999, v = 2k, one row each
    got = {r.k: (r.total, r.n) for r in df.limit(50).collect()}
    for k, (tot, n) in got.items():
        assert (tot, n) == (2 * k, 1)
