"""Units for the plan-audit inspector: each rule must fire on a plan
constructed to violate it and stay silent on the package's own
idiomatic plans.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from clinical_data_lake_spark.plans import audit_plan, explain_findings


def _rules(df):
    return {f.rule for f in audit_plan(df)}


def test_flags_global_window(spark):
    df = spark.range(100).withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    assert "single-partition-window" in _rules(df)


def test_partitioned_window_is_clean(spark):
    df = spark.range(100).withColumn(
        "rn", F.row_number().over(Window.partitionBy(F.col("id") % 5).orderBy("id"))
    )
    assert "single-partition-window" not in _rules(df)


def test_flags_python_row_udf(spark):
    from pyspark.sql.functions import udf

    slow = udf(lambda x: x + 1, "long")
    df = spark.range(10).select(slow("id").alias("y"))
    assert "python-row-udf" in _rules(df)


def test_flags_cartesian(spark):
    a, b = spark.range(10), spark.range(10).select(F.col("id").alias("j"))
    df = a.crossJoin(b)
    assert "cartesian" in _rules(df)


def test_idiomatic_package_plans_are_quiet(spark):
    """The package's own operators must not trip the warn-level rules
    (info-level notes are allowed)."""
    from clinical_data_lake_spark.io import read_table
    from clinical_data_lake_spark.operators.aggregates import winsorize
    from conftest import SF_SMALL

    ev = read_table(spark, SF_SMALL, "events").select("event_id", "event_type", "value")
    warns = [f for f in audit_plan(winsorize(ev, ["event_type"], "value"))
             if f.severity == "warn"]
    assert warns == []


def test_explain_findings_formats(spark):
    df = spark.range(100).withColumn("rn", F.row_number().over(Window.orderBy("id")))
    text = explain_findings(df)
    assert "[warn] single-partition-window" in text


def test_plan_stats_counts_features(spark, tmp_path):
    from clinical_data_lake_spark.plans.audit import plan_stats

    import pyspark.sql.functions as F

    p = str(tmp_path / "ps")
    spark.range(0, 1000).selectExpr("id as k", "id * 2 as v").write.mode(
        "overwrite"
    ).parquet(p)
    df = spark.read.parquet(p).filter(F.col("v") > 100)
    dim = spark.range(0, 10).selectExpr("id as k", "id as label")
    joined = df.join(F.broadcast(dim), on="k")
    joined.collect()  # finalize THIS frame's AQE plan (count() would
    # plan a different query and leave joined's execution initial)
    s = plan_stats(joined)
    assert s["n_broadcast_joins"] == 1
    assert s["n_cartesian"] == 0 and s["n_python_eval"] == 0
    assert s["n_scans"] >= 1
    assert s["pushed_filter_scans"] >= 1  # v > 100 reaches the scan
    assert s["n_codegen_spans"] >= 1
    # a groupBy adds an Exchange
    agg = spark.read.parquet(p).groupBy("k").count()
    assert plan_stats(agg)["n_exchanges"] >= 1
    # a global 1-row aggregate ends in a SinglePartition exchange
    g = spark.read.parquet(p).agg(F.sum("v"))
    assert plan_stats(g)["n_single_partition_exchanges"] >= 1
