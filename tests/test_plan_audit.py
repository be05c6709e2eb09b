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
