"""End-to-end Delta smoke (r10 verdict #8, the stretch item).

The container ships no delta-spark and installs are forbidden, so
S4's delta write branch and D5 (`DESCRIBE HISTORY`,
`03-work with ML models.py:63-65`) run only their guards today. This
test exists SKIPPED, not absent: the moment a delta-enabled
environment runs the suite (``has_delta`` flips true), it exercises
the real branches — delta sink round-trip, ``OPTIMIZE ZORDER``
through ``optimize_table``, and ``DESCRIBE HISTORY`` rows — with zero
code change. Until then the parquet fallbacks stay covered by
tests/test_etl.py and the Z-curve file-skipping test.
"""

from __future__ import annotations

import pytest

from clinical_data_lake_spark.catalog import describe_history, optimize_table
from clinical_data_lake_spark.io import has_delta


def test_delta_optimize_and_history_end_to_end(spark, tmp_path):
    if not has_delta(spark):
        pytest.skip("delta-spark not on the classpath (container has none)")
    loc = str(tmp_path / "delta_tbl")
    df = spark.range(0, 1000).selectExpr(
        "id", "id % 7 AS a", "id % 11 AS b"
    )
    df.write.format("delta").save(loc)
    spark.sql("DROP TABLE IF EXISTS delta_smoke")
    spark.sql(f"CREATE TABLE delta_smoke USING DELTA LOCATION '{loc}'")
    try:
        # second commit so history has >= 2 versions
        df.limit(10).write.format("delta").mode("append").saveAsTable(
            "delta_smoke"
        )
        assert optimize_table(spark, "delta_smoke", ["a", "b"]) == "delta"
        hist = describe_history(spark, "delta_smoke")
        ops = [r["operation"] for r in hist.collect()]
        assert len(ops) >= 2 and any("OPTIMIZE" in o.upper() for o in ops)
        assert spark.table("delta_smoke").count() == 1010
    finally:
        spark.sql("DROP TABLE IF EXISTS delta_smoke")


def test_describe_history_guard_without_delta(spark):
    if has_delta(spark):
        pytest.skip("delta present — guard branch not reachable")
    with pytest.raises(RuntimeError, match="delta-spark"):
        describe_history(spark, "any_table")
