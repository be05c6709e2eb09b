"""Units pinning the round-8 ADVICE fixes: bounded-collect validation
in logrank_test, NULL-group-key preservation in the data-repair
operators, the full null guard in event_path_ngrams, the explicit
rank_by contract in top_n_with_others, and the scd2_lookup broadcast
gate."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def test_logrank_high_cardinality_group_errors_with_bounded_collect(spark):
    """A mistaken 1000-distinct group_col must raise ValueError after a
    collect bounded by limit(3) — never a full distinct materialize."""
    from clinical_data_lake_spark.ml.stats import logrank_test

    subjects = spark.range(1000).select(
        F.col("id").alias("subject"),
        (F.col("id") % 1000).cast("string").alias("arm"),
        (F.col("id") % 17 + 1).alias("duration"),
        F.lit(True).alias("event"),
    )
    with pytest.raises(ValueError, match=">= 3"):
        logrank_test(subjects, duration_col="duration", event_col="event",
                     group_col="arm")
    # the validation plan itself carries the row-limit: nothing above
    # a GlobalLimit 3 reaches the driver
    plan = subjects.select("arm").distinct().limit(3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "3" in plan


def test_impute_group_median_keeps_null_group_rows(spark):
    from clinical_data_lake_spark.ml.featurize import impute_group_median

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("a", None), (None, 10.0), (None, None)],
        "grp string, x double",
    )
    out = impute_group_median(df, ["x"], keys=["grp"]).collect()
    assert len(out) == 5, "NULL-group rows must survive the stats join"
    null_grp = {(r.x, r.x_imputed) for r in out if r.grp is None}
    # the NULL group's median is 10.0, so its missing row imputes to 10
    assert null_grp == {(10.0, False), (10.0, True)}


def test_robust_scale_and_iqr_filter_keep_null_group_rows(spark):
    from clinical_data_lake_spark.ml.featurize import iqr_filter, robust_scale

    df = spark.createDataFrame(
        [(None, 1.0), (None, 2.0), (None, 3.0), ("g", 5.0), ("g", 6.0), ("g", 7.0)],
        "grp string, x double",
    )
    scaled = robust_scale(df, ["x"], keys=["grp"]).collect()
    assert len(scaled) == 6
    assert sum(1 for r in scaled if r.grp is None) == 3

    kept = iqr_filter(df, "x", keys=["grp"]).collect()
    assert sum(1 for r in kept if r.grp is None) == 3, \
        "non-outlier NULL-group rows must not be dropped by the join"


def test_event_path_ngrams_null_label_nulls_the_path(spark):
    """A NULL label at ANY of the n positions must void the n-gram —
    concat_ws would otherwise silently shorten A,NULL,C to 'A>C'."""
    from clinical_data_lake_spark.operators.windows import event_path_ngrams

    events = spark.createDataFrame(
        [Row(u=1, t=1, lbl="A"), Row(u=1, t=2, lbl=None), Row(u=1, t=3, lbl="C"),
         Row(u=2, t=1, lbl="A"), Row(u=2, t=2, lbl="B"), Row(u=2, t=3, lbl="C")],
    )
    got = {
        (r.path, r.cnt)
        for r in event_path_ngrams(events, "u", ["t"], "lbl", n=3, k=10).collect()
    }
    assert got == {("A>B>C", 1)}, got


def test_top_n_with_others_rank_by_value(spark):
    from clinical_data_lake_spark.operators.sorts import top_n_with_others

    df = spark.createDataFrame(
        # 'small' has MORE rows but less value mass than 'big'
        [("small", 1.0)] * 5 + [("big", 100.0)] * 2 + [("mid", 10.0)] * 3,
        "label string, v double",
    )
    by_count = {r.label for r in
                top_n_with_others(df, [], "label", 1, value_col="v").collect()}
    assert by_count == {"small", "(other)"}
    by_value = {r.label for r in
                top_n_with_others(df, [], "label", 1, value_col="v",
                                  rank_by="value").collect()}
    assert by_value == {"big", "(other)"}
    with pytest.raises(ValueError, match="requires value_col"):
        top_n_with_others(df, [], "label", 1, rank_by="value")


def test_scd2_lookup_broadcast_gate(spark):
    from clinical_data_lake_spark.operators.cdc import scd2_lookup

    dim = spark.createDataFrame(
        [(1, 0, None, "x")], "k int, valid_from int, valid_to int, attr string")
    facts = spark.createDataFrame([Row(k=1, ts=5)])
    hinted = scd2_lookup(facts, dim, "k", fact_ts="ts")
    plain = scd2_lookup(facts, dim, "k", fact_ts="ts", broadcast_dim=False)
    assert hinted.collect() == plain.collect()
    hinted_plan = hinted._jdf.queryExecution().optimizedPlan().toString()
    plain_plan = plain._jdf.queryExecution().optimizedPlan().toString()
    assert "broadcast" in hinted_plan.lower()
    assert "hint" not in plain_plan.lower()
