"""Flagship query — the reference dashboard's comorbidity analysis
(01-rwe-dashboard.r:73-90) transposed onto the driver testdata.

"Among users who performed the index event type, what are the most
common *other* event types?" — the richest single plan in the
reference: distinct cohort -> semi join -> distinct (entity,label) ->
group-count -> top-k. Exercises scan, pushdown filter, semi join,
two-level aggregation and TakeOrderedAndProject in one query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .io import read_table
from .operators.cohort import comorbidity_topk


def flagship(spark: SparkSession, sf_dir: str, index_label: str = "click", k: int = 3) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    return comorbidity_topk(
        events,
        entity_col="user_id",
        label_col="event_type",
        index_label=index_label,
        k=k,
    )
