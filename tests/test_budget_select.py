"""Units for llm/corpus.py:budget_select — the distributed prefix-sum
token-budget curation operator.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from clinical_data_lake_spark.llm.corpus import budget_select


def _ref_select(rows, budget):
    """Driver-side reference: global cumsum in (quality DESC, id) order."""
    out, cum = [], 0
    for rid, tok, q in sorted(rows, key=lambda r: (-r[2], r[0])):
        cum += tok
        if cum <= budget:
            out.append((rid, tok, q, cum))
    return sorted(out)


def test_matches_global_cumsum_with_ties(spark):
    rng = random.Random(7)
    rows = [
        (i, rng.randint(1, 50), round(rng.choice([0.1, 0.25, 0.25, 0.5, 0.9]), 6))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens", "quality"])
    for budget in (0, 100, 2000, 10**6):
        got = sorted(
            (r.doc_id, r.n_tokens, r.quality, r.cum_tokens)
            for r in budget_select(df, budget, num_buckets=8).collect()
        )
        assert got == _ref_select(rows, budget), f"budget={budget}"


def test_boundary_doc_is_dropped(spark):
    rows = [(1, 10, 0.9), (2, 10, 0.8), (3, 10, 0.7)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens", "quality"])
    got = {r.doc_id for r in budget_select(df, 25).collect()}
    assert got == {1, 2}  # doc 3 would overflow to 30 > 25


def test_identical_quality_everywhere(spark):
    """Degenerate bounds (hi == lo): everything lands in one bucket and
    the id tiebreak still yields the exact global order."""
    rows = [(i, 5, 0.5) for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens", "quality"])
    got = sorted(r.doc_id for r in budget_select(df, 26).collect())
    assert got == [0, 1, 2, 3, 4]


def test_no_fact_table_single_partition_window(spark):
    """Plan lock: the corpus-sized cumulative-sum window is PARTITIONED
    by the bucket key (never a global Window.orderBy over the fact),
    and the bucketed projection is cached so the two passes share one
    corpus scan. SinglePartition exchanges exist only for the 1-row
    bounds aggregate and the <=num_buckets offsets window — both
    bounded by construction."""
    df = spark.range(10000).select(
        F.col("id").alias("doc_id"),
        F.lit(10).alias("n_tokens"),
        (F.col("id") % 97 / 100.0).alias("quality"),
    )
    plan = budget_select(df, 1000)._jdf.queryExecution().executedPlan().toString()
    # the fact-side running sum carries the bucket key in its window spec
    assert "windowspecdefinition(__bkt__" in plan
    # both passes read the persisted bucketed table, not the source
    assert plan.count("InMemoryTableScan") == 2
    # exactly two Window nodes: the partitioned fact cumsum + the tiny
    # offsets prefix (any third would mean a hidden global window)
    assert plan.count("Window [") == 2
