"""Sort / limit / top-k operators (SURVEY.md §2.6 T1-T3).

Reference call sites rebuilt:
- T1 top-k by count desc (the dashboard's core pattern)
     01-rwe-dashboard.r:31-35,40-52,73-89; 02-patient-trajectory.py:62-63
- T2 sort-limit-1 as global MIN   include/featurise.py:21-27
- T3 plain limit                  02-patient-trajectory.py:77

Scale notes: ``orderBy(...).limit(k)`` plans as TakeOrderedAndProject —
each task keeps a k-row heap, the driver merges heaps; no global sort.
That's already the right 100 TB plan. The reference's unsorted
``.limit(n)`` is nondeterministic; every top-k here takes tie-breaker
columns so results are stable for the oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """T1 — ORDER BY ... LIMIT k (plans as TakeOrderedAndProject)."""
    return df.orderBy(*order).limit(k)


def top_k_by_count(
    df: DataFrame,
    keys: Sequence[str],
    k: int,
    alias: str = "cnt",
) -> DataFrame:
    """T1 — the dashboard's "top-k conditions" pattern: group-count then
    take the k most frequent (01-rwe-dashboard.r:31-35). Count ties are
    broken by the key columns ascending so the result is deterministic
    (the reference's bare ``orderBy('count')`` is not).
    """
    counted = df.groupBy(*keys).agg(F.count(F.lit(1)).alias(alias))
    order = [F.desc(alias)] + [F.asc(c) for c in keys]
    return counted.orderBy(*order).limit(k)


def global_min(df: DataFrame, col: str, alias: str | None = None) -> DataFrame:
    """T2 — the reference computes a global min by sort+limit(1)
    (include/featurise.py:21-27). An aggregate is semantically identical
    and plans as a two-stage reduce: no sort, no data movement beyond one
    row per partition."""
    return df.agg(F.min(col).alias(alias or f"min_{col}"))


def top_n_with_others(
    df: DataFrame,
    group_cols: Sequence[str],
    label_col: str,
    n: int,
    value_col: str | None = None,
    others_label: str = "(other)",
    rank_by: str = "count",
) -> DataFrame:
    """Reporting rollup: per group, the ``n`` largest labels kept
    verbatim, every remaining label collapsed into one ``(other)``
    row — the standard dashboard shape (the reference's top-k
    condition charts, 01-rwe-dashboard.r:31-52, truncate instead of
    rolling up, losing the tail's mass).

    Ranking is by count (``rank_by="count"``, default) or by the
    decimal-exact sum of ``value_col`` (``rank_by="value"``, requires
    ``value_col``); passing ``value_col`` alone only ADDS the
    ``sum_value`` column without changing the ranking.

    Returns (group_cols..., label, cnt[, sum_value]) where exactly one
    row per group carries ``others_label`` (only when a tail exists).
    Ties at the cutoff break deterministically by label ascending.

    Scale shape: one groupBy on (group, label) — the only data-scale
    shuffle — then a row_number window over the group-label table
    (bounded by label cardinality per group, not rows) and a second
    tiny aggregate for the tail. Decimal sums keep the rollup
    partitioning-invariant.
    """
    from pyspark.sql import Window

    if rank_by not in ("count", "value"):
        raise ValueError(f"rank_by must be 'count' or 'value', got {rank_by!r}")
    if rank_by == "value" and value_col is None:
        raise ValueError("rank_by='value' requires value_col")
    keys = list(group_cols)
    aggs = [F.count(F.lit(1)).alias("cnt")]
    if value_col is not None:
        aggs.append(F.sum(F.col(value_col).cast("decimal(18,3)")).alias("__sv__"))
    cells = df.groupBy(*keys, label_col).agg(*aggs)
    rank_key = F.desc("__sv__") if rank_by == "value" else F.desc("cnt")
    w = Window.partitionBy(*keys).orderBy(rank_key, F.asc(label_col))
    ranked = cells.withColumn("__rn__", F.row_number().over(w))
    head = ranked.filter(F.col("__rn__") <= n).drop("__rn__")
    tail_aggs = [F.sum("cnt").alias("cnt")]
    if value_col is not None:
        tail_aggs.append(F.sum("__sv__").alias("__sv__"))
    tail = (
        ranked.filter(F.col("__rn__") > n)
        .groupBy(*keys)
        .agg(*tail_aggs)
        .withColumn(label_col, F.lit(others_label))
    )
    out = head.unionByName(tail.select(*head.columns))
    cols = [*keys, label_col, F.col("cnt").cast("long").alias("cnt")]
    if value_col is not None:
        cols.append(F.col("__sv__").cast("double").alias("sum_value"))
    return out.select(*cols)


def skyline_2d(
    df: DataFrame,
    keys: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group 2-D skyline (Pareto front, both dimensions maximized;
    Borzsony/Kossmann/Stocker 2001): the points no other point in the
    group weakly dominates with at least one strict improvement — the
    multi-objective "best trade-offs" query (price-vs-quality,
    spend-vs-frequency) that single-metric top-k cannot express.
    Operates on DISTINCT (x, y) pairs per group (coincident points
    never dominate each other, so the front is a set). Returns
    (keys..., x_col, y_col).

    The sort-scan closed form exactly, not an O(n²) dominance join:
    order each group by (x DESC, y DESC); a point is on the front iff
    its y strictly exceeds every earlier point's y — one partitioned
    window over the group, one running max. At 100 TB the group is the
    partition key; within-group data sorts inside its shuffle
    partition (no global order anywhere).
    """
    from pyspark.sql import Window

    pts = df.select(
        *keys,
        F.col(x_col).alias("__x__"),
        F.col(y_col).alias("__y__"),
    ).distinct()
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.desc("__x__"), F.desc("__y__"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max("__y__").over(w)
    return (
        pts.withColumn("__pm__", prev_max)
        .filter(F.col("__pm__").isNull() | (F.col("__y__") > F.col("__pm__")))
        .select(*keys, F.col("__x__").alias(x_col), F.col("__y__").alias(y_col))
    )
