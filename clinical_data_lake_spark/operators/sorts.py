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
