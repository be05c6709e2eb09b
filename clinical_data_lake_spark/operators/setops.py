"""Set operators (SURVEY.md §2.7 U1 + completions).

Reference call site rebuilt:
- U1 UNION ALL of case/control cohorts  02-patient-trajectory.py:82

Spark's ``union`` is positional UNION ALL; we standardize on
``unionByName`` (name-safe — a silently transposed column order in a
100 TB pipeline is an expensive bug). ``intersect``/``exceptAll``
complete the family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """U1 — UNION ALL, matched by column name (02-patient-trajectory.py:82)."""
    return a.unionByName(b)


def intersect_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    """ANSI INTERSECT (distinct rows in both)."""
    return a.intersect(b)


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """ANSI EXCEPT ALL (multiset difference)."""
    return a.exceptAll(b)
