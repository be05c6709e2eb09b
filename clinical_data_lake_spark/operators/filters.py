"""Filter / predicate operators (SURVEY.md §2.3 P4-P8).

The reference's workhorse predicate is the case-insensitive substring
cohort selector ``lower(REASONDESCRIPTION) LIKE '%<param>%'``
(01-rwe-dashboard.r:63-64, 02-patient-trajectory.py:53) — built there by
string concatenation into SQL (injection-prone); here it is a
parameterized Column function. All of these compile to Catalyst
predicates that push down to the parquet scan (``IsNotNull``,
``StringContains``) — verify with ``df.explain()`` -> ``PushedFilters``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(df: DataFrame, col: str) -> DataFrame:
    """P4 — IS NOT NULL filter (01-rwe-dashboard.r:33,46;
    02-patient-trajectory.py:59)."""
    return df.filter(F.col(col).isNotNull())


def contains_ci(col: str | Column, needle: str) -> Column:
    """P5/F1 — case-insensitive substring predicate:
    ``lower(col) LIKE '%needle%'`` (01-rwe-dashboard.r:63).

    Parameterized (no SQL splicing). ``contains`` compiles to a
    pushdown-able StringContains when the needle is a literal.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(c).contains(needle.lower())


def filter_contains(df: DataFrame, col: str, needle: str) -> DataFrame:
    """P5 — the cohort-selection filter."""
    return df.filter(contains_ci(col, needle))


def filter_contains_any(df: DataFrame, col: str, needles: list[str]) -> DataFrame:
    """P5 — OR of substring predicates (01-rwe-dashboard.r:102-107)."""
    pred = contains_ci(col, needles[0])
    for n in needles[1:]:
        pred = pred | contains_ci(col, n)
    return df.filter(pred)


def filter_not_contains(df: DataFrame, col: str, needle: str) -> DataFrame:
    """P5 — NOT LIKE negation (01-rwe-dashboard.r:76-84), null-safe:
    SQL NOT LIKE drops nulls; we keep that semantic exactly."""
    return df.filter(~contains_ci(col, needle))


def like_flags(df: DataFrame, col: str, needles: list[str], prefix: str = "flag") -> DataFrame:
    """P6 — N substring match flags as *one* projection.

    The reference loops ``withColumn + cache`` per flag
    (include/featurise.py:42-45) — linear plan growth and N cache levels.
    A single select produces one Project node and no caching; at 100 TB
    this is the difference between one scan and a lineage hazard.
    """
    flags = [contains_ci(col, n).alias(f"{prefix}_{i}") for i, n in enumerate(needles)]
    return df.select("*", *flags)


def filter_expr(df: DataFrame, expr: str) -> DataFrame:
    """P7 — string expression filter, Catalyst-parsed
    (03-work with ML models.py:120)."""
    return df.filter(expr)


def filter_eq_global_agg(df: DataFrame, col: str, agg: str = "max",
                         cache_input: bool = False) -> DataFrame:
    """P8 — keep rows where ``col`` equals a global aggregate.

    The reference collects the scalar to the driver then re-filters
    (03-work with ML models.py:191-198). Distributed version: aggregate
    to a 1-row DF and broadcast-join it back — no driver roundtrip and
    the broadcast is free at any scale.

    COST NOTE: ``df`` appears twice in the plan (aggregate + join) and
    Catalyst does not dedupe the two scans. For a cheap parquet scan
    that's fine (the aggregate side prunes to one column and both scans
    push filters); for an expensive upstream lineage pass
    ``cache_input=True`` (persists MEMORY_AND_DISK; caller unpersists
    when done, or use ``operators.caching.scoped_cache`` around the
    whole action).
    """
    if cache_input:
        from .caching import cache_if

        df = cache_if(df, reuse_count=2)
    scalar = df.agg(getattr(F, agg)(col).alias("__scalar__"))
    return (
        df.join(F.broadcast(scalar), on=F.col(col) == F.col("__scalar__"), how="inner")
        .drop("__scalar__")
    )
