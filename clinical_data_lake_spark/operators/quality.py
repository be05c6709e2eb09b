"""Data-quality expectation checks — the audit gate an ETL pipeline
runs before publishing a table (the validation counterpart of the
reference's ingest steps, 00-etl-rwd.py:96-141: the same schemas it
loads are what these checks assert over).

One report DataFrame, one row per check:

    (check_name, n_rows, n_violations, passed)

Scale shape: every row-level predicate (not-null, range, set, regex)
folds into a SINGLE aggregate pass over the table — adding a check adds
a column to one map-side partial aggregation, not a scan. Uniqueness
adds a ``count_distinct`` to the same pass. Referential-integrity
checks are per-FK anti-join aggregates (broadcast when the dimension is
small). The wide 1-row aggregate is unpivoted plan-side with ``stack``,
so the report is itself a DataFrame — write it next to the table it
audits.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> Column:
    """Expectation: ``col`` is never NULL."""
    return F.col(col).isNotNull()


def in_range(col: str, lo, hi) -> Column:
    """Expectation: ``lo <= col <= hi`` (NULL fails — pair with an
    explicit ``not_null`` if NULLs are allowed)."""
    return F.col(col).between(F.lit(lo), F.lit(hi))


def in_set(col: str, values: Sequence) -> Column:
    """Expectation: ``col`` is one of ``values``."""
    return F.col(col).isin(list(values))


def matches(col: str, pattern: str) -> Column:
    """Expectation: ``col`` fully matches the (Java/RE2-common) regex."""
    return F.col(col).rlike(pattern)


def check_report(
    df: DataFrame,
    checks: Mapping[str, Column],
    unique_keys: Sequence[str] | None = None,
    fks: Mapping[str, tuple[DataFrame, str, str]] | None = None,
) -> DataFrame:
    """Evaluate expectations over ``df`` and return the audit report.

    ``checks``: name -> boolean Column that should hold for every row;
    a NULL predicate result counts as a violation (ANSI three-valued
    logic would otherwise let NULLs slip through every check).
    ``unique_keys``: adds a ``unique(...)`` check counting surplus
    duplicate rows (n_rows - distinct key combinations).
    ``fks``: name -> (dim_df, fact_col, dim_col); counts fact rows
    whose key has no match in the dimension (orphans). NULL fact keys
    are not orphans — add a ``not_null`` check when they are illegal.
    """
    if not checks and unique_keys is None and not fks:
        raise ValueError("no checks given")

    aggs = [F.count(F.lit(1)).alias("__n__")]
    names = []
    for name, pred in checks.items():
        violation = ~F.coalesce(pred, F.lit(False))
        aggs.append(
            F.sum(F.when(violation, F.lit(1)).otherwise(F.lit(0))).alias(f"__v_{name}__")
        )
        names.append(name)
    if unique_keys is not None:
        key = F.struct(*[F.col(k) for k in unique_keys])
        uname = "unique:" + ",".join(unique_keys)
        aggs.append((F.count(F.lit(1)) - F.count_distinct(key)).alias(f"__v_{uname}__"))
        names.append(uname)

    wide = df.agg(*aggs)
    stack_args = ", ".join(f"'{n}', `__v_{n}__`" for n in names)
    report = wide.select(
        F.expr(f"stack({len(names)}, {stack_args}) AS (check_name, n_violations)"),
        F.col("__n__").alias("n_rows"),
    ).select("check_name", "n_rows", F.col("n_violations").cast("long").alias("n_violations"))

    parts = [report]
    for name, (dim, fact_col, dim_col) in (fks or {}).items():
        keys = dim.select(F.col(dim_col).alias(fact_col)).distinct()
        orphans = (
            df.filter(F.col(fact_col).isNotNull())
            .join(F.broadcast(keys), on=fact_col, how="left_anti")
        )
        parts.append(
            df.agg(
                F.lit(name).alias("check_name"),
                F.count(F.lit(1)).alias("n_rows"),
            ).crossJoin(
                F.broadcast(orphans.agg(F.count(F.lit(1)).alias("n_violations")))
            ).select("check_name", "n_rows", "n_violations")
        )

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("passed", F.col("n_violations") == 0)
