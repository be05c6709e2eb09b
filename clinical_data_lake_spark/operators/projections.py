"""Projection / column operators (SURVEY.md §2.3 P1-P3, P9-P11).

Reference call sites rebuilt (citations into /root/reference):
- P1  column rename x13            00-etl-rwd.py:96-119,132-133
- P3  selectExpr alias + literal   01-rwe-dashboard.r:103,107;
                                   03-work with ML models.py:94
- P9  drop columns                 03-work with ML models.py:183
- P10 cast boolean flag to int     include/featurise.py:84,94
- P11 literal/metadata stamping    03-work with ML models.py:148-152

Design: every rename/projection is a *single* ``select``/
``withColumnsRenamed`` pass — one logical Project node, not the
reference's chained ``withColumnRenamed`` x13 (each adds a plan node;
at 100 TB the analyzer cost and plan size matter for long pipelines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rename_columns(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Bulk rename in one pass (reference chains withColumnRenamed x13,
    00-etl-rwd.py:96-119)."""
    return df.withColumnsRenamed(mapping)


def project(df: DataFrame, *cols: Column | str) -> DataFrame:
    """Plain projection; callers pass aliased Columns."""
    return df.select(*cols)


def project_with_literals(df: DataFrame, cols: list[str], literals: dict[str, object]) -> DataFrame:
    """Keep ``cols`` and stamp constant metadata columns
    (reference: model_name/version stamping, 03-work with ML models.py:148-152)."""
    lits = [F.lit(v).alias(k) for k, v in literals.items()]
    return df.select(*cols, *lits)


def drop_columns(df: DataFrame, *cols: str) -> DataFrame:
    """Drop in one call (reference chains .drop x3,
    03-work with ML models.py:183)."""
    return df.drop(*cols)


def bool_flag_to_int(col: Column) -> Column:
    """Boolean predicate -> 0/1 int (reference: like-flag cast for labels
    and window-sum inputs, include/featurise.py:84,94)."""
    return col.cast("int")


def melt(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_col: str = "variable",
    val_col: str = "value",
) -> DataFrame:
    """Wide-to-long unpivot: one output row per (input row, value
    column), ``var_col`` carrying the source column name — the melt
    every metrics-wide table needs before generic per-metric
    aggregation/plotting. Values cast to double (the common numeric
    supertype; mixed-type unpivots should cast explicitly first).

    Pure projection via the native ``unpivot`` (no shuffle, no UDF,
    stays inside whole-stage codegen); rows whose value is NULL are
    KEPT so row counts stay predictable (filter afterwards to drop).
    """
    out = df.select(
        *[F.col(c) for c in id_cols],
        *[F.col(c).cast("double").alias(c) for c in value_cols],
    ).unpivot(
        ids=[*id_cols],
        values=[*value_cols],
        variableColumnName=var_col,
        valueColumnName=val_col,
    )
    return out


def collapse_rare(
    df: DataFrame,
    col: str,
    min_count: int,
    other_label: str = "(rare)",
    out_col: str | None = None,
) -> DataFrame:
    """Long-tail collapse: categories appearing fewer than
    ``min_count`` times map to ``other_label`` — the cardinality
    guard before one-hot/target encodings (and before any groupBy
    whose key cardinality would otherwise explode). NULL categories
    stay NULL (missing is not rare).

    Scale shape: one group-count builds the FREQUENT set (bounded by
    total-rows / min_count, so always broadcastable), broadcast-joined
    back; the fact table never shuffles.
    """
    out_col = out_col or col
    frequent = (
        df.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("__cat__"))
        .agg(F.count(F.lit(1)).alias("__c__"))
        .filter(F.col("__c__") >= min_count)
        .select("__cat__", F.lit(True).alias("__keep__"))
    )
    joined = df.join(
        F.broadcast(frequent), df[col] == F.col("__cat__"), "left"
    ).drop("__cat__")
    replaced = (
        F.when(F.col(col).isNull(), F.lit(None).cast("string"))
        .when(F.col("__keep__"), F.col(col))
        .otherwise(F.lit(other_label))
    )
    return joined.withColumn(out_col, replaced).drop("__keep__")
