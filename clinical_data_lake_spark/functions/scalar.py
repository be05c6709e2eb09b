"""Scalar functions (SURVEY.md §2.8 F1-F9).

Reference call sites rebuilt:
- F2 SHA-1 PII hash as a *Python UDF*  (00-etl-rwd.py:64-79) — rebuilt
  with built-in ``F.sha2`` so rows never leave the JVM: the reference's
  UDF pickles every row to a Python worker and back, breaking
  whole-stage codegen; the built-in stays inside Tungsten. On 100 TB
  this is a ~10-100x difference on the de-identification pass.
- F3 coalesce/ifnull null-defaulting   (00-etl-rwd.py:79;
  include/featurise.py:85; 01-rwe-dashboard.r:110)
- F4 datediff day arithmetic           (include/featurise.py:34-35)
- F7 nested map/struct field access    (03-work with ML models.py:177-181)
- extension: JSON extraction over events.props (get_json_object /
  from_json with an explicit schema).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deidentify(df: DataFrame, pii_cols: list[str], null_token: str = "null") -> DataFrame:
    """Hash PII columns in place (00-etl-rwd.py:75-79 semantics: nulls
    pre-filled with the literal token, then hashed; all other columns
    pass through). One Project node for all columns — the reference
    loops withColumn x20."""
    pii = set(pii_cols)
    cols = [
        F.sha2(F.coalesce(F.col(c).cast("string"), F.lit(null_token)), 256).alias(c)
        if c in pii
        else F.col(c)
        for c in df.columns
    ]
    return df.select(*cols)


def null_fill(col: str | Column, default: object) -> Column:
    """F3 — ifnull/coalesce (include/featurise.py:85)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(default))


def days_between(end: str | Column, start: str | Column) -> Column:
    """F4 — whole days end - start (include/featurise.py:34-35).
    Cast to long so the type is stable across engines."""
    e = F.col(end) if isinstance(end, str) else end
    s = F.col(start) if isinstance(start, str) else start
    return F.datediff(e, s).cast("long")


def day_index(ts_col: str | Column, origin_col: str | Column) -> Column:
    """Integer day index since an origin (the reference's window
    order key, include/featurise.py:34)."""
    return days_between(ts_col, origin_col)


def map_item(map_col: str | Column, key: str) -> Column:
    """F7 — nested map access (metrics/params pattern,
    03-work with ML models.py:177-181)."""
    c = F.col(map_col) if isinstance(map_col, str) else map_col
    return c.getItem(key)


def struct_field(struct_col: str | Column, field: str) -> Column:
    """F7 — nested struct access."""
    c = F.col(struct_col) if isinstance(struct_col, str) else struct_col
    return c.getField(field)


def json_string_field(json_col: str | Column, path: str) -> Column:
    """Extension — extract a field from a JSON string column
    (events.props). ``get_json_object`` is JVM-side and streaming-safe."""
    c = F.col(json_col) if isinstance(json_col, str) else json_col
    return F.get_json_object(c, path)
