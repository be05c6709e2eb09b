"""Catalog DDL + table maintenance (SURVEY.md §2.2 D1-D5).

Reference behaviors rebuilt:
- D1 CREATE DATABASE IF NOT EXISTS ... COMMENT ... LOCATION
  (00-etl-rwd.py:151-155)
- D2 DROP TABLE IF EXISTS               (00-etl-rwd.py:158-194)
- D3 CREATE TABLE ... USING <fmt> LOCATION — external table over
  already-written files (00-etl-rwd.py:160-200)
- D4 OPTIMIZE ... ZORDER BY             (00-etl-rwd.py:213,217;
  03-work with ML models.py:57-59) — delta-spark when present, else a
  parquet fallback: repartitionByRange + sortWithinPartitions rewrite,
  which gives the same data-skipping effect through parquet min/max
  row-group stats on the cluster columns.
- D5 DESCRIBE HISTORY                   (03-work with ML models.py:63-65)
  — delta-only; guarded with a clear error on parquet tables.

Identifiers are validated (no SQL splicing of user text beyond
[A-Za-z0-9_]) — the reference concatenates widget values into SQL.
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from .io import has_delta

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _check_ident(name: str) -> str:
    for part in name.split("."):
        if not _IDENT.match(part):
            raise ValueError(f"invalid SQL identifier: {name!r}")
    return name


def create_database(
    spark: SparkSession,
    name: str,
    comment: str | None = None,
    location: str | None = None,
) -> None:
    """D1 — CREATE DATABASE IF NOT EXISTS (00-etl-rwd.py:151-155)."""
    _check_ident(name)
    sql = f"CREATE DATABASE IF NOT EXISTS {name}"
    if comment is not None:
        sql += f" COMMENT '{comment.replace(chr(39), '')}'"
    if location is not None:
        sql += f" LOCATION '{location}'"
    spark.sql(sql)


def drop_table(spark: SparkSession, name: str) -> None:
    """D2 — DROP TABLE IF EXISTS (00-etl-rwd.py:158)."""
    spark.sql(f"DROP TABLE IF EXISTS {_check_ident(name)}")


def register_external_table(
    spark: SparkSession,
    name: str,
    location: str,
    fmt: str = "parquet",
) -> None:
    """D3 — external table over existing files (00-etl-rwd.py:160-200):
    DROP IF EXISTS then CREATE ... USING <fmt> LOCATION. Works with OSS
    parquet; with delta-spark installed pass fmt='delta' for the exact
    reference shape."""
    drop_table(spark, name)
    _check_ident(name)
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {name} USING {_check_ident(fmt)} "
        f"LOCATION '{location}'"
    )


def optimize_table(
    spark: SparkSession,
    name: str,
    zorder_by: list[str],
    location: str | None = None,
    target_partitions: int | None = None,
) -> str:
    """D4 — OPTIMIZE ... ZORDER BY (00-etl-rwd.py:213,217).

    With delta-spark on the classpath this issues the real OPTIMIZE
    ZORDER. The parquet fallback rewrites the table clustered by
    ``repartitionByRange(zorder_by).sortWithinPartitions(zorder_by)``:
    range-partitioning + intra-file ordering concentrates each cluster
    key range into few files, so parquet footer min/max stats prune
    files and row groups for filters on those columns — the same
    data-skipping effect Z-ordering buys, traded against multi-column
    skipping quality. Returns 'delta' or 'parquet' for the path taken.

    At 100 TB the rewrite is a full shuffle of the table — schedule it
    like the reference does (a periodic maintenance job, 00-etl-rwd.py:222),
    not per-query.
    """
    _check_ident(name)
    if has_delta(spark):
        cols = ", ".join(_check_ident(c) for c in zorder_by)
        spark.sql(f"OPTIMIZE {name} ZORDER BY ({cols})")
        return "delta"
    if location is None:
        raise ValueError("parquet fallback needs the table location")
    df = spark.read.parquet(location)
    n = target_partitions or df.rdd.getNumPartitions()
    clustered = df.repartitionByRange(n, *zorder_by).sortWithinPartitions(*zorder_by)
    # parquet can't overwrite a path it is reading: stage next to the
    # target then swap directories
    stage = tempfile.mkdtemp(dir=os.path.dirname(location.rstrip("/")) or ".",
                             prefix=".optimize-")
    try:
        clustered.write.mode("overwrite").parquet(stage)
        backup = location.rstrip("/") + ".bak"
        os.rename(location, backup)
        os.rename(stage, location)
        shutil.rmtree(backup)
    except BaseException:
        shutil.rmtree(stage, ignore_errors=True)
        raise
    # refresh any cached metadata for tables over this path
    spark.sql(f"REFRESH TABLE {name}") if _table_exists(spark, name) else None
    return "parquet"


def _table_exists(spark: SparkSession, name: str) -> bool:
    try:
        return spark.catalog.tableExists(name)
    except Exception:
        return False


def describe_history(spark: SparkSession, name: str) -> DataFrame:
    """D5 — Delta transaction-log audit (03-work with ML models.py:63-65).
    Delta-only by nature; on plain parquet there is no transaction log,
    so this raises with a clear message instead of fabricating data."""
    _check_ident(name)
    if not has_delta(spark):
        raise RuntimeError(
            "DESCRIBE HISTORY requires delta-spark; parquet tables have "
            "no transaction log (reference: 03-work with ML models.py:63-65)"
        )
    return spark.sql(f"DESCRIBE HISTORY {name}")
