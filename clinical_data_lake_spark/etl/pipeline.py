"""The composed ETL pipeline — 00-etl-rwd.py end-to-end:

    ingest -> de-identify PII -> rename -> write tables ->
    denormalize fact -> register catalog tables -> optimize

rebuilt from the operator library as one testable function. Differences
from the reference, by design:
- explicit schemas for CSV ingest (no double-scan inferSchema);
- de-identification via built-in sha2 (no Python UDF round-trip,
  00-etl-rwd.py:64-79);
- bulk rename in one select (00-etl-rwd.py:94-119 loops withColumnRenamed);
- ``mode('overwrite')`` sinks (no dbutils.fs.rm pre-delete race);
- optional hive-style ``partition_by`` per table — the 100 TB knob:
  partition pruning on every downstream scan;
- catalog registration + OPTIMIZE through catalog.py (delta when
  present, clustered-parquet fallback).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession

from .. import catalog
from ..functions.scalar import deidentify
from ..io import read_csv_dir, write_table
from ..operators.joins import denormalize
from ..operators.projections import rename_columns


@dataclass
class TableSpec:
    """Per-table ETL config (the reference hard-codes each table's
    renames/PII inline; 00-etl-rwd.py:75-127)."""

    name: str
    renames: Mapping[str, str] = field(default_factory=dict)
    pii_cols: Sequence[str] = ()
    partition_by: Sequence[str] = ()
    zorder_by: Sequence[str] = ()


@dataclass
class DenormSpec:
    """The fact-table build (00-etl-rwd.py:136-141): base table joined
    to dims on key lists; small dims broadcast."""

    name: str
    base: str
    dims: Sequence[tuple[str, Sequence[str], bool]] = ()
    zorder_by: Sequence[str] = ()


def run_etl(
    spark: SparkSession,
    sources: Mapping[str, DataFrame],
    specs: Sequence[TableSpec],
    out_root: str,
    denorm: DenormSpec | None = None,
    database: str | None = None,
    fmt: str = "parquet",
    optimize: bool = False,
) -> dict[str, str]:
    """Run the pipeline; returns {table_name: output_path}.

    ``sources`` maps table name -> raw DataFrame (from ``read_csv_dir``
    or any reader). Each spec's table is de-identified, renamed, and
    written under ``out_root``; ``denorm`` then builds the fact table
    from the *written* tables (read-back, like the reference's re-read
    at 00-etl-rwd.py:132-134, so the fact build sees exactly what
    downstream consumers see). With ``database`` set, every output is
    registered as an external table (D1-D3); ``optimize`` runs D4 on
    tables with a ``zorder_by``.
    """
    out_root = out_root.rstrip("/")
    paths: dict[str, str] = {}
    if database is not None:
        catalog.create_database(spark, database)

    for spec in specs:
        df = sources[spec.name]
        if spec.pii_cols:
            df = deidentify(df, list(spec.pii_cols))
        if spec.renames:
            df = rename_columns(df, dict(spec.renames))
        path = f"{out_root}/{spec.name}"
        write_table(df, path, fmt=fmt,
                    partition_by=list(spec.partition_by) or None)
        paths[spec.name] = path

    if denorm is not None:
        base = spark.read.format(fmt).load(paths[denorm.base])
        dim_dfs = [
            (spark.read.format(fmt).load(paths[d]), list(keys), bcast)
            for d, keys, bcast in denorm.dims
        ]
        fact = denormalize(base, dim_dfs)
        path = f"{out_root}/{denorm.name}"
        write_table(fact, path, fmt=fmt)
        paths[denorm.name] = path

    if database is not None:
        for name, path in paths.items():
            catalog.register_external_table(spark, f"{database}.{name}", path, fmt)

    if optimize:
        zorders = {s.name: list(s.zorder_by) for s in specs if s.zorder_by}
        if denorm is not None and denorm.zorder_by:
            zorders[denorm.name] = list(denorm.zorder_by)
        for name, cols in zorders.items():
            qualified = f"{database}.{name}" if database else name
            catalog.optimize_table(spark, qualified, cols, location=paths[name])
            if database:
                # the catalog repoint flow moves registered tables to a
                # sibling directory — report where the data lives now
                loc = catalog.table_location(spark, qualified)
                if loc:
                    paths[name] = loc

    return paths


def ingest_csv_dir(
    spark: SparkSession,
    root: str,
    schemas: Mapping[str, str],
) -> dict[str, DataFrame]:
    """The reference's per-file CSV ingest loop (00-etl-rwd.py:41-45)
    with explicit DDL schemas per table name."""
    return {
        name: read_csv_dir(spark, f"{root.rstrip('/')}/{name}.csv", schema=ddl)
        for name, ddl in schemas.items()
    }
