"""Bucketed (pre-shuffled) tables for co-located joins.

Not in the reference (its joins rely on broadcast or sort-merge with a
runtime shuffle); this is the 100 TB lever for repeated big-to-big
joins on a stable key: write both sides bucketed by the join key into
the catalog once, and every subsequent join on that key skips BOTH
shuffle exchanges — the scan partitioning already satisfies the join's
distribution requirement. The trade: a fixed bucket count chosen at
write time (size so that table_size / n_buckets lands near the
per-task target, e.g. 128-256 MiB), and inserts must go through the
same bucketing spec.

Spark specifics: bucketing applies to catalog tables only
(``saveAsTable``); ``spark.sql.sources.bucketing.enabled`` is on by
default; matching bucket counts (or a divisor) on both sides lets the
planner elide the exchanges, and ``sortBy`` at write time additionally
elides the sort of a sort-merge join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Materialize ``df`` as a catalog table pre-shuffled into
    ``n_buckets`` by ``bucket_cols`` (and pre-sorted when ``sort_cols``
    is given, eliding the SMJ sort too).

    Self-healing against stale managed-table locations: with an
    ephemeral (per-session) metastore, a previous session's table
    directory survives in the warehouse while the catalog entry does
    not, and ``saveAsTable`` then fails LOCATION_ALREADY_EXISTS. Drop
    the catalog entry and remove an orphaned location before writing —
    but ONLY when the directory looks like a prior table write
    (Spark output files / Hive partition dirs exclusively). A name
    collision with user-placed data raises instead of destroying it.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    parts = name.split(".")
    if len(parts) == 1 or parts[-2] == "default":
        # default-database managed location is <warehouse>/<table>;
        # qualified databases own their location and get a fresh one
        # from create_database, so only the default path can orphan
        from ..catalog import _hadoop_fs

        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        fs, loc = _hadoop_fs(spark, f"{warehouse.rstrip('/')}/{parts[-1]}")
        if fs.exists(loc):
            foreign = [
                n
                for n in (
                    s.getPath().getName() for s in fs.listStatus(loc)
                )
                if not (
                    n.startswith("part-")
                    or n.startswith("_")  # _SUCCESS/_committed/_temporary
                    or n.startswith(".")  # .crc and hidden markers
                    or "=" in n  # Hive partition directories
                )
            ]
            if foreign:
                raise ValueError(
                    f"refusing to overwrite {loc}: directory exists but "
                    f"does not look like a prior managed-table write "
                    f"(unexpected entries {foreign[:5]}); move it aside "
                    f"or pick a different table name"
                )
            fs.delete(loc, True)
    writer = (
        df.write.mode("overwrite").format(fmt).bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)


def join_bucketed(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    keys: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket key. When both
    were written with ``write_bucketed_table`` on ``keys`` with matching
    bucket counts, the physical plan contains no Exchange on either
    side — verify with ``.explain()``/tests."""
    return spark.table(left_table).join(spark.table(right_table), on=list(keys), how=how)


def agg_bucketed(
    spark: SparkSession,
    table: str,
    keys: Sequence[str],
    aggs: dict,
) -> DataFrame:
    """Aggregate a bucketed catalog table on (a prefix of) its bucket
    key WITHOUT a shuffle: the bucketed scan already reports the hash
    partitioning the aggregation requires, so the planner runs a
    single-stage complete aggregation — the same write-time-shuffle
    trade ``join_bucketed`` exploits, applied to repeated rollups on a
    stable key (daily per-entity usage, per-key incremental stats).
    ``aggs``: output name -> aggregate Column. Verify the no-Exchange
    claim with ``.explain``/tests (plan-locked in
    tests/test_bucketing.py).
    """
    from pyspark.sql import functions as F

    df = spark.table(table)
    return df.groupBy(*keys).agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
