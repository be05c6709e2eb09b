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

import math
import re

from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
    # A hive-partitioned layout is *discovered* at CREATE (the partition
    # columns appear in the schema) but its partitions are not
    # *registered*, so the table reads as 0 rows until recovered.
    if _partition_columns(spark, name):
        spark.sql(f"MSCK REPAIR TABLE {name}")


def _hadoop_fs(spark: SparkSession, path_str: str):
    """(FileSystem, Path) for a path via the Hadoop FS API — resolves
    whatever scheme the path carries (file:/, hdfs:/, s3a:/, ...), so
    table maintenance never assumes a driver-local POSIX filesystem."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def _table_location(spark: SparkSession, name: str) -> str | None:
    """Current physical location of a catalog table (raw URI string)."""
    for row in spark.sql(f"DESCRIBE FORMATTED {_check_ident(name)}").collect():
        if (row[0] or "").strip().lower() == "location":
            return (row[1] or "").strip()
    return None


def table_location(spark: SparkSession, name: str) -> str | None:
    """Public: where a catalog table's data lives.

    Local-filesystem locations come back as a plain POSIX path
    (``file:/x``, ``file:///x`` -> ``/x``); any other scheme (hdfs,
    s3a, ...) is returned as the full URI untouched, so callers can
    hand the result straight back to ``spark.read``/Hadoop FS either
    way."""
    loc = _table_location(spark, name)
    if loc is None:
        return None
    parsed = urlparse(loc)
    if parsed.scheme in ("", "file"):
        return unquote(parsed.path) or loc
    return loc


def _partition_columns(spark: SparkSession, name: str) -> list[str]:
    """Hive-partition columns of a catalog table ([] when unpartitioned)."""
    return [c.name for c in spark.catalog.listColumns(name) if c.isPartition]


# suffix toggled by the repoint flow; kept stable so repeated OPTIMIZE
# runs ping-pong between exactly two directories
_OPT_SUFFIX = ".zopt"

# orderable types whose quantiles approxQuantile can sketch (dates and
# timestamps go through a double cast first)
_Z_RANKABLE = ("int", "bigint", "smallint", "tinyint", "float", "double",
               "date", "timestamp", "timestamp_ntz")


def _with_zorder_key(
    df: DataFrame, cols: list[str], bits: int = 8
) -> tuple[DataFrame, str | None]:
    """Bit-interleaved Z-curve key over rank-normalized cluster columns
    — the multi-dimensional ordering Delta's OPTIMIZE ZORDER applies
    (00-etl-rwd.py:213), rebuilt from public pieces: each column is
    bucketed into 2^bits quantile tiles (rank normalization makes the
    curve skew-proof: every tile holds ~the same row count regardless
    of the value distribution), and the tile numbers' bits are
    interleaved column-round-robin so a sort by the key visits the
    space locality-first in EVERY dimension, not lexicographically.

    Tiles come from ``approxQuantile`` (one distributed sketch pass;
    the driver collects a bounded 2^bits-1 edges per column — the same
    sample-the-range-bounds shape Spark's own RangePartitioner uses).
    Per-row bucketing is ``size(filter(edges, e -> v >= e))`` over the
    edge-array literal and the interleave is shiftleft/bitwiseOR — all
    JVM expressions, no UDF. NULLs land in tile 0 (NULLS FIRST).

    Returns (df_with_key, key_name), or (df, None) when fewer than two
    cluster columns are rankable — one dimension needs no interleaving
    and non-numeric/date types (strings) have no quantile sketch, so
    those fall back to lexicographic range-sort unchanged.
    """
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    rankable = [c for c in cols if types.get(c) in _Z_RANKABLE]
    if len(rankable) < 2:
        return df, None
    n_tiles = 1 << bits
    probs = [i / n_tiles for i in range(1, n_tiles)]
    tmp_names = [f"__zq{i}__" for i in range(len(rankable))]
    tmp = df.select(
        *[
            (F.col(c).cast("timestamp").cast("double") if types[c].startswith(("date", "timestamp"))
             else F.col(c).cast("double")).alias(t)
            for c, t in zip(rankable, tmp_names)
        ]
    )
    all_edges = tmp.stat.approxQuantile(tmp_names, probs, 1.0 / (4 * n_tiles))
    zkey = F.lit(0).cast("long")
    ncols = len(rankable)
    for ci, (c, edges) in enumerate(zip(rankable, all_edges)):
        v = (F.col(c).cast("timestamp").cast("double")
             if types[c].startswith(("date", "timestamp")) else F.col(c).cast("double"))
        # dedupe edges (heavy hitters repeat across quantiles) — fewer
        # comparisons, same bucket boundaries
        uniq = sorted(set(edges))
        bucket = F.size(F.filter(F.array(*[F.lit(e) for e in uniq]), lambda e: v >= e))
        for p in range(bits):
            zkey = zkey.bitwiseOR(
                F.shiftleft(
                    F.shiftright(bucket.cast("long"), p).bitwiseAND(F.lit(1)),
                    p * ncols + ci,
                )
            )
    return df.withColumn("__zkey__", zkey), "__zkey__"


def optimize_table(
    spark: SparkSession,
    name: str,
    zorder_by: list[str],
    location: str | None = None,
    target_partitions: int | None = None,
) -> str:
    """D4 — OPTIMIZE ... ZORDER BY (00-etl-rwd.py:213,217).

    With delta-spark on the classpath this issues the real OPTIMIZE
    ZORDER. The parquet fallback rewrites the table clustered on a
    bit-interleaved Z-curve key over the quantile-normalized cluster
    columns (``_with_zorder_key``): every file then covers a small
    hyper-rectangle of the key space, so parquet footer min/max stats
    prune files for filters on ANY clustered column — including
    trailing ones, which a lexicographic range-sort leaves spanning
    the full value range in every file. Single-column (or non-rankable
    string) clustering falls back to plain
    ``repartitionByRange + sortWithinPartitions``. Returns 'delta' or
    'parquet' for the path taken.

    The rewrite goes through Spark + the Hadoop FS API only (no
    driver-local ``os`` calls), so it works wherever the warehouse
    lives — local FS, HDFS, or an object store through its Hadoop
    connector:

    - table registered in the catalog: write the clustered copy to a
      sibling directory (``<base>`` <-> ``<base>.zopt`` ping-pong),
      ``ALTER TABLE ... SET LOCATION`` to re-point readers at it, then
      delete the old directory. Readers resolving through the catalog
      never observe a missing path; queries already planned against the
      old files should finish before the delete in production (delay
      the delete, vacuum-style, if that race matters).
    - location-only (no table): stage next to the target, then swap via
      ``FileSystem.rename`` with a backup that is restored on failure.
      Stale ``.staging``/``.bak`` directories from a previously failed
      run are cleaned up first.

    At 100 TB the rewrite is a full shuffle of the table — schedule it
    like the reference does (a periodic maintenance job, 00-etl-rwd.py:222),
    not per-query.
    """
    _check_ident(name)
    if has_delta(spark):
        cols = ", ".join(_check_ident(c) for c in zorder_by)
        spark.sql(f"OPTIMIZE {name} ZORDER BY ({cols})")
        return "delta"

    def clustered(df: DataFrame) -> DataFrame:
        n = target_partitions or df.rdd.getNumPartitions()
        zdf, zkey = _with_zorder_key(df, zorder_by)
        if zkey is None:
            # one dimension (or unrankable types): plain range-sort is
            # already the optimal single-column clustering
            return df.repartitionByRange(n, *zorder_by).sortWithinPartitions(*zorder_by)
        # range-partition and sort on the interleaved key; the raw
        # columns tie-break so equal-key runs still pack tight ranges.
        # The key is dropped before the write — footers carry min/max
        # of the REAL columns, which is what pruning reads.
        return (
            zdf.repartitionByRange(n, zkey)
            .sortWithinPartitions(zkey, *zorder_by)
            .drop(zkey)
        )

    if _table_exists(spark, name):
        old = _table_location(spark, name)
        if old is None:
            raise ValueError(f"cannot resolve location of table {name}")
        part_cols = _partition_columns(spark, name)
        base = old.rstrip("/")
        new = (base[: -len(_OPT_SUFFIX)] if base.endswith(_OPT_SUFFIX)
               else base + _OPT_SUFFIX)
        fs, new_path = _hadoop_fs(spark, new)
        if fs.exists(new_path):  # stale copy from a failed prior run
            fs.delete(new_path, True)
        writer = clustered(spark.table(name)).write
        if part_cols:
            # preserve the hive layout or every downstream partition
            # prune (and the repointed table itself) silently breaks
            writer = writer.partitionBy(*part_cols)
        writer.parquet(new)
        spark.sql(f"ALTER TABLE {name} SET LOCATION '{new}'")
        # the old directory must be GONE before the repair: MSCK (ADD/
        # DROP/SYNC) never rewrites the location of a partition spec
        # that already exists, and SYNC only DROPs specs whose
        # directories are missing — repair while the old base still
        # exists and a real Hive metastore keeps every pre-existing
        # partition entry dangling at the old (about-to-be-deleted)
        # paths. Deleting first makes SYNC drop the stale specs and
        # re-ADD them from the new tree. The in-memory catalog
        # re-resolves partitions from the base location either way.
        # Trade-off: queries already planned against the old files die
        # at the delete — delay it, vacuum-style, if that race matters.
        fs, old_path = _hadoop_fs(spark, base)
        fs.delete(old_path, True)
        if part_cols:
            spark.sql(f"MSCK REPAIR TABLE {name} SYNC PARTITIONS")
        spark.sql(f"REFRESH TABLE {name}")
        return "parquet"

    if location is None:
        raise ValueError("parquet fallback needs a registered table or a location")
    _rewrite_in_place(spark, location, clustered)
    return "parquet"


def _rewrite_in_place(spark: SparkSession, location: str, transform) -> None:
    """Rewrite a bare parquet directory through ``transform`` with a
    stage + rename swap (parquet can't overwrite a path it is reading);
    a backup is restored on failure and stale leftovers of a previously
    failed run are cleaned up first. Shared by the location-only
    OPTIMIZE fallback and ``compact_table``."""
    base = location.rstrip("/")
    fs, loc_path = _hadoop_fs(spark, base)
    _, stage_path = _hadoop_fs(spark, base + ".staging")
    _, backup_path = _hadoop_fs(spark, base + ".bak")
    if not fs.exists(loc_path) and fs.exists(backup_path):
        # a prior run died between rename(loc -> .bak) and
        # rename(.staging -> loc): .bak holds the ONLY copy of the
        # table — restore it before any cleanup touches it
        if not fs.rename(backup_path, loc_path):
            raise IOError(
                f"found orphaned backup {base}.bak with no live table "
                f"and could not restore it; not deleting anything"
            )
    for stale in (stage_path, backup_path):  # leftovers of a failed run
        if fs.exists(stale):
            fs.delete(stale, True)
    transform(spark.read.parquet(base)).write.parquet(str(stage_path))
    if not fs.rename(loc_path, backup_path):
        fs.delete(stage_path, True)
        raise IOError(f"rename {base} -> {base}.bak failed")
    if not fs.rename(stage_path, loc_path):
        fs.rename(backup_path, loc_path)  # restore the original table
        fs.delete(stage_path, True)
        raise IOError(f"rename {base}.staging -> {base} failed; original restored")
    fs.delete(backup_path, True)


def compact_table(
    spark: SparkSession,
    location: str,
    target_file_mb: int = 256,
) -> int:
    """Small-files compaction for a bare parquet directory: rewrite to
    ``ceil(total_bytes / target_file_mb)`` files via ``coalesce`` (a
    shuffle-free partition merge — compaction must not pay a full
    re-shuffle of the table) and the same staged rename swap OPTIMIZE
    uses. Returns the file count written.

    The streaming-ingest companion: an availableNow micro-batch sink
    (``stream_to_parquet``) accretes one small file per trigger per
    partition, and at 100 TB the resulting file-count explosion —
    footer reads, task-per-file scheduling — is what kills scan
    latency; periodic compaction to the 128-256 MiB sweet spot is the
    standard maintenance pass (Delta's OPTIMIZE file-size half,
    separate from the clustering half in ``optimize_table``).

    Coalesce keeps existing data order (no clustering change); run
    ``optimize_table`` instead when you also want re-clustering.
    """
    base = location.rstrip("/")
    fs, loc_path = _hadoop_fs(spark, base)
    total_bytes = fs.getContentSummary(loc_path).getLength()
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    _rewrite_in_place(spark, base, lambda df: df.coalesce(n_files))
    return n_files


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
