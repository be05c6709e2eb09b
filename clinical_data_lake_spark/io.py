"""Sources and sinks.

Reference behaviors rebuilt (citations into /root/reference):
- CSV directory ingest with header handling  (00-etl-rwd.py:41-45) — but
  with *explicit* schemas by default instead of ``inferSchema`` (which
  double-scans every file and produces nondeterministic types).
- Delta/parquet scans                        (00-etl-rwd.py:132-134).
- Catalog/SQL scans over registered tables   (00-etl-rwd.py:204,
                                              01-rwe-dashboard.r:14-15).
- Delta sink with overwrite (replacing the reference's
  ``dbutils.fs.rm`` + save dance,            00-etl-rwd.py:91-127).

Delta Lake is optional: if ``delta-spark`` isn't importable we fall back
to parquet transparently (same DataFrame semantics; Delta adds ACID +
OPTIMIZE/ZORDER, see ``catalog.py``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def has_delta(spark: SparkSession) -> bool:
    """True if the Delta Lake data source is on the classpath."""
    try:
        spark._jvm.Class.forName("org.apache.spark.sql.delta.DeltaLog")  # type: ignore[union-attr]
        return True
    except Exception:
        return False


# The driver's events parquet stores ts as TIMESTAMP(NANOS), which the
# Spark parquet reader rejects. Reading with an explicit LongType schema
# bypasses the check (vectorized INT64 read), then we convert ns -> a
# real timestamp column. Integer `div` keeps full precision (a double
# division would lose bits above 2^53 on ns-scale epochs).
_EVENTS_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table (``<sf_dir>/<name>.parquet``)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        df = spark.read.schema(_EVENTS_SCHEMA).parquet(path)
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, tables=TESTDATA_TABLES) -> None:
    """Register each testdata parquet as a temp view for ``spark.sql``."""
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            read_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_csv_dir(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    infer: bool = False,
) -> DataFrame:
    """CSV ingest (reference: 00-etl-rwd.py:41-45).

    Explicit ``schema`` (StructType or DDL string) is the default path;
    ``infer=True`` reproduces the reference's ``inferSchema`` behavior
    (opt-in because it scans data twice and is nondeterministic across
    data variations).
    """
    reader = spark.read.option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Sink (reference: 00-etl-rwd.py:94-141 used rm+save; we use
    ``mode('overwrite')`` which is atomic-enough and avoids the race).

    ``partition_by`` is the 100 TB knob the reference lacked: hive-style
    partitioning on low-cardinality filter columns gives partition pruning
    on every downstream scan.
    """
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
) -> DataFrame:
    """JSONL (one JSON object per line) source — the interchange format
    LLM document corpora actually ship in. Schema is REQUIRED: inferred
    JSON schemas double-scan the input and drift across shards (a field
    that is null in one file and int in another infers differently),
    which at 100 TB is both a second full read and a correctness
    hazard. Lines that don't parse land in ``_corrupt_record`` if the
    schema declares it, else are dropped by Spark's default PERMISSIVE
    mode semantics."""
    return spark.read.schema(schema).json(path)


def write_jsonl(df: DataFrame, path: str, n_files: int | None = None) -> None:
    """JSONL sink with overwrite. ``n_files`` controls output shard
    count (repartition before write); leave None to keep the upstream
    partitioning — at scale one file per task is what you want."""
    out = df.repartition(n_files) if n_files else df
    out.write.mode("overwrite").json(path)
