"""Scoped oracle verifier — the driver-mimic sweep of
.claude/skills/verify/drive_all.py restricted to a comma-separated query
list (argv[1]), for per-change re-verification during optimization
rounds. Identical session config, canonicalization, and pass criteria.

Usage: python scripts/verify_scoped.py q1,q2,... [sf_dir]
"""
import datetime
import decimal
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

NAMES = [q.strip() for q in sys.argv[1].split(",") if q.strip()]
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
spark = (
    SparkSession.builder.master("local[16]")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "16")
    .getOrCreate()
)
assert spark.conf.get("spark.sql.ansi.enabled") == "true"
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E  # noqa: E402
from clinical_data_lake_spark.operators.caching import release_persisted  # noqa: E402

Q, O = E.queries(), E.oracle_sql()
con = duckdb.connect()
for t in (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
):
    p = os.path.join(SF, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")


def canon(v):
    if v is None or v is pd.NaT:
        return "\x00NULL"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (float, np.floating)):
        return "f:nan" if math.isnan(v) else f"f:{float(v)!r}"
    if isinstance(v, decimal.Decimal):
        return f"d:{v}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, datetime.datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, datetime.date):
        return f"ts:{datetime.datetime(v.year, v.month, v.day).isoformat()}"
    if isinstance(v, (bytes, bytearray)):
        return f"x:{bytes(v).hex()}"
    return f"s:{v}"


def canon_pdf(pdf):
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    if len(pdf):
        pdf = pdf.sort_values(by=cols).reset_index(drop=True)
    rows = [tuple(canon(v) for v in row) for row in pdf.itertuples(index=False)]
    return cols, rows


import time  # noqa: E402

fails = []
t_all = time.time()
for name in NAMES:
    t0 = time.time()
    try:
        df = Q[name](spark, SF)
        cols, got = canon_pdf(df.toPandas())
        if name in O:
            ocols, want = canon_pdf(con.execute(O[name]).df())
            ok = ocols == cols and got == want
            status = "oracle-OK" if ok else "ORACLE-FAIL"
            if not ok:
                fails.append(name)
        else:
            status = f"rows-only({len(got)})"
    except Exception as ex:
        status = f"CRASH: {type(ex).__name__}: {str(ex)[:200]}"
        fails.append(name)
    release_persisted()
    print(f"{name:28s} {status} [{time.time()-t0:.1f}s]", flush=True)
print(f"TOTAL {time.time()-t_all:.0f}s FAILS={fails}")
sys.exit(1 if fails else 0)
