"""Local mimic of the driver's correctness gate: run every queries()
entry on Spark at sf0.01 and its oracle_sql() twin on DuckDB over the
same parquet, compare row count, column names, and exact values
(order-insensitive). Stricter than the driver (bit-exact floats) so any
pass here should pass there.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb
import pytest

from clinical_data_lake_spark.driver_queries import ORACLES, QUERIES

from conftest import SF_ORACLE


def _canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, decimal.Decimal):
        return f"d:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, datetime.datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, datetime.date):
        return f"dt:{v.isoformat()}"
    if isinstance(v, (bytes, bytearray)):
        return f"x:{bytes(v).hex()}"
    return f"s:{v}"


def _spark_rows(df, cols):
    return sorted(tuple(_canon(r[c]) for c in cols) for r in df.collect())


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        path = os.path.join(SF_ORACLE, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, ddb, name):
    df = QUERIES[name](spark, SF_ORACLE)
    cols = sorted(df.columns)
    got = _spark_rows(df, cols)

    res = ddb.execute(ORACLES[name])
    ora_cols = [d[0] for d in res.description]
    assert sorted(ora_cols) == cols, f"{name}: columns {sorted(ora_cols)} != {cols}"
    idx = [ora_cols.index(c) for c in cols]
    want = sorted(tuple(_canon(row[i]) for i in idx) for row in res.fetchall())

    assert len(got) == len(want), f"{name}: rowcount {len(got)} != {len(want)}"
    if got != want:
        diffs = [(g, w) for g, w in zip(got, want) if g != w][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_ORACLE)
    n = df.count()
    assert n >= 0
    assert len(df.columns) > 0
