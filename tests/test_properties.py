"""Property-based tests (hypothesis) for the operators whose edge cases
are input-shape-dependent: distributed rank on arbitrary id sets and
de-identification invariants. Example counts are small — every example
is a Spark job."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from clinical_data_lake_spark.functions.scalar import deidentify
from clinical_data_lake_spark.operators.cohort import distributed_rank

_ids = st.lists(
    st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=60,
    unique=True,
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=_ids)
def test_distributed_rank_matches_sorted_order(spark, vals):
    df = spark.createDataFrame([Row(x=v) for v in vals], schema="x long")
    got = {(r.x, r["__rk__"]) for r in distributed_rank(df, "x", num_buckets=7).collect()}
    want = {(v, i + 1) for i, v in enumerate(sorted(vals))}
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    names=st.lists(st.one_of(st.none(), st.text(max_size=20)), min_size=1, max_size=20),
)
def test_deidentify_invariants(spark, names):
    rows = [Row(k=i, name=n) for i, n in enumerate(names)]
    df = spark.createDataFrame(rows, schema="k long, name string")
    out = {r.k: r for r in deidentify(df, ["name"]).collect()}
    for i, n in enumerate(names):
        hashed = out[i].name
        assert hashed is not None and len(hashed) == 64  # sha2-256 hex, nulls prefilled
        assert out[i].k == i  # non-PII untouched
    # equal inputs hash equal; the map is deterministic
    by_input: dict = {}
    for i, n in enumerate(names):
        key = n if n is not None else "\x00"
        by_input.setdefault(key, set()).add(out[i].name)
    assert all(len(v) == 1 for v in by_input.values())
