"""Closed-form units for the r8 graph/quality/reshaping operators:
link prediction, FK orphan audit, ratio-to-report, and melt."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from clinical_data_lake_spark.operators.graph import link_prediction
from clinical_data_lake_spark.operators.projections import melt
from clinical_data_lake_spark.operators.quality import fk_orphans
from clinical_data_lake_spark.operators.windows import ratio_to_report


def test_link_prediction_path_graph(spark):
    # path 1-2-3: the only non-edge with a common neighbor is (1,3)
    # via z=2 with deg(2)=2 -> cn=1, aa=1/ln(2)
    e = spark.createDataFrame([(1, 2), (2, 3)], "src int, dst int")
    out = link_prediction(e).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.node_a, r.node_b, r.cn) == (1, 3, 1)
    assert r.aa == pytest.approx(1.0 / math.log(2), abs=1e-5)


def test_link_prediction_excludes_existing_edges_and_weights_hubs(spark):
    # K3 has no missing links -> empty
    k3 = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "src int, dst int")
    assert link_prediction(k3).count() == 0
    # star 0-{1,2,3}: every leaf pair shares hub 0 (deg 3):
    # aa = 1/ln(3), lower than a deg-2 bridge would give
    star = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], "src int, dst int")
    rows = link_prediction(star).collect()
    assert {(r.node_a, r.node_b) for r in rows} == {(1, 2), (1, 3), (2, 3)}
    assert all(r.aa == pytest.approx(1.0 / math.log(3), abs=1e-5) for r in rows)


def test_fk_orphans_counts_and_nulls(spark):
    child = spark.createDataFrame(
        [(1,), (1,), (2,), (9,), (None,)], "fk int"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    r = fk_orphans(child, parent, "fk", "pk").collect()[0]
    assert (r.n_child, r.n_child_keys) == (5, 3)
    assert (r.n_orphan_rows, r.n_orphan_keys, r.n_null_key_rows) == (2, 1, 1)
    assert r.orphan_share == pytest.approx(0.4)
    assert r.referential_ok is False

    clean = fk_orphans(
        child.filter("fk IS NOT NULL AND fk < 9"), parent, "fk", "pk"
    ).collect()[0]
    assert clean.referential_ok is True and clean.n_orphan_rows == 0


def test_ratio_to_report_closed_form(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 0.0), ("b", 0.0), ("c", 5.0)],
        "g string, v double",
    )
    out = {(r.g, r.v): r.share for r in ratio_to_report(df, ["g"], "v").collect()}
    assert out[("a", 1.0)] == pytest.approx(0.25)
    assert out[("a", 3.0)] == pytest.approx(0.75)
    assert out[("b", 0.0)] is None  # zero-total group -> NULL, not error
    assert out[("c", 5.0)] == pytest.approx(1.0)


def test_melt_roundtrip_counts_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, 2.0, None), (2, 4.0, 5.0)], "id int, m1 double, m2 double"
    )
    out = melt(df, ["id"], ["m1", "m2"], var_col="m", val_col="v")
    rows = {(r.id, r.m): r.v for r in out.collect()}
    assert len(rows) == 4  # NULL values kept
    assert rows[(1, "m2")] is None and rows[(2, "m2")] == 5.0
    # pure projection: no exchange in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
