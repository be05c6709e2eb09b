"""Round-10 session-3 stats pack: weighted/partial correlation,
sample-ratio-mismatch audit, delta-method ratio-metric CI."""

from __future__ import annotations

import math

import pytest
from pyspark.sql.utils import AnalysisException

from clinical_data_lake_spark.ml.stats import (
    partial_corr,
    ratio_metric_ci,
    srm_check,
    weighted_corr,
)


# -- weighted_corr ------------------------------------------------------


def test_weighted_corr_equals_replication(spark):
    # weight w is equivalent to replicating the row w times
    data = [("g", 1.0, 2.0, 3.0), ("g", 2.0, 1.0, 1.0), ("g", 4.0, 5.0, 2.0)]
    expanded = [
        ("g", x, y) for (_, x, y, w) in data for _ in range(int(w))
    ]
    dfw = spark.createDataFrame(data, "g string, x double, y double, w double")
    dfe = spark.createDataFrame(expanded, "g string, x double, y double")
    rw = weighted_corr(dfw, ["g"], "x", "y", "w").collect()[0]
    re = (
        weighted_corr(
            dfe.withColumn("w", dfe.x * 0 + 1.0), ["g"], "x", "y", "w"
        ).collect()[0]
    )
    assert rw.r_w == pytest.approx(re.r_w)
    assert rw.w_sum == pytest.approx(6.0)

    # closed form: weighted Pearson of the expanded sample
    xs = [x for (_, x, _y) in expanded]
    ys = [y for (_, _x, y) in expanded]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
    den = math.sqrt(
        sum((a - mx) ** 2 for a in xs) * sum((b - my) ** 2 for b in ys)
    )
    assert rw.r_w == pytest.approx(round(num / den, 6))


def test_weighted_corr_constant_is_null(spark):
    df = spark.createDataFrame(
        [("g", 1.0, 5.0, 1.0), ("g", 2.0, 5.0, 2.0)],
        "g string, x double, y double, w double",
    )
    assert weighted_corr(df, ["g"], "x", "y", "w").collect()[0].r_w is None


def test_weighted_corr_ignores_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [("g", 1.0, 1.0, 1.0), ("g", 2.0, 2.0, 1.0), ("g", 9.0, -9.0, 0.0)],
        "g string, x double, y double, w double",
    )
    r = weighted_corr(df, ["g"], "x", "y", "w").collect()[0]
    assert r.n == 2 and r.r_w == pytest.approx(1.0)


# -- partial_corr -------------------------------------------------------


def test_partial_corr_closed_form(spark):
    # y = x + z exactly: controlling z leaves perfect x-y correlation
    rows = [
        ("g", float(x), float(x + z), float(z))
        for x in range(5)
        for z in range(3)
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double, z double")
    r = partial_corr(df, ["g"], "x", "y", "z").collect()[0]
    assert r.r_xy_z == pytest.approx(1.0, abs=1e-6)


def test_partial_corr_spurious_association_vanishes(spark):
    # x = z, y = z (both driven by z, no direct link): r_xy = 1 raw,
    # NULL partial (degenerate: |r_xz| = 1)
    rows = [("g", float(z), float(z), float(z)) for z in range(6)]
    df = spark.createDataFrame(rows, "g string, x double, y double, z double")
    r = partial_corr(df, ["g"], "x", "y", "z").collect()[0]
    assert r.r_xy == pytest.approx(1.0)
    assert r.r_xy_z is None


def test_partial_corr_matches_textbook_formula(spark):
    import random

    rng = random.Random(7)
    rows = [
        ("g",) + (lambda z: (z + rng.random(), z * 2 + rng.random(), z))(
            rng.random() * 10
        )
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double, z double")
    r = partial_corr(df, ["g"], "x", "y", "z").collect()[0]

    def corr(a, b):
        n = len(a)
        ma, mb = sum(a) / n, sum(b) / n
        num = sum((u - ma) * (v - mb) for u, v in zip(a, b))
        return num / math.sqrt(
            sum((u - ma) ** 2 for u in a) * sum((v - mb) ** 2 for v in b)
        )

    xs = [t[1] for t in rows]
    ys = [t[2] for t in rows]
    zs = [t[3] for t in rows]
    rxy, rxz, ryz = corr(xs, ys), corr(xs, zs), corr(ys, zs)
    expect = (rxy - rxz * ryz) / math.sqrt((1 - rxz**2) * (1 - ryz**2))
    assert r.r_xy_z == pytest.approx(expect, abs=1e-5)


# -- srm_check ----------------------------------------------------------


def test_srm_check_closed_form(spark):
    # 60/40 observed vs designed 50/50 over 100 units:
    # E=50 each, contrib = 100/50 = 2.0 each, chi2 = 4.0
    df = spark.createDataFrame(
        [("A",)] * 60 + [("B",)] * 40, "variant string"
    )
    rows = {
        r.variant: r
        for r in srm_check(df, "variant", {"A": 0.5, "B": 0.5}).collect()
    }
    assert rows["A"].observed == 60 and rows["B"].observed == 40
    assert rows["A"].expected == pytest.approx(50.0)
    assert rows["A"].contrib == pytest.approx(2.0)
    assert rows["A"].chi2_total == pytest.approx(4.0)
    assert rows["A"].dof == 1


def test_srm_check_missing_arm_counts_zero(spark):
    df = spark.createDataFrame([("A",)] * 10, "variant string")
    rows = {
        r.variant: r
        for r in srm_check(df, "variant", {"A": 0.8, "B": 0.2}).collect()
    }
    assert rows["B"].observed == 0
    assert rows["B"].expected == pytest.approx(2.0)


def test_srm_check_unknown_arm_raises_in_plan(spark):
    df = spark.createDataFrame([("A",), ("ROGUE",)], "variant string")
    out = srm_check(df, "variant", {"A": 1.0})
    with pytest.raises(Exception, match="ROGUE"):
        out.collect()


def test_srm_check_bad_shares_raise(spark):
    df = spark.createDataFrame([("A",)], "variant string")
    with pytest.raises(ValueError, match="sum to 1"):
        srm_check(df, "variant", {"A": 0.7})


# -- ratio_metric_ci ----------------------------------------------------


def test_ratio_metric_ci_matches_reference(spark):
    # 4 units with per-unit (num, den) totals; reference delta method
    units = {
        "u1": (10.0, 5.0),
        "u2": (20.0, 8.0),
        "u3": (6.0, 4.0),
        "u4": (12.0, 7.0),
    }
    rows = []
    for u, (n_tot, d_tot) in units.items():
        # split each unit's totals over two rows to prove the unit
        # rollup happens before the moments
        rows.append((u, n_tot / 2, d_tot / 2))
        rows.append((u, n_tot / 2, d_tot / 2))
    df = spark.createDataFrame(rows, "u string, num double, den double")
    r = ratio_metric_ci(df, "u", "num", "den").collect()[0]

    ns = [v[0] for v in units.values()]
    ds = [v[1] for v in units.values()]
    k = len(ns)
    mn, md = sum(ns) / k, sum(ds) / k
    ratio = mn / md
    vn = sum((a - mn) ** 2 for a in ns) / k
    vd = sum((b - md) ** 2 for b in ds) / k
    cnd = sum((a - mn) * (b - md) for a, b in zip(ns, ds)) / k
    var_r = (vn + ratio**2 * vd - 2 * ratio * cnd) / (k - 1) / md**2
    se = math.sqrt(var_r)
    assert r.k == 4
    assert r.ratio == pytest.approx(ratio, abs=1e-6)
    assert r.se == pytest.approx(se, abs=1e-5)
    assert r.ci_lo == pytest.approx(ratio - 1.959963984540054 * se, abs=1e-4)
    assert r.ci_hi == pytest.approx(ratio + 1.959963984540054 * se, abs=1e-4)


def test_ratio_metric_ci_single_unit_null_se(spark):
    df = spark.createDataFrame(
        [("u1", 3.0, 2.0)], "u string, num double, den double"
    )
    r = ratio_metric_ci(df, "u", "num", "den").collect()[0]
    assert r.ratio == pytest.approx(1.5)
    assert r.se is None and r.ci_lo is None


def test_ratio_metric_ci_grouped(spark):
    df = spark.createDataFrame(
        [("a", "u1", 2.0, 1.0), ("a", "u2", 4.0, 2.0), ("b", "u3", 9.0, 3.0)],
        "g string, u string, num double, den double",
    )
    out = {
        r.g: r
        for r in ratio_metric_ci(df, "u", "num", "den", ["g"]).collect()
    }
    assert out["a"].ratio == pytest.approx(2.0)
    assert out["b"].ratio == pytest.approx(3.0)
    assert out["b"].se is None
