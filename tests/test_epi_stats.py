"""Clinical/epidemiology statistics pack: risk measures, McNemar,
Cochran-Mantel-Haenszel, Cochran-Armitage trend, Nelson-Aalen."""

from __future__ import annotations

import math

import pytest

from clinical_data_lake_spark.ml.stats import (
    Z_975,
    cmh_test,
    cochran_armitage,
    mcnemar_test,
    nelson_aalen,
    risk_measures,
)


def _rows(n, ex, oc):
    return [(bool(ex), bool(oc))] * n


# -- risk_measures ------------------------------------------------------


def test_risk_measures_closed_form(spark):
    # a=10 exposed cases, b=40, c=5, d=45: p1=0.2, p0=0.1
    data = (
        _rows(10, 1, 1) + _rows(40, 1, 0) + _rows(5, 0, 1) + _rows(45, 0, 0)
    )
    df = spark.createDataFrame(data, "ex boolean, oc boolean")
    r = risk_measures(df, "ex", "oc").collect()[0]
    assert (r.a, r.b, r.c, r.d) == (10, 40, 5, 45)
    assert r.risk_exposed == pytest.approx(0.2)
    assert r.risk_unexposed == pytest.approx(0.1)
    assert r.risk_ratio == pytest.approx(2.0)
    # Wald log-CI: ln2 +- z*sqrt(40/(10*50) + 45/(5*50))
    se = math.sqrt(40 / (10 * 50) + 45 / (5 * 50))
    assert r.rr_lo == pytest.approx(
        round(math.exp(math.log(2.0) - Z_975 * se), 6)
    )
    assert r.rr_hi == pytest.approx(
        round(math.exp(math.log(2.0) + Z_975 * se), 6)
    )
    assert r.risk_diff == pytest.approx(0.1)
    assert r.nnt == pytest.approx(10.0)


def test_risk_measures_zero_cell_nulls(spark):
    # no unexposed cases -> RR/CI NULL, RD still defined
    data = _rows(10, 1, 1) + _rows(40, 1, 0) + _rows(50, 0, 0)
    df = spark.createDataFrame(data, "ex boolean, oc boolean")
    r = risk_measures(df, "ex", "oc").collect()[0]
    assert r.risk_ratio is None and r.rr_lo is None and r.rr_hi is None
    assert r.risk_diff == pytest.approx(0.2)
    assert r.nnt == pytest.approx(5.0)


def test_risk_measures_no_effect_nnt_null(spark):
    data = _rows(5, 1, 1) + _rows(5, 1, 0) + _rows(5, 0, 1) + _rows(5, 0, 0)
    df = spark.createDataFrame(data, "ex boolean, oc boolean")
    r = risk_measures(df, "ex", "oc").collect()[0]
    assert r.risk_diff == 0.0
    assert r.nnt is None


# -- mcnemar ------------------------------------------------------------


def test_mcnemar_closed_form(spark):
    # concordant 30+40, discordant b=12 (A only), c=4 (B only)
    data = (
        [(True, True)] * 30
        + [(False, False)] * 40
        + [(True, False)] * 12
        + [(False, True)] * 4
    )
    df = spark.createDataFrame(data, "fa boolean, fb boolean")
    r = mcnemar_test(df, "fa", "fb").collect()[0]
    assert r.n == 86
    assert (r.n_discordant_a, r.n_discordant_b) == (12, 4)
    assert r.chi2 == pytest.approx(round((12 - 4) ** 2 / 16, 6))


def test_mcnemar_no_discordance_null(spark):
    df = spark.createDataFrame(
        [(True, True)] * 5 + [(False, False)] * 5, "fa boolean, fb boolean"
    )
    assert mcnemar_test(df, "fa", "fb").collect()[0].chi2 is None


# -- cmh ----------------------------------------------------------------


def _stratum(s, a, b, c, d):
    return (
        [(s, True, True)] * a
        + [(s, True, False)] * b
        + [(s, False, True)] * c
        + [(s, False, False)] * d
    )


def test_cmh_single_stratum_matches_crude(spark):
    # one stratum: MH OR = crude OR = ad/bc
    df = spark.createDataFrame(
        _stratum("x", 10, 20, 5, 40), "s string, ex boolean, oc boolean"
    )
    r = cmh_test(df, "ex", "oc", "s").collect()[0]
    assert r.k == 1 and r.n == 75
    assert r.or_mh == pytest.approx(round((10 * 40) / (20 * 5), 6))
    # chi2 equals the 1-dof MH formula on the single table
    e = 30 * 15 / 75
    v = 30 * 45 * 15 * 60 / (75 * 75 * 74)
    assert r.chi2_mh == pytest.approx(round((10 - e) ** 2 / v, 6), abs=1e-6)


def test_cmh_two_strata_textbook(spark):
    # Agresti-style: identical OR=1 within strata -> or_mh = 1, chi2 ~ 0
    df = spark.createDataFrame(
        _stratum("u", 10, 10, 10, 10) + _stratum("v", 20, 5, 20, 5),
        "s string, ex boolean, oc boolean",
    )
    r = cmh_test(df, "ex", "oc", "s").collect()[0]
    assert r.k == 2
    assert r.or_mh == pytest.approx(1.0)
    assert r.chi2_mh == pytest.approx(0.0, abs=1e-6)


def test_cmh_tiny_stratum_excluded(spark):
    # a 1-row stratum has an undefined variance term -> dropped from sums
    df = spark.createDataFrame(
        _stratum("big", 10, 20, 5, 40) + [("tiny", True, True)],
        "s string, ex boolean, oc boolean",
    )
    r = cmh_test(df, "ex", "oc", "s").collect()[0]
    assert r.k == 1 and r.n == 75


# -- cochran_armitage ---------------------------------------------------


def test_cochran_armitage_monotone_trend(spark):
    # outcome rate rises with level: strong positive z
    rows = []
    for lvl, k in [(1, 1), (2, 3), (3, 5), (4, 7)]:
        rows += [(lvl, True)] * k + [(lvl, False)] * (10 - k)
    df = spark.createDataFrame(rows, "lvl int, oc boolean")
    r = cochran_armitage(df, "lvl", "oc").collect()[0]
    assert r.n == 40 and r.k_levels == 4
    # closed form
    n_i = {1: 10, 2: 10, 3: 10, 4: 10}
    r_i = {1: 1, 2: 3, 3: 5, 4: 7}
    big_n = 40
    big_r = 16
    t = sum(s * r_i[s] for s in n_i)
    s1 = sum(s * n_i[s] for s in n_i)
    s2 = sum(s * s * n_i[s] for s in n_i)
    pbar = big_r / big_n
    var = pbar * (1 - pbar) * (s2 - s1 * s1 / big_n)
    assert r.z == pytest.approx(
        round((t - pbar * s1) / math.sqrt(var), 6), abs=1e-6
    )
    assert r.z > 2.5


def test_cochran_armitage_constant_score_null(spark):
    df = spark.createDataFrame(
        [(3, True)] * 5 + [(3, False)] * 5, "lvl int, oc boolean"
    )
    assert cochran_armitage(df, "lvl", "oc").collect()[0].z is None


# -- nelson_aalen -------------------------------------------------------


def test_nelson_aalen_closed_form(spark):
    # durations: events at t=1 (2 of 5 at risk), t=3 (1 of 2); censored
    # at t=2 (1). H(1)=2/5, H(3)=2/5+1/2=0.9
    subj = spark.createDataFrame(
        [(1.0, 1), (1.0, 1), (2.0, 0), (3.0, 1), (3.0, 0)],
        "duration double, event int",
    )
    rows = {r.t: r for r in nelson_aalen(subj).collect()}
    assert rows[1.0].n_risk == 5 and rows[1.0].n_event == 2
    assert rows[1.0].cum_hazard == pytest.approx(0.4)
    assert rows[2.0].cum_hazard == pytest.approx(0.4)  # censoring adds 0
    assert rows[3.0].n_risk == 2
    assert rows[3.0].cum_hazard == pytest.approx(0.9)


def test_nelson_aalen_matches_km_risk_sets(spark):
    # NA and KM must agree on (n_risk, n_event, n_censor) row for row
    from clinical_data_lake_spark.ml.stats import kaplan_meier

    subj = spark.createDataFrame(
        [(0, float(d % 7), d % 3 != 0) for d in range(100)],
        "arm int, duration double, event boolean",
    )
    na = {
        (r.arm, r.t): (r.n_risk, r.n_event, r.n_censor)
        for r in nelson_aalen(subj, "duration", "event", ["arm"]).collect()
    }
    km = {
        (r.arm, r.t): (r.n_risk, r.n_event, r.n_censor)
        for r in kaplan_meier(subj, "duration", "event", ["arm"]).collect()
    }
    assert na == km


# -- smd_balance --------------------------------------------------------


def test_smd_balance_closed_form(spark):
    # treated x: 1,2,3 (m=2, v=2/3); control x: 5,7 (m=6, v=1)
    df = spark.createDataFrame(
        [(True, 1.0), (True, 2.0), (True, 3.0), (False, 5.0), (False, 7.0)],
        "g boolean, x double",
    )
    from clinical_data_lake_spark.ml.stats import smd_balance

    r = smd_balance(df, "g", ["x"]).collect()[0]
    assert (r.covariate, r.n_treat, r.n_ctrl) == ("x", 3, 2)
    assert r.mean_treat == pytest.approx(2.0)
    assert r.mean_ctrl == pytest.approx(6.0)
    pooled = (2 / 3 + 1.0) / 2
    assert r.smd == pytest.approx(round(-4.0 / math.sqrt(pooled), 6))


def test_smd_balance_constant_covariate_null(spark):
    from clinical_data_lake_spark.ml.stats import smd_balance

    df = spark.createDataFrame(
        [(True, 5.0), (True, 5.0), (False, 5.0), (False, 5.0)],
        "g boolean, x double",
    )
    assert smd_balance(df, "g", ["x"]).collect()[0].smd is None


# -- score_match --------------------------------------------------------


def _brute_nearest(units):
    """Pure-python reference: nearest control per treated; distance tie
    -> lower score; equal-score tie -> highest control id (backward) /
    lowest (forward)."""
    controls = sorted(
        [(s, i) for t, s, i in units if not t], key=lambda p: (p[0], p[1])
    )
    out = {}
    for t, s, i in units:
        if not t:
            continue
        back = max(
            ((cs, ci) for cs, ci in controls if cs <= s), default=None
        )
        fwd = min(((cs, ci) for cs, ci in controls if cs > s), default=None)
        if fwd is None or (back is not None and (s - back[0]) <= (fwd[0] - s)):
            ch = back
        else:
            ch = fwd
        out[i] = ch
    return out


def test_score_match_matches_brute_force(spark):
    from clinical_data_lake_spark.ml.stats import score_match

    # deterministic scattered scores incl. exact-score ties and wide
    # empty regions (forces cross-bucket handoff at n_buckets=8)
    units = []
    for i in range(60):
        treated = i % 3 == 0
        score = float((i * 37) % 100) if i % 7 else 950.0 + i
        units.append((treated, score, i))
    df = spark.createDataFrame(units, "t boolean, s double, id long")
    got = {
        r.treated_id: (r.control_score, r.control_id)
        for r in score_match(df, "t", "s", "id", n_buckets=8).collect()
    }
    want = _brute_nearest(units)
    assert got == {k: v if v else (None, None) for k, v in want.items()}


def test_score_match_exact_tie_is_distance_zero(spark):
    from clinical_data_lake_spark.ml.stats import score_match

    df = spark.createDataFrame(
        [(True, 10.0, 1), (False, 10.0, 2), (False, 10.0, 3), (False, 30.0, 4)],
        "t boolean, s double, id long",
    )
    r = score_match(df, "t", "s", "id", n_buckets=4).collect()[0]
    assert r.match_dist == 0.0
    assert r.control_id == 3  # highest id among equal-score controls


def test_score_match_no_controls_emits_nulls(spark):
    from clinical_data_lake_spark.ml.stats import score_match

    df = spark.createDataFrame(
        [(True, 1.0, 1), (True, 2.0, 2)], "t boolean, s double, id long"
    )
    rows = score_match(df, "t", "s", "id").collect()
    assert len(rows) == 2 and all(r.control_id is None for r in rows)


# -- cem_match ----------------------------------------------------------


def test_cem_weights_rebalance_controls(spark):
    from clinical_data_lake_spark.ml.stats import cem_match

    # stratum A: 2 treated, 4 ctrl; stratum B: 1 treated, 1 ctrl;
    # stratum C: ctrl only (unmatched)
    rows = (
        [(True, "A")] * 2 + [(False, "A")] * 4
        + [(True, "B")] + [(False, "B")]
        + [(False, "C")] * 3
    )
    df = spark.createDataFrame(rows, "g boolean, s string")
    out = {r.s: r for r in cem_match(df, "g", ["s"]).collect()}
    assert out["C"].matched is False and out["C"].control_weight is None
    # matched totals: Mt=3, Mc=5
    wa = (2 / 4) * (5 / 3)
    wb = (1 / 1) * (5 / 3)
    assert out["A"].control_weight == pytest.approx(round(wa, 6))
    assert out["B"].control_weight == pytest.approx(round(wb, 6))
    # control weights x counts sum back to Mc
    assert out["A"].control_weight * 4 + out["B"].control_weight * 1 == (
        pytest.approx(5.0, abs=1e-4)
    )


# -- did_estimate -------------------------------------------------------


def test_did_closed_form(spark):
    from clinical_data_lake_spark.ml.stats import did_estimate

    # treated: 10 -> 25 (+15); control: 10 -> 12 (+2): DiD = 13
    rows = (
        [(True, False, 10.0)] * 20 + [(True, True, 25.0)] * 20
        + [(False, False, 10.0)] * 20 + [(False, True, 12.0)] * 20
    )
    df = spark.createDataFrame(rows, "g boolean, p boolean, x double")
    r = did_estimate(df, "g", "p", "x").collect()[0]
    assert r.diff_in_diff == pytest.approx(13.0)
    assert r.treat_change == pytest.approx(15.0)
    assert r.ctrl_change == pytest.approx(2.0)
    assert r.pre_gap == pytest.approx(0.0)
    # constant cells -> zero variance -> degenerate but exact CI
    assert r.ci_lo == pytest.approx(13.0) and r.ci_hi == pytest.approx(13.0)


def test_did_empty_cell_nulls(spark):
    from clinical_data_lake_spark.ml.stats import did_estimate

    rows = [(True, True, 5.0), (False, False, 3.0), (False, True, 4.0)]
    df = spark.createDataFrame(rows, "g boolean, p boolean, x double")
    r = did_estimate(df, "g", "p", "x").collect()[0]
    assert r.diff_in_diff is None  # no treated-pre cell


# -- evalue -------------------------------------------------------------


def test_evalue_closed_form(spark):
    from clinical_data_lake_spark.ml.stats import evalue

    # RR = 2 -> E = 2 + sqrt(2) ~ 3.414214
    data = (
        _rows(10, 1, 1) + _rows(40, 1, 0) + _rows(5, 0, 1) + _rows(45, 0, 0)
    )
    df = spark.createDataFrame(data, "ex boolean, oc boolean")
    r = evalue(df, "ex", "oc").collect()[0]
    assert r.risk_ratio == pytest.approx(2.0)
    assert r.evalue == pytest.approx(round(2 + math.sqrt(2), 6))


def test_evalue_protective_uses_reciprocal(spark):
    from clinical_data_lake_spark.ml.stats import evalue

    # RR = 0.5 -> use 1/RR = 2 -> same E as RR = 2
    data = (
        _rows(5, 1, 1) + _rows(45, 1, 0) + _rows(10, 0, 1) + _rows(40, 0, 0)
    )
    df = spark.createDataFrame(data, "ex boolean, oc boolean")
    r = evalue(df, "ex", "oc").collect()[0]
    assert r.risk_ratio == pytest.approx(0.5)
    assert r.evalue == pytest.approx(round(2 + math.sqrt(2), 6))


def test_evalue_null_association_is_one(spark):
    from clinical_data_lake_spark.ml.stats import evalue

    data = _rows(5, 1, 1) + _rows(5, 1, 0) + _rows(5, 0, 1) + _rows(5, 0, 0)
    df = spark.createDataFrame(data, "ex boolean, oc boolean")
    r = evalue(df, "ex", "oc").collect()[0]
    assert r.evalue == pytest.approx(1.0)


# -- meta_pool_or -------------------------------------------------------


def test_meta_pool_single_stratum_is_crude(spark):
    from clinical_data_lake_spark.ml.stats import meta_pool_or

    df = spark.createDataFrame(
        _stratum("x", 10, 20, 5, 40), "s string, ex boolean, oc boolean"
    )
    r = meta_pool_or(df, "ex", "oc", "s").collect()[0]
    assert r.k == 1
    assert r.or_pooled == pytest.approx((10 * 40) / (20 * 5), abs=1e-4)
    assert r.q == pytest.approx(0.0)
    assert r.i2 == 0.0


def test_meta_pool_homogeneous_low_i2(spark):
    from clinical_data_lake_spark.ml.stats import meta_pool_or

    # identical ORs across strata -> Q ~ 0, I2 = 0
    df = spark.createDataFrame(
        _stratum("u", 10, 20, 5, 40) + _stratum("v", 20, 40, 10, 80),
        "s string, ex boolean, oc boolean",
    )
    r = meta_pool_or(df, "ex", "oc", "s").collect()[0]
    assert r.k == 2
    assert r.or_pooled == pytest.approx(4.0, abs=1e-3)
    assert r.i2 == pytest.approx(0.0, abs=1e-6)


def test_meta_pool_zero_cell_stratum_excluded(spark):
    from clinical_data_lake_spark.ml.stats import meta_pool_or

    df = spark.createDataFrame(
        _stratum("u", 10, 20, 5, 40) + _stratum("v", 3, 7, 0, 10),
        "s string, ex boolean, oc boolean",
    )
    assert meta_pool_or(df, "ex", "oc", "s").collect()[0].k == 1


# -- std_rate -----------------------------------------------------------


def test_std_rate_adjustment_removes_mix_effect(spark):
    from clinical_data_lake_spark.ml.stats import std_rate

    # Both arms have identical WITHIN-stratum rates (young 0.1/day,
    # old 0.4/day) but opposite stratum mixes -> crude rates differ,
    # adjusted rates are EQUAL.
    rows = []
    # arm A: mostly young;  arm B: mostly old
    rows += [("A", "young", 100.0, 10)] * 9 + [("A", "old", 100.0, 40)] * 1
    rows += [("B", "young", 100.0, 10)] * 1 + [("B", "old", 100.0, 40)] * 9
    df = spark.createDataFrame(rows, "g string, s string, t double, e int")
    out = {r.g: r for r in std_rate(df, "g", "s", "t", "e").collect()}
    assert out["A"].crude_rate != pytest.approx(out["B"].crude_rate)
    assert out["A"].adj_rate == pytest.approx(out["B"].adj_rate, abs=1e-4)


def test_std_rate_missing_stratum_counts_as_zero(spark):
    from clinical_data_lake_spark.ml.stats import std_rate

    rows = [("A", "s1", 100.0, 10), ("B", "s1", 100.0, 10),
            ("B", "s2", 100.0, 0)]
    df = spark.createDataFrame(rows, "g string, s string, t double, e int")
    out = {r.g: r for r in std_rate(df, "g", "s", "t", "e").collect()}
    # A lacks s2: its adjusted rate = W_s1*0.1 + W_s2*0 < crude 0.1/day
    assert out["A"].adj_rate < out["A"].crude_rate
