"""Round-10 session-3: overdispersion VMR, Chapman capture-recapture,
Chao1 vocabulary richness."""

from __future__ import annotations

import math

import pytest

from clinical_data_lake_spark.functions.text import chao1_richness
from clinical_data_lake_spark.ml.stats import capture_recapture, overdispersion


# -- overdispersion ---------------------------------------------------------


def test_overdispersion_poisson_like_near_one(spark):
    # counts 0,1,2,1,0,2 repeated: mean 1, pop var 2/3
    rows = [("g", c) for c in (0, 1, 2, 1, 0, 2)]
    df = spark.createDataFrame(rows, "g string, c int")
    r = overdispersion(df, ["g"], "c").collect()[0]
    assert r.mean == pytest.approx(1.0)
    assert r.variance == pytest.approx(2 / 3, abs=1e-6)
    assert r.vmr == pytest.approx(2 / 3, abs=1e-6)


def test_overdispersion_burst_detected(spark):
    rows = [("g", 0)] * 9 + [("g", 100)]
    df = spark.createDataFrame(rows, "g string, c int")
    r = overdispersion(df, ["g"], "c").collect()[0]
    assert r.vmr > 50


def test_overdispersion_zero_mean_null(spark):
    df = spark.createDataFrame([("g", 0), ("g", 0)], "g string, c int")
    assert overdispersion(df, ["g"], "c").collect()[0].vmr is None


# -- capture_recapture --------------------------------------------------------


def test_capture_recapture_chapman_closed_form(spark):
    # n_a=50, n_b=40, overlap=20: Chapman = 51*41/21 - 1
    a = spark.createDataFrame([(i,) for i in range(50)], "id long")
    b = spark.createDataFrame([(i,) for i in range(30, 70)], "id long")
    r = capture_recapture(a, b, "id").collect()[0]
    assert (r.n_a, r.n_b, r.n_overlap) == (50, 40, 20)
    n_est = 51 * 41 / 21 - 1
    assert r.n_est == pytest.approx(round(n_est, 6))
    var = 51 * 41 * 30 * 20 / (21 * 21 * 22)
    assert r.se == pytest.approx(round(math.sqrt(var), 6), abs=1e-5)
    assert r.ci_lo < r.n_est < r.ci_hi
    # (no true-population coverage claim: these samples are
    # deterministic ranges, not the random draws the CI assumes)


def test_capture_recapture_full_overlap_recovers_n(spark):
    a = spark.createDataFrame([(i,) for i in range(25)], "id long")
    r = capture_recapture(a, a, "id").collect()[0]
    # m = n_a = n_b -> N_hat = (n+1)^2/(n+1) - 1 = n
    assert r.n_est == pytest.approx(25.0)
    assert r.se == pytest.approx(0.0)


def test_capture_recapture_zero_overlap_defined(spark):
    a = spark.createDataFrame([(1,), (2,)], "id long")
    b = spark.createDataFrame([(3,), (4,)], "id long")
    r = capture_recapture(a, b, "id").collect()[0]
    assert r.n_overlap == 0
    assert r.n_est == pytest.approx(3 * 3 / 1 - 1)


def test_capture_recapture_dedupes_samples(spark):
    a = spark.createDataFrame([(1,), (1,), (2,)], "id long")
    b = spark.createDataFrame([(1,)], "id long")
    r = capture_recapture(a, b, "id").collect()[0]
    assert r.n_a == 2 and r.n_b == 1 and r.n_overlap == 1


# -- chao1_richness -----------------------------------------------------------


def test_chao1_closed_form(spark):
    # terms: a x4, b x2, c x1, d x1 -> V=4, F1=2, F2=1
    df = spark.createDataFrame(
        [("s", "a a a a b b c d")], "source string, text string"
    )
    r = chao1_richness(df).collect()[0]
    assert (r.vocab, r.f1, r.f2) == (4, 2, 1)
    chao1 = 4 + 2 * 1 / (2 * 2)
    assert r.chao1 == pytest.approx(chao1)
    assert r.coverage == pytest.approx(round(4 / chao1, 6))


def test_chao1_no_rare_tail_coverage_one(spark):
    df = spark.createDataFrame(
        [("s", "a a a b b b")], "source string, text string"
    )
    r = chao1_richness(df).collect()[0]
    assert r.f1 == 0 and r.chao1 == pytest.approx(2.0)
    assert r.coverage == pytest.approx(1.0)


def test_chao1_all_hapax_extrapolates(spark):
    df = spark.createDataFrame(
        [("s", "a b c d e")], "source string, text string"
    )
    r = chao1_richness(df).collect()[0]
    # V=5, F1=5, F2=0 -> chao1 = 5 + 5*4/2 = 15
    assert r.chao1 == pytest.approx(15.0)
