"""Eval/divergence pack: permutation test, info gain, JS divergence,
blocklist gate."""

from __future__ import annotations

import hashlib
import math

import pytest

from clinical_data_lake_spark.functions.text import (
    blocklist_scores,
    js_divergence,
)
from clinical_data_lake_spark.ml.stats import info_gain, permutation_test


# -- permutation_test ---------------------------------------------------


def _py_u(ident, b):
    grp = (b - 1) // 4 + 1
    pos = ((b - 1) % 4) * 8
    h = hashlib.md5(f"{ident}|{grp}".encode()).hexdigest()
    return int(h[pos:pos + 8], 16) / 2**32


def test_permutation_test_matches_python_replay(spark):
    # tiny dataset, exact pure-python reimplementation of the replicates
    rows = [(i % 2 == 0, float(10 + i), i) for i in range(12)]
    df = spark.createDataFrame(rows, "g boolean, x double, id long")
    n_perm = 8
    r = permutation_test(df, "g", "x", "id", n_perm=n_perm).collect()[0]
    n1 = sum(1 for g, _, _ in rows if g)
    n = len(rows)
    p1 = round(n1 / n, 9)
    m1 = sum(x for g, x, _ in rows if g) / n1
    m0 = sum(x for g, x, _ in rows if not g) / (n - n1)
    dobs = round(m1 - m0, 9)
    extreme = 0
    for b in range(1, n_perm + 1):
        t = [(_py_u(i, b) < p1) for _, _, i in rows]
        k1 = sum(t)
        if 0 < k1 < n:
            s1 = sum(x for (g, x, i), tt in zip(rows, t) if tt)
            s0 = sum(x for (g, x, i), tt in zip(rows, t) if not tt)
            d = round(s1 / k1 - s0 / (n - k1), 9)
            if abs(d) >= abs(dobs):
                extreme += 1
    assert r.n == n and r.n_treat == n1
    assert r.diff_obs == pytest.approx(round(dobs, 6))
    assert r.n_perm == n_perm
    assert r.n_extreme == extreme
    assert r.p_value == pytest.approx(round((1 + extreme) / (n_perm + 1), 6))


def test_permutation_test_strong_effect_small_p(spark):
    rows = [(True, 1000.0 + i, i) for i in range(50)] + [
        (False, float(i), i + 100) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "g boolean, x double, id long")
    r = permutation_test(df, "g", "x", "id", n_perm=99).collect()[0]
    assert r.n_extreme == 0
    assert r.p_value == pytest.approx(0.01)


def test_permutation_test_null_effect_large_p(spark):
    # same distribution both arms -> p should be comfortably large
    rows = [(i % 2 == 0, float((i // 2) % 10), i) for i in range(200)]
    df = spark.createDataFrame(rows, "g boolean, x double, id long")
    r = permutation_test(df, "g", "x", "id", n_perm=99).collect()[0]
    assert r.p_value > 0.2


# -- info_gain ----------------------------------------------------------


def test_info_gain_perfect_predictor_equals_entropy(spark):
    # feature == label: MI = H(label); independent feature: MI ~ 0
    rows = [(i % 2 == 0, str(i % 2 == 0), str(i % 3)) for i in range(120)]
    df = spark.createDataFrame(rows, "y boolean, fgood string, fnoise string")
    out = {r.feature: r for r in info_gain(df, "y", ["fgood", "fnoise"]).collect()}
    h = math.log(2)  # balanced binary label
    assert out["fgood"].mi_nats == pytest.approx(h, abs=1e-6)
    assert out["fnoise"].mi_nats == pytest.approx(0.0, abs=1e-6)
    assert out["fgood"].n_values == 2
    assert out["fnoise"].n_values == 3


def test_info_gain_null_is_its_own_level(spark):
    # nulls perfectly predict the label -> high MI despite null values
    rows = [(True, None), (True, None), (False, "a"), (False, "a")]
    df = spark.createDataFrame(rows, "y boolean, f string")
    r = info_gain(df, "y", ["f"]).collect()[0]
    assert r.n_values == 2
    assert r.mi_nats == pytest.approx(math.log(2), abs=1e-9)


# -- js_divergence ------------------------------------------------------


def test_js_identical_slices_zero(spark):
    docs = spark.createDataFrame(
        [(1, "a b c", "x"), (2, "a b c", "y")],
        "doc_id long, text string, src string",
    )
    r = js_divergence(docs, "src", "x", "y").collect()[0]
    assert r.jsd_nats == pytest.approx(0.0, abs=1e-9)
    assert r.vocab == 3


def test_js_disjoint_slices_ln2(spark):
    docs = spark.createDataFrame(
        [(1, "a a b", "x"), (2, "c d d", "y")],
        "doc_id long, text string, src string",
    )
    r = js_divergence(docs, "src", "x", "y").collect()[0]
    assert r.jsd_nats == pytest.approx(math.log(2), abs=1e-9)
    assert (r.n_tokens_a, r.n_tokens_b) == (3, 3)


def test_js_symmetric(spark):
    docs = spark.createDataFrame(
        [(1, "a a b c", "x"), (2, "a b b d", "y")],
        "doc_id long, text string, src string",
    )
    fwd = js_divergence(docs, "src", "x", "y").collect()[0].jsd_nats
    rev = js_divergence(docs, "src", "y", "x").collect()[0].jsd_nats
    assert fwd == pytest.approx(rev, abs=1e-12)
    assert 0 < fwd < math.log(2)


# -- blocklist_scores ---------------------------------------------------


def test_blocklist_closed_form(spark):
    docs = spark.createDataFrame(
        [(1, "good words only here"), (2, "bad BAD good"), (3, "")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in blocklist_scores(docs, ["bad"], max_ratio=0.5).collect()
    }
    assert out[1].n_blocked == 0 and out[1].keep
    assert out[2].n_blocked == 2  # case-insensitive, multiplicity
    assert out[2].blocked_ratio == pytest.approx(round(2 / 3, 6))
    assert not out[2].keep
    assert out[3].n_tokens == 0 and out[3].keep


def test_blocklist_strict_default_drops_any_hit(spark):
    docs = spark.createDataFrame(
        [(1, "one bad token among many many many")],
        "doc_id long, text string",
    )
    assert not blocklist_scores(docs, ["bad"]).collect()[0].keep
