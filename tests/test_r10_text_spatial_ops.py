"""Round-10 session-3: readability, tokenizer fertility, t-closeness,
grid nearest-neighbor join, partition-stats report."""

from __future__ import annotations

import math
import os

import pytest

from clinical_data_lake_spark.functions.text import (
    readability_profile,
    tokenizer_fertility,
)
from clinical_data_lake_spark.io import partition_stats_report
from clinical_data_lake_spark.operators.joins import grid_nearest_join
from clinical_data_lake_spark.operators.quality import t_closeness_report


# -- readability_profile --------------------------------------------------


def test_readability_closed_form(spark):
    # "cat ran" -> 1+1 syllable runs; "beautiful orange idea" ->
    # eau|i|u = 3, o|a|e = 3, i|ea = 2
    df = spark.createDataFrame(
        [(1, "cat ran", "s1"), (2, "beautiful orange idea", "s1")],
        "doc_id long, text string, source string",
    )
    r = readability_profile(df).collect()[0]
    assert r.n_docs == 2 and r.n_words == 5
    syll = 1 + 1 + 3 + 3 + 2
    assert r.syll_per_word == pytest.approx(round(syll / 5, 6))
    assert r.complex_share == pytest.approx(round(2 / 5, 6))
    expect = 206.835 - 1.015 * (5 / 2) - 84.6 * (syll / 5)
    assert r.flesch == pytest.approx(round(expect, 6))


def test_readability_vowelless_words_floor_one(spark):
    df = spark.createDataFrame(
        [(1, "zzz brr", "s")], "doc_id long, text string, source string"
    )
    r = readability_profile(df).collect()[0]
    assert r.syll_per_word == pytest.approx(1.0)
    assert r.complex_share == 0.0


# -- tokenizer_fertility --------------------------------------------------


def test_fertility_closed_form(spark):
    # "abcd efghijklmnop" -> words 2, subwords ceil(4/4)+ceil(12/4) = 1+3
    df = spark.createDataFrame(
        [("en", "abcd efghijklmnop")], "lang string, text string"
    )
    r = tokenizer_fertility(df, lang_col="lang").collect()[0]
    assert r.n_words == 2 and r.n_subwords == 4
    assert r.fertility == pytest.approx(2.0)


def test_fertility_groups_by_lang(spark):
    df = spark.createDataFrame(
        [("de", "aaaa"), ("de", "bbbbbbbb"), ("fr", "cc dd")],
        "lang string, text string",
    )
    rows = {r.lang: r for r in tokenizer_fertility(df, lang_col="lang").collect()}
    assert rows["de"].n_docs == 2 and rows["de"].n_subwords == 3
    assert rows["fr"].fertility == pytest.approx(1.0)


# -- t_closeness_report ---------------------------------------------------


def test_t_closeness_identical_distribution_is_zero(spark):
    rows = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (1, 2, 3)]
    df = spark.createDataFrame(rows, "qi string, s int")
    out = {r.qi: r for r in t_closeness_report(df, ["qi"], "s").collect()}
    assert out["a"].t == 0.0 and out["b"].t == 0.0


def test_t_closeness_textbook_emd(spark):
    # global values {1,2,3} each 1/3; class "a" holds only value 1.
    # P-Q = (2/3, -1/3, -1/3); cums = 2/3, 1/3, 0; t = (1/2)(2/3+1/3+0) = 1/2
    rows = [("a", 1), ("b", 2), ("c", 3)]
    df = spark.createDataFrame(rows, "qi string, s int")
    out = {r.qi: r for r in t_closeness_report(df, ["qi"], "s").collect()}
    assert out["a"].t == pytest.approx(0.5)
    # symmetric classes at the extremes score the same
    assert out["c"].t == pytest.approx(0.5)
    # the middle class is closer: P-Q = (-1/3, 2/3, -1/3), cums 1/3,1/3,0
    assert out["b"].t == pytest.approx(round((1 / 3 + 1 / 3) / 2, 6))


def test_t_closeness_skewed_class_scores_higher(spark):
    rows = (
        [("lo", v) for v in (1, 1, 2)]
        + [("hi", v) for v in (9, 9, 8)]
        + [("mix", v) for v in (1, 2, 9)]
    )
    df = spark.createDataFrame(rows, "qi string, s int")
    out = {r.qi: r for r in t_closeness_report(df, ["qi"], "s").collect()}
    assert out["hi"].t > out["mix"].t
    assert out["lo"].t > out["mix"].t
    assert all(r.class_size == 3 for r in out.values())


def test_t_closeness_single_value_domain_zero(spark):
    df = spark.createDataFrame(
        [("a", 5), ("b", 5)], "qi string, s int"
    )
    out = t_closeness_report(df, ["qi"], "s").collect()
    assert all(r.t == 0.0 for r in out)


# -- grid_nearest_join ----------------------------------------------------


def test_grid_nearest_matches_brute_force(spark):
    import random

    rng = random.Random(11)
    lpts = [(i, rng.random() * 10, rng.random() * 10) for i in range(30)]
    rpts = [(100 + i, rng.random() * 10, rng.random() * 10) for i in range(60)]
    l_df = spark.createDataFrame(lpts, "lid long, x double, y double")
    r_df = spark.createDataFrame(rpts, "rid long, x double, y double")
    radius = 1.5
    got = {
        r.lid: (r.rid, r.dist_sq)
        for r in grid_nearest_join(
            l_df, r_df, "lid", "rid", radius=radius
        ).collect()
    }
    for lid, lx, ly in lpts:
        best = None
        for rid, rx, ry in rpts:
            d2 = round((lx - rx) ** 2 + (ly - ry) ** 2, 9)
            if d2 <= radius * radius and (
                best is None or (d2, rid) < best
            ):
                best = (d2, rid)
        if best is None:
            assert lid not in got
        else:
            assert got[lid] == (best[1], pytest.approx(best[0]))


def test_grid_nearest_out_of_radius_absent(spark):
    l_df = spark.createDataFrame([(1, 0.0, 0.0)], "lid long, x double, y double")
    r_df = spark.createDataFrame(
        [(9, 5.0, 5.0)], "rid long, x double, y double"
    )
    assert grid_nearest_join(l_df, r_df, "lid", "rid", radius=1.0).count() == 0


def test_grid_nearest_bad_radius_raises(spark):
    df = spark.createDataFrame([(1, 0.0, 0.0)], "i long, x double, y double")
    with pytest.raises(ValueError):
        grid_nearest_join(df, df, "i", "i", radius=0.0)


# -- partition_stats_report ------------------------------------------------


def test_partition_stats_report_skipping(spark, tmp_path):
    path = os.path.join(str(tmp_path), "tbl")
    df = spark.createDataFrame(
        [(d, float(v)) for d in ("d1", "d2", "d3") for v in range(10 * int(d[1]), 10 * int(d[1]) + 5)],
        "day string, value double",
    )
    df.repartition("day").write.partitionBy("day").parquet(path)
    rep = {
        r.part_key: r
        for r in partition_stats_report(
            spark, path, ["value"],
            predicate_col="value", predicate_lo=20.0, predicate_hi=24.0,
        ).collect()
    }
    assert rep["day=d1"].n_rows == 5
    assert rep["day=d1"].min_value == 10.0 and rep["day=d1"].max_value == 14.0
    assert rep["day=d1"].would_skip is True
    assert rep["day=d2"].would_skip is False  # 20..24 overlaps
    assert rep["day=d3"].would_skip is True


def test_partition_stats_report_basename_fallback(spark, tmp_path):
    path = os.path.join(str(tmp_path), "flat")
    spark.createDataFrame([(1,)], "a int").coalesce(1).write.parquet(path)
    rows = partition_stats_report(spark, path, ["a"]).collect()
    assert len(rows) == 1 and rows[0].part_key.endswith(".parquet")
