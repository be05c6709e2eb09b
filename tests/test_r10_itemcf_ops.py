"""Round-10 session-3: item-item collaborative filtering."""

from __future__ import annotations

import math

import pytest

from clinical_data_lake_spark.operators.itemsets import item_cf_neighbors


def _baskets(spark, rows):
    return spark.createDataFrame(rows, "b long, i string")


def test_item_cf_closed_form(spark):
    # x and y co-occur in 2 of x's 3 and y's 2 baskets
    rows = [
        (1, "x"), (1, "y"),
        (2, "x"), (2, "y"),
        (3, "x"), (3, "z"),
    ]
    out = {
        (r.item, r.neighbor): r
        for r in item_cf_neighbors(
            _baskets(spark, rows), "b", "i", min_cooc=1
        ).collect()
    }
    r = out[("x", "y")]
    assert r.cooc == 2
    assert r.sim == pytest.approx(round(2 / math.sqrt(3 * 2), 6))
    # symmetric
    assert out[("y", "x")].sim == r.sim


def test_item_cf_min_cooc_prunes(spark):
    rows = [(1, "x"), (1, "y"), (2, "x"), (2, "z"), (2, "y")]
    out = item_cf_neighbors(
        _baskets(spark, rows), "b", "i", min_cooc=2
    ).collect()
    pairs = {(r.item, r.neighbor) for r in out}
    assert ("x", "y") in pairs and ("x", "z") not in pairs


def test_item_cf_topk_deterministic(spark):
    # item q co-occurs once with each of a,b,c (same sim) -> tie
    # breaks by neighbor asc
    rows = [(1, "q"), (1, "a"), (2, "q"), (2, "b"), (3, "q"), (3, "c")]
    out = [
        r
        for r in item_cf_neighbors(
            _baskets(spark, rows), "b", "i", top_k=2, min_cooc=1
        ).collect()
        if r.item == "q"
    ]
    assert [r.neighbor for r in sorted(out, key=lambda r: r.rnk)] == ["a", "b"]


def test_item_cf_duplicate_rows_count_once(spark):
    rows = [(1, "x"), (1, "x"), (1, "y")]
    out = item_cf_neighbors(
        _baskets(spark, rows), "b", "i", min_cooc=1
    ).collect()
    r = [x for x in out if x.item == "x"][0]
    assert r.cooc == 1


def test_item_cf_mega_basket_guard_raises(spark):
    # r10 verdict #4: the documented mega-basket contract is now
    # ENFORCED in-plan — a planted hot basket fails loudly, naming it
    rows = [(1, f"i{k}") for k in range(6)] + [(2, "i0"), (2, "i1")]
    with pytest.raises(Exception, match="item_cf_neighbors.*basket"):
        item_cf_neighbors(
            _baskets(spark, rows), "b", "i", min_cooc=1, max_basket_size=5
        ).collect()


def test_item_cf_guard_optout_none_completes(spark):
    # max_basket_size=None restores pre-cap behavior for legitimate
    # hot baskets (r11 advice: breaking default for real hubs)
    rows = [(1, f"i{k}") for k in range(6)] + [(2, "i0"), (2, "i1")]
    out = item_cf_neighbors(
        _baskets(spark, rows), "b", "i", min_cooc=1, max_basket_size=None
    ).collect()
    assert len(out) > 0
    r = [x for x in out if x.item == "i0" and x.neighbor == "i1"][0]
    assert r.cooc == 2


def test_item_cf_guard_under_cap_matches_uncapped(spark):
    rows = [
        (1, "x"), (1, "y"),
        (2, "x"), (2, "y"),
        (3, "x"), (3, "z"),
    ]
    base = sorted(
        map(tuple, item_cf_neighbors(_baskets(spark, rows), "b", "i",
                                     min_cooc=1).collect())
    )
    capped = sorted(
        map(tuple, item_cf_neighbors(_baskets(spark, rows), "b", "i",
                                     min_cooc=1, max_basket_size=2).collect())
    )
    assert capped == base and len(base) > 0
