"""Association-rule and PMI closed-form tests."""

from __future__ import annotations

import math

from clinical_data_lake_spark.operators.itemsets import basket_rules, pmi_cooccurrence


def test_basket_rules_closed_form(spark):
    # 4 baskets: {a,b}, {a,b}, {a,c}, {b}
    lines = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c"), (4, "b")]
    df = spark.createDataFrame(lines, ["bk", "it"])
    out = {(r.item_a, r.item_b): r
           for r in basket_rules(df, "bk", "it", min_support=0.0,
                                 min_pair_support=0.0).collect()}
    ab = out[("a", "b")]
    assert (ab.n_a, ab.n_b, ab.n_ab) == (3, 3, 2)
    assert ab.support == 0.5
    assert abs(ab.conf_a_to_b - 2 / 3) < 1e-6
    assert abs(ab.lift - (2 * 4) / (3 * 3)) < 1e-6
    ac = out[("a", "c")]
    assert (ac.n_ab, ac.n_a, ac.n_b) == (1, 3, 1)
    assert ac.conf_b_to_a == 1.0


def test_basket_rules_apriori_prune_and_set_semantics(spark):
    # duplicate lines collapse; rare item "z" pruned before pairing
    lines = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b"),
             (3, "a"), (3, "b"), (4, "a"), (4, "b"), (1, "z")]
    df = spark.createDataFrame(lines, ["bk", "it"])
    out = basket_rules(df, "bk", "it", min_support=0.5).collect()
    pairs = {(r.item_a, r.item_b) for r in out}
    assert pairs == {("a", "b")}
    assert out[0].n_ab == 4  # duplicates collapsed


def test_pmi_closed_form(spark):
    # perfect dependence: x determines y -> pmi = ln(N / n_y) per cell
    rows = [("x1", "y1")] * 3 + [("x2", "y2")] * 1
    df = spark.createDataFrame(rows, ["x", "y"])
    out = {(r.x, r.y): r.pmi for r in pmi_cooccurrence(df, "x", "y").collect()}
    assert abs(out[("x1", "y1")] - round(math.log(4 / 3), 6)) < 1e-9
    assert abs(out[("x2", "y2")] - round(math.log(4 / 1), 6)) < 1e-9


def test_pmi_independence_is_zero(spark):
    # uniform independent grid -> pmi exactly 0 everywhere
    rows = [(x, y) for x in "ab" for y in "cd" for _ in range(5)]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = pmi_cooccurrence(df, "x", "y").collect()
    assert len(out) == 4 and all(r.pmi == 0.0 for r in out)


def test_mutual_information_closed_forms(spark):
    from clinical_data_lake_spark.operators.itemsets import mutual_information

    # independent uniform grid -> MI exactly 0
    rows = [(x, y) for x in "ab" for y in "cd" for _ in range(5)]
    out = mutual_information(spark.createDataFrame(rows, ["x", "y"]), "x", "y").collect()[0]
    assert out.n_cells == 4 and out.mi_nats == 0.0

    # perfect dependence over 2 equiprobable symbols -> MI = ln 2
    rows = [("a", "p")] * 5 + [("b", "q")] * 5
    out = mutual_information(spark.createDataFrame(rows, ["x", "y"]), "x", "y").collect()[0]
    assert abs(out.mi_nats - math.log(2)) < 1e-9


def test_fpgrowth_itemsets_exact_counts(spark):
    from clinical_data_lake_spark.operators.itemsets import fpgrowth_itemsets

    # 4 baskets: {a,b} x2, {a,c}, {b}; duplicates collapse (set)
    lines = [(1, "a"), (1, "b"), (1, "b"), (2, "a"), (2, "b"),
             (3, "a"), (3, "c"), (4, "b")]
    df = spark.createDataFrame(lines, ["bk", "it"])
    out = {r.itemset: (r.n_items, r.freq)
           for r in fpgrowth_itemsets(df, "bk", "it", min_support=0.5).collect()}
    # min count = ceil(0.5*4) = 2
    assert out["a"] == (1, 3) and out["b"] == (1, 3)
    assert out["a>b"] == (2, 2)
    assert "c" not in out and "a>c" not in out
