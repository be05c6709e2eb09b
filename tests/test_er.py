"""Composed entity resolution: scored pairs -> transitive clusters,
plus the scale-safe sorted-neighborhood blocking (r12)."""

from __future__ import annotations

from clinical_data_lake_spark.operators.er import (
    resolve_matches,
    sorted_neighborhood_block,
)


def test_snm_block_equals_global_window_definition(spark):
    """The bucketed-rank + band-join machinery must produce EXACTLY the
    pairs of the textbook definition: sort by (key, id), pair each
    record with its next window-1 neighbors — verified against a pure
    Python replay, attributes carried on both sides."""
    from clinical_data_lake_spark.operators.caching import release_persisted

    rows = [(i, f"k{(i * 7) % 10}{i % 3}", f"v{i}") for i in range(1, 41)]
    df = spark.createDataFrame(rows, "id int, key string, val string")
    w = 4
    out = sorted_neighborhood_block(df, "id", "key", window=w, prefix_len=1)
    got = sorted((r.id_a, r.id_b) for r in out.collect())
    order = [i for i, k, _ in sorted(rows, key=lambda t: (t[1], t[0]))]
    want = sorted(
        (order[i], order[j])
        for i in range(len(order))
        for j in range(i + 1, min(i + w, len(order)))
    )
    assert got == want
    # O(n*window) bound: n*(w-1) minus the tail edge effect
    assert len(got) == 40 * (w - 1) - (w - 1) * w // 2
    r0 = out.collect()[0]
    assert r0.val_a == f"v{r0.id_a}" and r0.val_b == f"v{r0.id_b}"
    release_persisted()


def test_snm_block_ids_only_matches_attribute_pairs(spark):
    """with_attributes=False returns exactly the id pairs of the full
    variant (the two join-backs are the ONLY difference; multi-pass
    callers that union ids and join attributes once opt out of them)."""
    from clinical_data_lake_spark.operators.caching import release_persisted

    rows = [(i, f"k{(i * 7) % 10}{i % 3}", f"v{i}") for i in range(1, 41)]
    df = spark.createDataFrame(rows, "id int, key string, val string")
    full = sorted_neighborhood_block(df, "id", "key", window=4, prefix_len=1)
    bare = sorted_neighborhood_block(
        df, "id", "key", window=4, prefix_len=1, with_attributes=False
    )
    assert bare.columns == ["id_a", "id_b"]
    got_full = sorted((r.id_a, r.id_b) for r in full.collect())
    got_bare = sorted((r.id_a, r.id_b) for r in bare.collect())
    assert got_bare == got_full
    release_persisted()


def test_snm_block_prefix_len_invariant(spark):
    """Bucketing is an implementation detail: different prefix_len
    values (different bucket splits) must not change the pair set."""
    from clinical_data_lake_spark.operators.caching import release_persisted

    rows = [(i, f"{'ab'[i % 2]}{i % 5}{i}", i * 1.5) for i in range(1, 31)]
    df = spark.createDataFrame(rows, "id int, key string, x double")
    sets = []
    for pl in (1, 2, 3):
        out = sorted_neighborhood_block(df, "id", "key", window=5, prefix_len=pl)
        sets.append(sorted((r.id_a, r.id_b) for r in out.collect()))
        release_persisted()
    assert sets[0] == sets[1] == sets[2] and len(sets[0]) > 0


def test_fs_pair_block_budget_guard(spark):
    """_fs_pair_cols' fixed-cardinality blocking is quadratic per
    block; the in-plan budget guard must fail loudly (naming the
    block) once any block exceeds max_block_size, and be a no-op
    below the cap (r11 verdict: the same blow-up mode as the
    er_pipeline fixed-key demo)."""
    import pytest as _pt

    from clinical_data_lake_spark.driver_queries import _fs_pair_cols
    from conftest import SF_SMALL

    # sf0.001 has 150 customers over 125 (nation, segment) blocks —
    # pigeonhole guarantees a block of >= 2
    pairs, _ = _fs_pair_cols(spark, SF_SMALL, max_block_size=1)
    with _pt.raises(Exception, match="_fs_pair_cols.*block"):
        pairs.count()
    under_cap, _ = _fs_pair_cols(spark, SF_SMALL)
    assert under_cap.count() > 0


def test_resolve_matches_transitive_closure(spark):
    # A~B and B~C accepted (A-C never scored): one cluster {A,B,C};
    # D~E accepted separately; F~G scored but rejected.
    pairs = spark.createDataFrame(
        [
            (1, 2, True),
            (2, 3, True),
            (4, 5, True),
            (6, 7, False),
        ],
        "id_a long, id_b long, is_match boolean",
    )
    out = {r.entity_id: r for r in
           resolve_matches(pairs, "id_a", "id_b").collect()}
    assert set(out) == {1, 2, 3, 4, 5}  # 6/7 absent: no accepted match
    assert out[1].cluster_id == out[2].cluster_id == out[3].cluster_id == 1
    assert out[1].cluster_size == 3
    assert out[4].cluster_id == out[5].cluster_id == 4
    assert out[4].cluster_size == 2


def test_resolve_matches_chain_diameter(spark):
    # a 6-node chain: closure must label all with the minimum id even
    # though no pair connects the ends directly
    pairs = spark.createDataFrame(
        [(i, i + 1, True) for i in range(10, 15)],
        "id_a long, id_b long, is_match boolean",
    )
    rows = resolve_matches(pairs, "id_a", "id_b").collect()
    assert {r.entity_id for r in rows} == set(range(10, 16))
    assert {r.cluster_id for r in rows} == {10}
    assert all(r.cluster_size == 6 for r in rows)


def test_conformal_interval_order_statistic_and_coverage(spark):
    """Split-conformal closed form on a hand-checkable group: verify
    q_hat is the exact k-th order statistic of calibration residuals
    and coverage counts test rows inside [mu - q, mu + q]."""
    import hashlib

    from clinical_data_lake_spark.ml.stats import conformal_interval

    rows = [("g", i, float(i % 7)) for i in range(1, 61)]
    df = spark.createDataFrame(rows, "grp string, id long, y double")
    got = conformal_interval(df, "grp", "id", "y", alpha=0.2).collect()[0]

    # replicate the md5 split + math in pure python
    def u(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16) / 2.0**52

    train = [(i, y) for _, i, y in rows if u(i) < 1 / 3]
    cal = [(i, y) for _, i, y in rows if 1 / 3 <= u(i) < 2 / 3]
    test = [(i, y) for _, i, y in rows if u(i) >= 2 / 3]
    mu = round(sum(y for _, y in train) / len(train), 6)
    res = sorted(round(abs(y - mu), 6) for _, y in cal)
    import math as m

    k = m.ceil((len(cal) + 1) * 0.8)
    q = res[k - 1]
    cov = sum(1 for _, y in test if abs(y - mu) <= q) / len(test)
    assert got.n_cal == len(cal) and got.n_test == len(test)
    assert got.q_hat == pytest_approx(q)
    assert got.coverage == pytest_approx(round(cov, 6))


def pytest_approx(v):
    import pytest

    return pytest.approx(v, abs=1e-9)


def test_conformal_interval_small_group_null_radius(spark):
    from clinical_data_lake_spark.ml.stats import conformal_interval

    # 3 rows: k = ceil((n_cal+1)*0.95) almost surely exceeds n_cal
    df = spark.createDataFrame(
        [("g", 1, 1.0), ("g", 2, 2.0), ("g", 3, 3.0),
         ("g", 4, 1.5), ("g", 5, 2.5), ("g", 6, 0.5)],
        "grp string, id long, y double",
    )
    rows = conformal_interval(df, "grp", "id", "y", alpha=0.05).collect()
    for r in rows:
        assert r.q_hat is None and r.coverage is None


def test_cluster_size_profile_closed_form(spark):
    """Three clusters of sizes 3, 2, 2 -> rows (3,1,3) and (2,2,4);
    mass conservation: sum(n_records) == input rows."""
    from clinical_data_lake_spark.operators.er import cluster_size_profile

    resolved = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20), (21, 20)],
        "entity_id long, cluster_id long",
    )
    got = {
        (r.cluster_size, r.n_clusters, r.n_records)
        for r in cluster_size_profile(resolved).collect()
    }
    assert got == {(3, 1, 3), (2, 2, 4)}
    assert sum(r for _, _, r in got) == resolved.count()
