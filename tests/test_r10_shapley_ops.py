"""Round-10 session-3: exact Shapley channel attribution."""

from __future__ import annotations

import pytest

from clinical_data_lake_spark.operators.windows import shapley_attribution


def _journeys(spark, spec):
    """spec: list of (channel_set, n_users, n_convert)."""
    rows = []
    uid = 0
    for chans, n, conv in spec:
        for j in range(n):
            uid += 1
            converted = j < conv
            for c in chans:
                rows.append((uid, c, converted))
    return spark.createDataFrame(rows, "u long, ch string, conv boolean")


def test_shapley_two_channel_closed_form(spark):
    df = _journeys(
        spark,
        [(["A"], 10, 2), (["B"], 10, 4), (["A", "B"], 10, 8)],
    )
    out = {
        r.channel: r
        for r in shapley_attribution(df, "u", "ch", ["A", "B"], "conv").collect()
    }
    # phi_A = 1/2*v(A) + 1/2*(v(AB)-v(B)) = 0.1 + 0.2
    assert out["A"].shapley == pytest.approx(0.3)
    assert out["B"].shapley == pytest.approx(0.5)
    # efficiency: sums to v(grand coalition)
    assert out["A"].shapley + out["B"].shapley == pytest.approx(0.8)
    assert out["A"].n_touched == 20 and out["A"].conv_touched == 10


def test_shapley_unobserved_coalitions_value_zero(spark):
    # nobody saw both channels: v(AB) = 0 by definition
    df = _journeys(spark, [(["A"], 10, 5), (["B"], 10, 5)])
    out = {
        r.channel: r.shapley
        for r in shapley_attribution(df, "u", "ch", ["A", "B"], "conv").collect()
    }
    # phi_A = 1/2*0.5 + 1/2*(0 - 0.5) = 0
    assert out["A"] == pytest.approx(0.0)
    assert out["B"] == pytest.approx(0.0)


def test_shapley_matches_python_reference_three_channels(spark):
    import itertools
    import math

    spec = [
        (["A"], 8, 1), (["B"], 8, 2), (["C"], 8, 1),
        (["A", "B"], 8, 5), (["B", "C"], 8, 3),
        (["A", "C"], 8, 4), (["A", "B", "C"], 8, 7),
    ]
    df = _journeys(spark, spec)
    chans = ["A", "B", "C"]
    out = {
        r.channel: r.shapley
        for r in shapley_attribution(df, "u", "ch", chans, "conv").collect()
    }

    v = {frozenset(): 0.0}
    for cs, n, conv in spec:
        v[frozenset(cs)] = round(conv / n, 9)
    k = len(chans)
    for c in chans:
        others = [o for o in chans if o != c]
        phi = 0.0
        for r in range(len(others) + 1):
            for sub in itertools.combinations(others, r):
                s = frozenset(sub)
                w = (
                    math.factorial(len(s))
                    * math.factorial(k - 1 - len(s))
                    / math.factorial(k)
                )
                phi += w * (v.get(s | {c}, 0.0) - v.get(s, 0.0))
        assert out[c] == pytest.approx(phi, abs=1e-6)
    # efficiency holds (all coalitions observed) up to the three
    # per-channel round-6 truncations
    assert sum(out.values()) == pytest.approx(v[frozenset(chans)], abs=2e-6)


def test_shapley_guards(spark):
    df = _journeys(spark, [(["A"], 2, 1)])
    with pytest.raises(ValueError):
        shapley_attribution(df, "u", "ch", [], "conv")
    with pytest.raises(ValueError):
        shapley_attribution(df, "u", "ch", ["A", "A"], "conv")
    with pytest.raises(ValueError):
        shapley_attribution(
            df, "u", "ch", ["A", "B", "C", "D", "E", "F"], "conv"
        )
