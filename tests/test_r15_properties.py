"""Property-based hardening for the r15 operators: a pure-Python
reference replay of ledger_compaction over generated multi-version,
collision-prone ledgers, and admission_trend vs a dict-arithmetic
reference. Example counts small — every example is a Spark job."""

from __future__ import annotations

import hashlib
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clinical_data_lake_spark.llm.dedup import admission_trend, ledger_compaction
from clinical_data_lake_spark.operators.caching import release_persisted


def _py_fp(text):
    if text is None:
        return None
    norm = re.sub(r"\s+", " ", text.strip().lower())
    return hashlib.md5(norm.encode()).hexdigest()


def _py_compaction(rows):
    """Reference replay: rows = [(id, ts, text)]. Returns the decision
    multiset {(id, ts): decision} under keep / superseded /
    dup_retired semantics (latest ts wins per id, ties by fp asc with
    NULL last; keep-min-id canonical per live fingerprint, NULL fp
    isolated per id)."""
    by_id = {}
    for i, ts, t in rows:
        by_id.setdefault(i, []).append((ts, _py_fp(t)))
    live = {}
    decisions = {}
    for i, versions in by_id.items():
        # order by ts desc, fp asc nulls last — winner first
        versions.sort(key=lambda v: (-v[0], v[1] is None, v[1]))
        win_ts, win_fp = versions[0]
        live[i] = (win_ts, win_fp)
        for ts, _ in versions[1:]:
            decisions[(i, ts)] = "superseded"
    groups = {}
    for i, (ts, fp) in live.items():
        key = fp if fp is not None else f"null:{i}"
        groups.setdefault(key, []).append(i)
    for key, ids in groups.items():
        ids.sort()
        decisions[(ids[0], live[ids[0]][0])] = "keep"
        for i in ids[1:]:
            decisions[(i, live[i][0])] = "dup_retired"
    return decisions


# tiny vocab + tiny id space -> forced fingerprint collisions and
# multi-version ids; a version pair may even share (id, ts)
_texts = st.one_of(
    st.none(),
    st.sampled_from(
        ["alpha beta", "  Alpha   BETA ", "gamma", "delta gamma", "x"]
    ),
)
_row = st.tuples(
    st.integers(min_value=0, max_value=6),
    st.integers(min_value=1, max_value=4),
    _texts,
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(_row, min_size=1, max_size=14))
def test_ledger_compaction_matches_python_reference(spark, rows):
    # de-dup exact (id, ts) collisions: the operator's tie-break within
    # identical (id, ts, fp) rows is arbitrary-but-multiset-stable, so
    # the reference compares cleanly only on unique (id, ts) keys
    uniq = {}
    for i, ts, t in rows:
        uniq[(i, ts)] = t
    rows = [(i, ts, t) for (i, ts), t in sorted(uniq.items())]
    df = spark.createDataFrame(
        rows, "doc_id long, ingest_ts long, text string"
    )
    got = {
        (r["doc_id"], r["ingest_ts"]): r["decision"]
        for r in ledger_compaction(df).collect()
    }
    release_persisted()
    assert got == _py_compaction(rows)


_dec = st.sampled_from(["accept", "exact_dup", "near_dup"])


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(decs=st.lists(
    st.tuples(st.integers(min_value=0, max_value=3), _dec),
    min_size=1, max_size=20,
))
def test_admission_trend_matches_dict_arithmetic(spark, decs):
    df = spark.createDataFrame(decs, "slice_id long, decision string")
    got = {r["slice_id"]: r for r in admission_trend(df).collect()}
    release_persisted()
    per = {}
    for s, d in decs:
        per.setdefault(s, []).append(d)
    prev_rate = None
    for s in sorted(per):
        ds = per[s]
        n, acc = len(ds), sum(1 for d in ds if d == "accept")
        rate = round(acc / n, 6)
        r = got[s]
        assert (r["n_docs"], r["n_accept"]) == (n, acc)
        assert r["n_exact"] == sum(1 for d in ds if d == "exact_dup")
        assert r["n_near"] == sum(1 for d in ds if d == "near_dup")
        assert abs(r["accept_rate"] - rate) < 1e-9
        if prev_rate is None:
            assert r["accept_delta"] is None
        else:
            assert abs(r["accept_delta"] - round(rate - prev_rate, 6)) < 1e-9
        prev_rate = rate
