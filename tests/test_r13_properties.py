"""Property-based hardening for the r13 operators: a pure-Python
reference replay of URL canonicalization over generated messy URLs,
shard_plan vs the sequential cumsum, and incremental_dedup decisions
vs an exact reference on collision-prone tiny-vocab corpora. Example
counts small — every example is a Spark job."""

from __future__ import annotations

import hashlib
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from clinical_data_lake_spark.functions.text import canonicalize_url
from clinical_data_lake_spark.llm.corpus import shard_plan
from clinical_data_lake_spark.llm.dedup import incremental_dedup
from clinical_data_lake_spark.operators.caching import release_persisted

_TRACK = re.compile(r"^(utm_[^=]*|gclid|fbclid|ref)=")


def _py_canonicalize(url: str) -> str:
    u = url.strip()
    u = re.sub(r"#.*$", "", u)
    rest = re.sub(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://", "", u)
    rest = re.sub(r"^[^@/?]*@", "", rest)
    hp = re.match(r"^([^/?]*)", rest).group(1)
    host = re.sub(r"^www\.", "", re.sub(r":(80|443)$", "", hp.lower()))
    pathquery = rest[len(hp):]
    path = re.sub(r"/+$", "", re.match(r"^([^?]*)", pathquery).group(1))
    qm = re.search(r"\?(.*)$", pathquery)
    qs = qm.group(1) if qm else ""
    params = sorted(p for p in qs.split("&") if p and not _TRACK.match(p))
    qn = "&".join(params)
    return host + path + ("?" + qn if qn else "")


_host_label = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJ0123456789-", min_size=1,
    max_size=8,
).filter(lambda s: not s.startswith("-") and not s.endswith("-"))
_path_seg = st.text(
    alphabet="abcdefghijXYZ0123456789._-", min_size=1, max_size=8
)
_param = st.one_of(
    st.sampled_from(
        ["utm_source=x", "utm_medium=rss", "gclid=123", "fbclid=9",
         "ref=hn", "refresh=1"]
    ),
    st.tuples(_path_seg, _path_seg).map(lambda kv: f"{kv[0]}={kv[1]}"),
)


@st.composite
def _messy_url(draw):
    scheme = draw(st.sampled_from(["http://", "https://", "HTTPS://", ""]))
    cred = draw(st.sampled_from(["", "user:pw@", "bob@"])) if scheme else ""
    www = draw(st.sampled_from(["", "www."]))
    host = ".".join(draw(st.lists(_host_label, min_size=1, max_size=3)))
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    segs = draw(st.lists(_path_seg, min_size=0, max_size=3))
    path = ("/" + "/".join(segs)) if segs else draw(st.sampled_from(["", "/"]))
    trail = draw(st.sampled_from(["", "/", "//"])) if path else ""
    params = draw(st.lists(_param, min_size=0, max_size=4))
    qs = ("?" + "&".join(params)) if params else ""
    frag = draw(st.sampled_from(["", "#top", "#a/b?c=1"]))
    return f"{scheme}{cred}{www}{host}{port}{path}{trail}{qs}{frag}"


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(urls=st.lists(_messy_url(), min_size=1, max_size=12))
def test_canonicalize_url_matches_python_reference(spark, urls):
    df = spark.createDataFrame(
        [Row(i=i, url=u) for i, u in enumerate(urls)],
        schema="i long, url string",
    )
    got = {r.i: r.c for r in df.select("i", canonicalize_url("url").alias("c")).collect()}
    for i, u in enumerate(urls):
        assert got[i] == _py_canonicalize(u), u


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    toks=st.lists(st.integers(min_value=0, max_value=120), min_size=1,
                  max_size=60),
    budget=st.integers(min_value=8, max_value=300),
    id_gap=st.integers(min_value=1, max_value=1_000_000),
)
def test_shard_plan_matches_sequential_replay(spark, toks, budget, id_gap):
    # non-contiguous, arbitrary-origin ids exercise the range bucketing
    rows = [(1000 + i * id_gap, " ".join(["w"] * n) if n else "")
            for i, n in enumerate(toks)]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows],
        schema="doc_id long, text string",
    )
    got = {r["shard_id"]: (r["n_docs"], r["n_tokens"])
           for r in shard_plan(docs, shard_tokens=budget,
                               num_buckets=7).collect()}
    release_persisted()
    want: dict = {}
    cum = 0
    for _id, t in rows:
        nt = len(t.split()) if t.strip() else 1  # split('\s+') on '' -> ['']
        if t == "":
            nt = 1
        sid = cum // budget
        cum += nt
        d, s = want.get(sid, (0, 0))
        want[sid] = (d + 1, s + nt)
    assert got == want


def _py_shingles(text: str, n: int = 3) -> set:
    w = re.sub(r"\s+", " ", text.strip().lower()).split(" ")
    return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)} if len(w) >= n else set()


def _py_incremental(batch, ledger, threshold, cap):
    lfp = {hashlib.md5(re.sub(r"\s+", " ", t.strip().lower()).encode()).hexdigest()
           for _, t in ledger}
    lsh = {i: _py_shingles(t) for i, t in ledger}
    df: dict = {}
    for sh in lsh.values():
        for s in sh:
            df[s] = df.get(s, 0) + 1
    keep = {s for s, c in df.items() if c <= cap}
    lsh = {i: sh & keep for i, sh in lsh.items()}
    out = {}
    for i, t in batch:
        fp = hashlib.md5(re.sub(r"\s+", " ", t.strip().lower()).encode()).hexdigest()
        if fp in lfp:
            out[i] = "exact_dup"
            continue
        bsh = _py_shingles(t) & keep
        near = any(
            bsh and sh and len(bsh & sh) / len(bsh | sh) >= threshold
            for sh in lsh.values()
        )
        out[i] = "near_dup" if near else "accept"
    return out


_vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
_doc = st.lists(st.sampled_from(_vocab), min_size=3, max_size=8).map(" ".join)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    ledger_texts=st.lists(_doc, min_size=1, max_size=6),
    batch_texts=st.lists(_doc, min_size=1, max_size=5),
    threshold=st.sampled_from([0.2, 0.5, 0.8]),
    cap=st.sampled_from([2, 100]),
)
def test_incremental_dedup_matches_python_reference(
    spark, ledger_texts, batch_texts, threshold, cap
):
    ledger = [(i, t) for i, t in enumerate(ledger_texts)]
    batch = [(100 + i, t) for i, t in enumerate(batch_texts)]
    ldf = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in ledger],
                                schema="doc_id long, text string")
    bdf = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in batch],
                                schema="doc_id long, text string")
    got = {r["doc_id"]: r["decision"]
           for r in incremental_dedup(bdf, ldf, threshold=threshold,
                                      max_doc_freq=cap).collect()}
    release_persisted()
    assert got == _py_incremental(batch, ledger, threshold, cap)


def _py_watermark_late(rows, delays, num_batches):
    """Pure-Python replay of the micro-batch watermark model: rows =
    [(arrival_id, epoch_s)], slices = equal-width arrival buckets,
    watermark before slice b = max event time of earlier slices."""
    import math

    ids = [i for i, _ in rows]
    lo, hi = min(ids), max(ids)
    def b(i):
        return min(
            int(math.floor((i - lo) * num_batches / (hi - lo + 1))),
            num_batches - 1,
        )
    bmax: dict = {}
    for i, t in rows:
        bmax[b(i)] = max(bmax.get(b(i), -10**18), t)
    out = {}
    for d in delays:
        late = 0
        for i, t in rows:
            prior = [m for bb, m in bmax.items() if bb < b(i)]
            wm = max(prior) if prior else None
            if wm is not None and t < wm - d:
                late += 1
        out[d] = late
    return out


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.integers(min_value=0, max_value=100_000),
        ),
        min_size=1, max_size=40,
        unique_by=lambda r: r[0],
    ),
    num_batches=st.sampled_from([1, 3, 8]),
)
def test_watermark_lateness_matches_python_replay(spark, rows, num_batches):
    from clinical_data_lake_spark.streaming.events import (
        watermark_lateness_audit,
    )

    delays = (0, 50, 5000)
    ev = spark.createDataFrame(
        [Row(event_id=i, ts=t) for i, t in rows],
        schema="event_id long, ts long",
    ).select("event_id", F.timestamp_seconds("ts").alias("ts"))
    got = {
        r["delay_s"]: r["n_late"]
        for r in watermark_lateness_audit(
            ev, delays_s=delays, num_batches=num_batches
        ).collect()
    }
    release_persisted()
    assert got == _py_watermark_late(rows, delays, num_batches)
