"""r9 LLM-pipeline operators: product-quantization ANN."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from clinical_data_lake_spark.llm.similarity import pq_centroids, pq_topk


def _np_pq_adc(queries, corpus, centroids, m, k):
    """Reference ADC in numpy: encode corpus by per-subspace argmin
    (ties -> smallest centroid index), LUT per query, left-assoc sums
    (numpy float64 ops on the same doubles match Spark's chains here
    because each chain is summed in the same order)."""
    cents = np.asarray(centroids, float)
    dim = cents.shape[1]
    d_sub = dim // m
    out = {}
    codes = {}
    for nid, v in corpus:
        v = np.asarray(v, float)
        cs = []
        for j in range(m):
            sub = v[j * d_sub : (j + 1) * d_sub]
            csub = cents[:, j * d_sub : (j + 1) * d_sub]
            d = ((csub - sub) ** 2).sum(axis=1)
            cs.append(int(np.lexsort((np.arange(len(d)), d))[0]))
        codes[nid] = cs
    for qid, qv in queries:
        qv = np.asarray(qv, float)
        scored = []
        for nid, _ in corpus:
            if nid == qid:
                continue
            tot = 0.0
            for j in range(m):
                c = codes[nid][j]
                sub = qv[j * d_sub : (j + 1) * d_sub]
                csub = cents[c, j * d_sub : (j + 1) * d_sub]
                tot += float(((csub - sub) ** 2).sum())
            scored.append((tot, nid))
        scored.sort()
        out[qid] = [(nid, round(t, 6), r + 1) for r, (t, nid) in enumerate(scored[:k])]
    return out


def test_pq_topk_matches_numpy_adc(spark):
    rnd = random.Random(5)
    dim, m = 8, 4
    rows = [
        Row(vec_id=i, embedding=[rnd.uniform(-1, 1) for _ in range(dim)])
        for i in range(40)
    ]
    emb = spark.createDataFrame(rows)
    centroids = [list(rows[i].embedding) for i in (3, 11, 19, 27)]
    got = pq_topk(
        emb.filter(F.col("vec_id") < 3), emb, k=5, m=m, centroids=centroids
    ).collect()
    data = [(r.vec_id, r.embedding) for r in rows]
    want = _np_pq_adc([d for d in data if d[0] < 3], data, centroids, m, 5)
    got_by_q = {}
    for r in got:
        got_by_q.setdefault(r.query_id, []).append((r.neighbor_id, r.adist, r.rnk))
    for qid, items in want.items():
        got_items = sorted(got_by_q[qid], key=lambda x: x[2])
        assert [(n, r) for n, _, r in got_items] == [(n, r) for n, _, r in items]
        for (gn, ga, _), (wn, wa, _) in zip(got_items, items):
            assert ga == pytest.approx(wa, abs=1e-6), (qid, gn, wn)


def test_pq_topk_recovers_planted_clusters(spark):
    """Well-separated clusters: with one centroid landing in each
    cluster, every query's top neighbors are its own cluster."""
    rnd = random.Random(9)
    dim = 16
    centers = {0: [4.0] * 8 + [0.0] * 8, 1: [0.0] * 8 + [4.0] * 8}
    rows = []
    for i in range(60):
        c = centers[i % 2]
        rows.append(
            Row(vec_id=i, embedding=[x + rnd.gauss(0, 0.05) for x in c])
        )
    emb = spark.createDataFrame(rows)
    out = pq_topk(
        emb.filter(F.col("vec_id") < 4), emb, k=8, m=4, k_cent=8, seed=1
    ).collect()
    for r in out:
        assert r.neighbor_id % 2 == r.query_id % 2, r


def test_pq_centroids_deterministic_and_bounded(spark):
    rows = [
        Row(vec_id=i, embedding=[float(i), float(i % 3)]) for i in range(50)
    ]
    emb = spark.createDataFrame(rows)
    a = pq_centroids(emb, k_cent=4, seed=7)
    b = pq_centroids(emb.repartition(7), k_cent=4, seed=7)
    assert a == b and len(a) == 4


def test_knn_classify_majority_and_tiebreak(spark):
    from clinical_data_lake_spark.llm.similarity import knn_classify

    # corpus: 6 labeled points in 2D; query at origin-ish nearest to
    # three 'a' and one 'b' within k=4
    rows = [
        Row(vec_id=10, label="a", embedding=[1.0, 0.1]),
        Row(vec_id=11, label="a", embedding=[1.0, -0.1]),
        Row(vec_id=12, label="a", embedding=[0.9, 0.0]),
        Row(vec_id=13, label="b", embedding=[0.5, 0.5]),
        Row(vec_id=14, label="b", embedding=[-1.0, 0.2]),
        Row(vec_id=15, label="b", embedding=[-1.0, -0.2]),
    ]
    corpus = spark.createDataFrame(rows)
    qschema = "vec_id int, label string, embedding array<double>"
    q = spark.createDataFrame([(1, None, [1.0, 0.0])], qschema)
    r = knn_classify(q, corpus, k=4).collect()[0]
    assert (r.query_id, r.pred_label, r.votes) == (1, "a", 3)
    # exact tie at k=2 between a (1 vote) and b (1 vote)? build one:
    q2 = spark.createDataFrame([(2, None, [0.0, 1.0])], qschema)
    r2 = knn_classify(q2, corpus, k=2).collect()[0]
    assert r2.pred_label in ("a", "b")  # deterministic winner exists
    again = knn_classify(q2, corpus, k=2).collect()[0]
    assert r2.pred_label == again.pred_label


def test_silhouette_separated_vs_mixed(spark):
    from clinical_data_lake_spark.llm.similarity import silhouette_simplified

    import random as _r

    rnd = _r.Random(3)
    rows = []
    vid = 0
    for lbl, center in (("x", [5.0, 0.0]), ("y", [0.0, 5.0])):
        for _ in range(20):
            rows.append(Row(
                vec_id=vid, label=lbl,
                embedding=[c + rnd.gauss(0, 0.1) for c in center],
            ))
            vid += 1
    sep = {r.label: r for r in
           silhouette_simplified(spark.createDataFrame(rows)).collect()}
    assert sep["x"].mean_silhouette > 0.9 and sep["y"].mean_silhouette > 0.9
    # fully mixed labels -> silhouette near 0 or negative
    mixed = [Row(vec_id=i, label="x" if i % 2 else "y",
                 embedding=[rnd.gauss(0, 1), rnd.gauss(0, 1)]) for i in range(40)]
    ms = silhouette_simplified(spark.createDataFrame(mixed)).collect()
    assert all(r.mean_silhouette < 0.5 for r in ms)


def test_silhouette_without_vec_id_column(spark):
    """ADVICE r9: the vec_id fallback minted monotonically_increasing_id
    in the SAME select as posexplode; ExtractGenerator hoists it above
    Generate, so every (point, dimension) row got a distinct id —
    n_points doubled and scores were computed per-dimension. The id must
    be assigned in its own projection BEFORE the explode."""
    from clinical_data_lake_spark.llm.similarity import silhouette_simplified

    rows = []
    for i, (lbl, center) in enumerate(
        [("x", [5.0, 0.0])] * 10 + [("y", [0.0, 5.0])] * 10
    ):
        rows.append(Row(label=lbl, embedding=[c + 0.01 * i for c in center]))
    out = {r.label: r for r in
           silhouette_simplified(spark.createDataFrame(rows)).collect()}
    # 10 POINTS per label — not 20 (point, dimension) rows
    assert out["x"].n_points == 10 and out["y"].n_points == 10
    # and the well-separated clusters still score high
    assert out["x"].mean_silhouette > 0.9 and out["y"].mean_silhouette > 0.9


def test_winnowing_guarantee_and_density(spark):
    """Schleimer et al. guarantees: (1) any shared run of at least
    n + window - 1 words yields a shared fingerprint; (2) selection is
    position-robust (a distinct prefix shifts positions but shared
    content still fingerprints); (3) density is bounded by the number
    of full windows."""
    from clinical_data_lake_spark.llm.dedup import (
        winnow_dup_pairs,
        winnow_fingerprints,
    )

    shared = "alpha beta gamma delta epsilon zeta"  # 6 words >= 3+4-1
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="one two three four five " + shared + " tail1 x y"),
            Row(doc_id=2, text=shared + " completely different ending here now"),
            Row(doc_id=3, text="nothing in common with anything else at all ok"),
        ]
    )
    fps = winnow_fingerprints(docs, n=3, window=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "shared 6-word run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])
    # density: fingerprints <= full windows; and > 0
    for d, n_words in ((1, 14), (2, 11), (3, 9)):
        n_grams = n_words - 2
        n_windows = n_grams - 3
        assert 0 < len(by_doc[d]) <= n_windows
    pairs = winnow_dup_pairs(docs, n=3, window=4, min_shared=1).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(1, 2)}


def test_winnowing_rightmost_min_tiebreak(spark):
    """A doc that is one repeated gram everywhere: every window's min
    ties, the rightmost must win — fingerprint positions are the LAST
    position of each window, and all fps are the single gram hash."""
    from clinical_data_lake_spark.llm.dedup import winnow_fingerprints

    docs = spark.createDataFrame([Row(doc_id=1, text="a a a a a a a a a a")])
    rows = winnow_fingerprints(docs, n=3, window=4).collect()
    # 10 words -> 8 grams (pos 0..7) -> full windows j=0..4, rightmost
    # min of window [j, j+3] is pos j+3 -> positions {3,4,5,6,7}
    assert sorted(r.pos for r in rows) == [3, 4, 5, 6, 7]
    assert len({r.fp for r in rows}) == 1


def _py_bpe(texts, n_merges):
    import collections
    import re as _re

    freqs = collections.Counter()
    for t in texts:
        for w in _re.sub(r"\s+", " ", t.strip().lower()).split(" "):
            if w:
                freqs[w] += 1
    state = {w: [*w, "</w>"] for w in freqs}
    merges = []
    for rank in range(n_merges):
        pc = collections.Counter()
        for w, syms in state.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += freqs[w]
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if cnt < 2:
            break
        merges.append((rank, a, b, cnt))
        for w, syms in state.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            state[w] = out
    return merges


def test_bpe_train_matches_reference(spark):
    from clinical_data_lake_spark.llm.corpus import bpe_train

    texts = [
        "low low low low low",
        "lower lower newer",
        "newest newest newest widest widest",
        "new new newer wider",
    ]
    docs = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    got = bpe_train(docs, n_merges=12)
    want = _py_bpe(texts, 12)
    assert got == want, (got, want)
    assert len(got) >= 8  # the corpus genuinely supports many merges
    # classic BPE behavior: an early merge builds a frequent suffix
    merged_syms = {l + r for _, l, r, _ in got}
    assert any(s in merged_syms for s in ("es", "est", "ne", "new"))


def test_bpe_pair_counts_closed_form(spark):
    from clinical_data_lake_spark.llm.corpus import (
        bpe_pair_counts,
        word_symbol_table,
    )

    docs = spark.createDataFrame([Row(doc_id=1, text="ab ab b")])
    got = {(r.left, r.right): r.cnt for r in
           bpe_pair_counts(word_symbol_table(docs)).collect()}
    # "ab" freq 2 -> (a,b):2, (b,</w>):2 ; "b" freq 1 -> (b,</w>):1
    assert got == {("a", "b"): 2, ("b", "</w>"): 3}


def test_hard_negatives_cross_label_only(spark):
    from clinical_data_lake_spark.llm.similarity import hard_negatives

    rows = [
        Row(vec_id=1, label="a", embedding=[1.0, 0.0]),
        Row(vec_id=2, label="a", embedding=[0.99, 0.1]),   # same-label near
        Row(vec_id=3, label="b", embedding=[0.95, 0.3]),   # cross-label near
        Row(vec_id=4, label="b", embedding=[-1.0, 0.0]),   # cross-label far
        Row(vec_id=5, label=None, embedding=[1.0, 0.01]),  # unlabeled: excluded
    ]
    emb = spark.createDataFrame(rows)
    anchors = emb.filter(F.col("vec_id") == 1)
    got = hard_negatives(anchors, emb, k=2).collect()
    assert [(r.negative_id, r.rnk) for r in sorted(got, key=lambda r: r.rnk)] == [
        (3, 1), (4, 2)
    ]
    # same-label vec 2 never consumed a rank slot despite being nearest
    assert all(r.negative_id != 2 for r in got)
