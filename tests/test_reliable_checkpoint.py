"""Reliable-checkpoint option for iterative operators (r10 verdict #1).

The iterative loops (BFS frontiers, LPA labels, PageRank ranks, CC
labels, BPE symbol tables) default to eager ``localCheckpoint`` — the
fast local choice, but its blocks live on executor local storage and
are NOT recomputable: one lost executor mid-iteration fails a 100 TB
job. ``checkpoint_dir=<DFS path>`` swaps every per-iteration
truncation for a RELIABLE ``.checkpoint()`` via
``caching.iter_checkpoint``. These tests pin:

1. result parity — reliable mode returns exactly the local-mode rows;
2. materialization — checkpoint RDD files actually land under the
   given directory (the durability mechanism, and the proof the
   parameter is wired through per iteration, not ignored), and local
   mode writes nothing there.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from clinical_data_lake_spark.llm.corpus import bpe_train
from clinical_data_lake_spark.llm.dedup import dup_clusters
from clinical_data_lake_spark.operators.caching import (
    iter_checkpoint,
    release_persisted,
)
from clinical_data_lake_spark.operators.graph import (
    khop_neighbors,
    label_propagation,
    pagerank,
)


def _tree_files(root: str) -> list[str]:
    out = []
    for dirpath, _dirs, files in os.walk(root):
        out.extend(os.path.join(dirpath, f) for f in files)
    return out


@pytest.fixture()
def edges(spark):
    # two components: a 5-chain and a triangle, plus an isolated pair
    rows = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (12, 10), (20, 21)]
    return spark.createDataFrame(rows, "src int, dst int")


def test_iter_checkpoint_materializes_reliably(spark, tmp_path, edges):
    ck = str(tmp_path / "ck")
    df = iter_checkpoint(edges.distinct(), ck)
    assert df.count() == 8
    # reliable checkpoints write RDD part files under the dir (df.rdd
    # would wrap a NEW javaToPython RDD, so file presence — not the
    # wrapper's isCheckpointed flag — is the real evidence)
    before = [p for p in _tree_files(ck) if "rdd-" in p]
    assert before
    # local mode adds nothing to the directory
    df2 = iter_checkpoint(edges.distinct(), None)
    assert df2.count() == 8
    assert [p for p in _tree_files(ck) if "rdd-" in p] == before


@pytest.mark.parametrize(
    "op",
    [
        lambda e, ck: khop_neighbors(
            e, e.sparkSession.createDataFrame([(1,)], "node int"), k=3,
            checkpoint_dir=ck,
        ),
        lambda e, ck: label_propagation(e, k=3, checkpoint_dir=ck),
        lambda e, ck: pagerank(
            e, iterations=3, checkpoint_dir=ck
        ).select("node", F.round("rank", 9).alias("rank")),
        lambda e, ck: dup_clusters(
            e.select(F.col("src").alias("doc_a"), F.col("dst").alias("doc_b")),
            checkpoint_dir=ck,
        ),
    ],
    ids=["khop", "lpa", "pagerank", "cc"],
)
def test_reliable_equals_local(spark, tmp_path, edges, op):
    ck = str(tmp_path / "ck")
    want = sorted(map(tuple, op(edges, None).collect()))
    release_persisted()
    got = sorted(map(tuple, op(edges, ck).collect()))
    release_persisted()
    assert got == want and len(got) > 0
    # per-iteration reliable checkpoints landed on "DFS"
    rdds = [p for p in _tree_files(ck) if "rdd-" in p]
    assert len(rdds) > 0


def test_checkpoint_dir_set_once_per_path(spark, tmp_path, edges):
    """Spark mints a fresh UUID subdirectory on EVERY setCheckpointDir
    call — per-iteration re-setting would mkdir a new dir per round
    (one DFS RPC each) and re-point the session-global checkpoint dir.
    iter_checkpoint must set it once per requested path (r11 advice)."""
    ck = str(tmp_path / "ck")
    sc = spark.sparkContext
    assert iter_checkpoint(edges.distinct(), ck).count() == 8
    resolved = sc.getCheckpointDir()
    assert resolved is not None
    # second call with the SAME requested path: no new UUID subdir,
    # session checkpoint dir untouched
    assert iter_checkpoint(edges.limit(3), ck).count() == 3
    assert sc.getCheckpointDir() == resolved
    assert len(os.listdir(ck)) == 1
    # a DIFFERENT requested path re-points (the operator contract)
    ck2 = str(tmp_path / "ck2")
    assert iter_checkpoint(edges.limit(2), ck2).count() == 2
    assert sc.getCheckpointDir() != resolved


def test_bpe_train_reliable_equals_local(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "low lower lowest"), (2, "new newer newest"), (3, "low new low")],
        "doc_id int, text string",
    )
    ck = str(tmp_path / "ck")
    want = bpe_train(docs, n_merges=4)
    got = bpe_train(docs, n_merges=4, checkpoint_dir=ck)
    assert got == want and len(got) == 4
    assert any("rdd-" in p for p in _tree_files(ck))
