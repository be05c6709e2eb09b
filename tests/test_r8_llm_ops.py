"""Units for the r8 LLM-pipeline operators: Gopher rule gate and DSIR
importance weights."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clinical_data_lake_spark.functions.text import gopher_quality
from clinical_data_lake_spark.llm.corpus import dsir_weights


def test_gopher_rules_fire_individually(spark):
    good = (
        "the quick brown fox jumps over and over with great energy "
        "that everyone ought to have seen before deciding anything "
        "about canine athletic prowess in general everyday settings"
    )
    docs = spark.createDataFrame(
        [
            (1, good),
            (2, "too short"),  # word count
            (3, "## ## ## " * 30 + good),  # symbol ratio
            (4, "\n".join("- bullet item here" for _ in range(20))),  # bullets
            (5, "\n".join("trailing line..." for _ in range(20))),  # ellipses
            (6, " ".join("1234 5678" for _ in range(20))),  # alpha frac + stopwords
        ],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in
           gopher_quality(docs, min_words=10, min_stop_hits=1).collect()}
    assert out[1].pass_gopher is True
    assert out[2].pass_gopher is False and out[2].n_words < 10
    assert out[3].pass_gopher is False and out[3].symbol_ratio > 0.1
    assert out[4].pass_gopher is False and out[4].bullet_frac == 1.0
    assert out[5].pass_gopher is False and out[5].ellipsis_frac == 1.0
    assert out[6].pass_gopher is False
    assert out[6].alpha_word_frac == 0.0 and out[6].n_stop_hits == 0
    assert out[1].n_stop_hits >= 3  # the, and, with, that, to, have


def test_dsir_weights_prefer_target_like_docs(spark):
    # target dialect uses words {alpha beta gamma}; off-target uses
    # {uno dos tres}: target-like docs must score strictly higher
    rows = []
    for i in range(20):
        rows.append((i, "alpha beta gamma alpha beta " * 4, "t"))
    for i in range(20, 40):
        rows.append((i, "uno dos tres uno dos " * 4, "o"))
    docs = spark.createDataFrame(rows, "doc_id int, text string, grp string")
    target = docs.filter(F.col("grp") == "t")
    out = {r.doc_id: r.dsir_logweight for r in dsir_weights(docs, target).collect()}
    t_scores = [out[i] for i in range(20)]
    o_scores = [out[i] for i in range(20, 40)]
    assert min(t_scores) > max(o_scores)
    assert len(out) == 40  # every corpus doc scored, including off-target


def test_dsir_weights_partition_invariant(spark):
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("w"),
            (F.col("id") % 17).cast("string"),
            (F.col("id") % 5).cast("string"),
            F.lit("common words here"),
        ).alias("text"),
        (F.col("id") % 3 == 0).alias("is_t"),
    )
    target = docs.filter("is_t")
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        seen = set()
        for p in ("1", "7", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", p)
            rows = tuple(sorted(tuple(r) for r in dsir_weights(docs, target).collect()))
            seen.add(rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert len(seen) == 1
