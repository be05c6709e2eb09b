"""R2 — scoped cache semantics."""

from __future__ import annotations

from clinical_data_lake_spark.operators.caching import cache_if, scoped_cache


def test_scoped_cache_persists_and_releases(spark):
    df = spark.range(100)
    assert not df.storageLevel.useMemory
    with scoped_cache(df) as (cached,):
        assert cached.storageLevel.useMemory
        assert cached.count() == 100
    assert not df.storageLevel.useMemory  # released on exit


def test_scoped_cache_releases_on_error(spark):
    df = spark.range(10)
    try:
        with scoped_cache(df):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert not df.storageLevel.useMemory


def test_recommended_cluster_conf_scales_with_cores():
    from clinical_data_lake_spark.session import recommended_cluster_conf

    conf = recommended_cluster_conf(total_cores=4000, executor_mem_gb=64)
    assert conf["spark.sql.shuffle.partitions"] == "12000"
    assert conf["spark.executor.memory"] == "64g"
    assert conf["spark.sql.adaptive.enabled"] == "true"
    assert int(conf["spark.sql.files.maxPartitionBytes"]) == 128 * 1024 * 1024
    # fixed JIT compiler pool on long-lived cluster JVMs (r11 finding)
    assert (
        conf["spark.executor.extraJavaOptions"]
        == conf["spark.driver.extraJavaOptions"]
        == "-XX:-UseDynamicNumberOfCompilerThreads"
    )
    # reliable per-iteration checkpoints must not accumulate on DFS
    # for the application lifetime (r11 advice)
    assert conf["spark.cleaner.referenceTracking.cleanCheckpoints"] == "true"


def test_cache_if_thresholds(spark):
    once = cache_if(spark.range(5), reuse_count=1)
    assert not once.storageLevel.useMemory
    twice = cache_if(spark.range(5), reuse_count=2)
    assert twice.storageLevel.useMemory
    twice.unpersist()


def test_release_persisted_reclaims_operator_caches(spark):
    """Library operators persist reused intermediates (load-bearing for
    performance); release_persisted() must return the session to its
    prior cache state — no net-new persisted RDDs after a sweep of every
    cache-using operator (VERDICT r3 item 4)."""
    from clinical_data_lake_spark.functions.text import tfidf_terms
    from clinical_data_lake_spark.llm.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_pairs,
    )
    from clinical_data_lake_spark.llm.similarity import cosine_dup_pairs_lsh
    from clinical_data_lake_spark.operators.caching import release_persisted
    from clinical_data_lake_spark.operators.cohort import case_control_cohort

    release_persisted()  # start from a known-clean registry
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon doc {i % 7} body") for i in range(60)],
        schema="doc_id long, text string",
    )
    ngram_jaccard_pairs(docs, n=3, threshold=0.5).count()
    minhash_lsh_pairs(docs, num_hashes=16, bands=4).count()
    simhash_pairs(docs, max_hamming=3).count()
    tfidf_terms(docs).count()
    vecs = spark.createDataFrame(
        [(i, [float((i * j) % 5 + 1) for j in range(8)]) for i in range(40)],
        schema="vec_id long, emb array<double>",
    )
    cosine_dup_pairs_lsh(
        vecs, dim=8, threshold=0.99, tables=4, bits=4, vec_col="emb"
    ).count()
    ents = spark.range(200).selectExpr("id AS pid", "id % 3 AS g")
    events = spark.range(20).selectExpr("id AS pid", "'index' AS lbl")
    case_control_cohort(ents, "pid", events, "pid", "lbl", "index").count()

    n = release_persisted()
    assert n >= 6, n  # every operator registered its cache
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    assert after <= before, f"leaked persisted RDDs: {after - before}"
    assert release_persisted() == 0  # idempotent
