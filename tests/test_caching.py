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


def test_cache_if_thresholds(spark):
    once = cache_if(spark.range(5), reuse_count=1)
    assert not once.storageLevel.useMemory
    twice = cache_if(spark.range(5), reuse_count=2)
    assert twice.storageLevel.useMemory
    twice.unpersist()
