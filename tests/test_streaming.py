"""Streaming wrappers (SURVEY.md §2.12): the same plan builders run as
Structured Streaming with watermarks must produce the batch-expressed,
oracle-checked results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clinical_data_lake_spark.io import read_table
from clinical_data_lake_spark.streaming import events as se

from conftest import SF_SMALL


@pytest.fixture(scope="module")
def events_stream_setup(spark, tmp_path_factory):
    """Replay sf0.001 events as a file-source stream (several files so
    multiple micro-batches exercise incremental state)."""
    root = str(tmp_path_factory.mktemp("stream_src"))
    ev = read_table(spark, SF_SMALL, "events")
    ev.repartition(4).write.mode("overwrite").parquet(root)
    schema = ev.schema
    return ev, root, schema


def _sorted_rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_streaming_tumble_equals_batch(spark, events_stream_setup):
    ev, root, schema = events_stream_setup
    batch = se.tumbling_counts(ev)
    stream = se.tumbling_counts(
        se.stream_from_batch_dir(spark, root, schema),
        watermark="1 hour",
    )
    q = se.run_to_memory_sink(stream, "tumble_test")
    got = spark.table("tumble_test")
    cols = ["window_start", "event_type", "cnt"]
    assert _sorted_rows(got, cols) == _sorted_rows(batch, cols)
    assert q.lastProgress is not None


def test_streaming_slide_equals_batch(spark, events_stream_setup):
    ev, root, schema = events_stream_setup
    batch = se.sliding_agg(ev)
    stream = se.sliding_agg(
        se.stream_from_batch_dir(spark, root, schema),
        watermark="1 hour",
    )
    se.run_to_memory_sink(stream, "slide_test")
    got = spark.table("slide_test")
    cols = ["window_start", "cnt", "sum_value"]
    assert _sorted_rows(got, cols) == _sorted_rows(batch, cols)


def test_streaming_attribution_join_equals_batch(spark, events_stream_setup, tmp_path):
    """Stream-stream interval join: both sides are live streams (state
    buffered per key, bounded by watermark + horizon); result set must
    equal the batch interval join the driver oracle certifies. Inner
    time-interval joins emit in append mode as soon as both rows have
    arrived."""
    ev, _, schema = events_stream_setup
    # a time-ordered source: the file source consumes files in
    # MODIFICATION-TIME order, so the four ascending time slices are
    # written sequentially (a single range-partitioned write gives all
    # files the same mtime and a late-range file consumed first makes
    # every earlier file "late": its views join inner within their own
    # batch but never enter state, so cross-batch pairs are lost —
    # the one-row-short flake). Real streams arrive roughly in
    # event-time order, which is the regime stream-stream joins are
    # specified for.
    root = str(tmp_path / "attrib_src")
    import time as _time

    from pyspark.sql import Window as W

    sliced = ev.withColumn("__q__", F.ntile(4).over(W.orderBy("ts")))
    for i in range(1, 5):
        (sliced.filter(F.col("__q__") == i).drop("__q__")
         .coalesce(1).write.mode("append").parquet(root))
        _time.sleep(1.1)

    def split(df):
        views = df.filter(F.col("event_type") == "view").select(
            "user_id", F.col("event_id").alias("view_id"), "ts"
        )
        clicks = df.filter(F.col("event_type") == "click").select(
            "user_id", F.col("event_id").alias("click_id"), "ts"
        )
        return views, clicks

    bv, bc = split(ev)
    batch = se.attribution_join(bv, bc)
    sv, _ = split(se.stream_from_batch_dir(spark, root, schema))
    _, sc2 = split(se.stream_from_batch_dir(spark, root, schema))
    stream = se.attribution_join(sv, sc2, watermark="2 hours")
    se.run_to_memory_sink(stream, "attrib_test", output_mode="append")
    got = spark.table("attrib_test")
    cols = ["user_id", "view_id", "click_id", "lag_s"]
    assert _sorted_rows(got, cols) == _sorted_rows(batch, cols)
    assert batch.count() > 0  # the fixture data actually attributes


def test_streaming_sessionize_equals_batch(spark, events_stream_setup):
    ev, root, schema = events_stream_setup
    batch = se.sessionize(ev, gap="30 minutes")
    # replay files aren't time-ordered, so anything tighter than the
    # data span would drop "late" rows: session windows enforce the
    # watermark per micro-batch. 60 days > the 30-day event range.
    stream = se.sessionize(
        se.stream_from_batch_dir(spark, root, schema),
        gap="30 minutes", watermark="60 days",
    )
    assert stream.isStreaming
    se.run_to_memory_sink(stream, "sess_test")
    got = spark.table("sess_test")
    cols = ["user_id", "session_start", "session_end", "n_events"]
    assert _sorted_rows(got, cols) == _sorted_rows(batch, cols)


def test_stateful_running_counts_converge_to_batch(spark, events_stream_setup):
    """applyInPandasWithState: state accumulates across micro-batches
    (4 files -> multiple batches); the last update per key must equal
    the batch group-count."""
    ev, root, schema = events_stream_setup
    stream = se.running_user_counts(se.stream_from_batch_dir(spark, root, schema))
    se.run_to_memory_sink(stream, "running_test", output_mode="update")
    got = (
        spark.table("running_test")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))  # last update = max (monotone)
    )
    want = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    cols = ["user_id", "n_events"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)
    # multiple batches actually exercised incremental state
    n_updates = spark.table("running_test").count()
    n_keys = want.count()
    assert n_updates >= n_keys


def test_watermark_bounds_state(spark, events_stream_setup):
    """The watermark must actually be attached (state eviction at scale
    depends on it) — check the analyzed plan carries the event-time
    watermark node."""
    _, root, schema = events_stream_setup
    stream = se.tumbling_counts(
        se.stream_from_batch_dir(spark, root, schema), watermark="1 hour"
    )
    assert "EventTimeWatermark" in stream._jdf.queryExecution().analyzed().toString()


def test_streaming_dedup_within_watermark_equals_batch(spark, events_stream_setup):
    """Replaying the same files TWICE through the stream must still
    yield exactly one row per event_id (dedup state alive within the
    watermark horizon); result set equals batch dropDuplicates."""
    ev, root, schema = events_stream_setup
    import shutil
    import tempfile

    dup_root = tempfile.mkdtemp(prefix="stream_dup_")
    shutil.copytree(root, dup_root, dirs_exist_ok=True)
    # second copy of every file = an at-least-once source replay
    for i, f in enumerate(list(__import__("os").listdir(dup_root))):
        if f.endswith(".parquet"):
            shutil.copy(f"{dup_root}/{f}", f"{dup_root}/replay_{i}.parquet")

    # Watermark wider than the dataset's full time span: replayed files
    # arrive out of event-time order, and a tight horizon would drop
    # them as late instead of deduplicating them (state-bounding under a
    # tight horizon is covered by test_watermark_bounds_state).
    stream = se.dedup_within_watermark(
        se.stream_from_batch_dir(spark, dup_root, schema),
        keys=["event_id"],
        watermark="365 days",
    ).select("event_id")
    se.run_to_memory_sink(stream, "dedup_test", output_mode="append")
    got = sorted(r.event_id for r in spark.table("dedup_test").collect())
    want = sorted(r.event_id for r in ev.select("event_id").distinct().collect())
    assert got == want


def test_streaming_dedup_key_subset_equals_batch(spark, events_stream_setup):
    """The registered stream_dedup query's key set (user_id,
    event_type): the streaming survivors' KEY SET equals batch
    distinct — the oracle-checkable artifact (which physical row
    survives per key is engine-arbitrary, so only keys compare)."""
    ev, root, schema = events_stream_setup
    stream = se.dedup_within_watermark(
        se.stream_from_batch_dir(spark, root, schema),
        keys=["user_id", "event_type"],
        watermark="365 days",
    ).select("user_id", "event_type")
    se.run_to_memory_sink(stream, "dedup_keys_test", output_mode="append")
    got = sorted(
        (r.user_id, r.event_type)
        for r in spark.table("dedup_keys_test").collect()
    )
    want = sorted(
        (r.user_id, r.event_type)
        for r in ev.select("user_id", "event_type").distinct().collect()
    )
    assert got == want


def test_stream_static_enrichment_equals_batch(spark, events_stream_setup):
    """Stream-static join: events enriched against a static dim table
    must match the same join run in batch, with the dim broadcast."""
    ev, root, schema = events_stream_setup
    dim = (
        ev.select("user_id").distinct()
        .withColumn("segment", F.concat(F.lit("seg_"), (F.col("user_id") % 3).cast("string")))
    )
    batch = se.enrich_stream(ev, dim, ["user_id"]).groupBy("segment").count()

    stream = se.stream_from_batch_dir(spark, root, schema)
    enriched = se.enrich_stream(stream, dim, ["user_id"]).groupBy("segment").count()
    se.run_to_memory_sink(enriched, "enrich_sink", output_mode="complete")
    got = _sorted_rows(spark.table("enrich_sink"), ["segment", "count"])
    want = _sorted_rows(batch, ["segment", "count"])
    assert got == want


def test_stream_to_parquet_incremental_exactly_once(spark, events_stream_setup, tmp_path):
    """availableNow parquet sink: draining the source twice without new
    files must add NOTHING (checkpoint offsets make re-runs no-ops),
    and the drained content must equal the batch projection."""
    ev, root, schema = events_stream_setup
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    proj = se.stream_from_batch_dir(spark, root, schema).select(
        "event_id", "user_id", "event_type"
    )
    se.stream_to_parquet(proj, out, ckpt)
    first = spark.read.parquet(out)
    want = ev.select("event_id", "user_id", "event_type")
    assert sorted(r.event_id for r in first.collect()) == sorted(
        r.event_id for r in want.collect()
    )
    # re-run with the same checkpoint: no new source files -> no new rows
    proj2 = se.stream_from_batch_dir(spark, root, schema).select(
        "event_id", "user_id", "event_type"
    )
    se.stream_to_parquet(proj2, out, ckpt)
    assert spark.read.parquet(out).count() == first.count()


def test_stream_to_parquet_recovers_after_midrun_kill(spark, tmp_path):
    """Failure-path recovery (not just replay): a checkpointed
    stream_to_parquet run is KILLED mid-run — stopped after some but
    not all micro-batches committed — and a fresh start on the same
    checkpoint must converge to exactly the batch twin: every source
    row exactly once, no duplicates from the partially-progressed run,
    no losses from the interruption. This pins the property a
    1000-executor ingestion loop actually relies on: executor/driver
    death between micro-batches costs nothing but a restart."""
    import os
    import time

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def slice_df(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("event_id"),
            (F.col("id") % 7).alias("user_id"),
            F.concat(F.lit("t"), (F.col("id") % 3).cast("string")).alias("event_type"),
        )

    # slice A: drained cleanly by run 1
    slice_df(0, 200).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    proj = se.stream_from_batch_dir(spark, src, schema, max_files_per_trigger=1)
    se.stream_to_parquet(proj, out, ckpt)
    commits_dir = os.path.join(ckpt, "commits")
    committed_before = len(
        [f for f in os.listdir(commits_dir) if not f.startswith(".")]
    )

    # slice B: many single-row-group files so run 2 has several
    # micro-batches to be interrupted between
    for lo in range(200, 800, 100):
        slice_df(lo, lo + 100).coalesce(1).write.mode("append").parquet(src)

    # run 2: kill after at least one NEW commit lands but (with 6
    # pending files at 1 file/trigger) before the drain finishes
    proj2 = se.stream_from_batch_dir(spark, src, schema, max_files_per_trigger=1)
    q = (
        proj2.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        done = len([f for f in os.listdir(commits_dir) if not f.startswith(".")])
        if done > committed_before:
            break
        time.sleep(0.05)
    q.stop()  # mid-run kill: some of slice B committed, the rest not
    q.awaitTermination(60)

    # run 3: fresh query object, same checkpoint — recovery must pick
    # up precisely the uncommitted remainder
    proj3 = se.stream_from_batch_dir(spark, src, schema, max_files_per_trigger=1)
    se.stream_to_parquet(proj3, out, ckpt)

    got = sorted(r.event_id for r in spark.read.parquet(out).collect())
    want = list(range(800))
    assert got == want, (
        f"exactly-once violated after mid-run kill: {len(got)} rows, "
        f"first diffs {[x for x in got if got.count(x) > 1][:5] or 'losses'}"
    )


def test_transform_with_state_totals_converge_to_batch(spark, events_stream_setup):
    """transformWithStateInPandas (typed ValueState, RocksDB store):
    the last update per key must equal the batch count/sum."""
    ev, root, schema = events_stream_setup
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = se.running_user_totals_tws(
            se.stream_from_batch_dir(spark, root, schema)
        )
        se.run_to_memory_sink(stream, "tws_test", output_mode="update")
    except Exception as ex:  # pragma: no cover - env-dependent store
        pytest.skip(f"RocksDB state store unavailable: {ex}")
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    w = spark.table("tws_test")
    got = {
        r.user_id: (r.n_events, round(r.sum_value, 6))
        for r in w.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("sum_value").alias("sum_value"))
        .collect()
    }
    want = {
        r.user_id: (r.n_events, round(r.sum_value, 6))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .collect()
    }
    assert got == want


def test_streaming_attribution_left_outer_equals_batch(spark, events_stream_setup, tmp_path):
    """LEFT OUTER stream-stream interval join: inner matches equal the
    batch join exactly, and outer (NULL-click) rows equal the batch
    outer rows once flush events push the watermark past every view's
    horizon.

    Two determinism requirements the inner-join test doesn't have:
    (1) the file source orders files by MODIFICATION TIME, so the four
    time-range slices are written sequentially (distinct mtimes) — a
    late-range file consumed first freezes the watermark at the end and
    the earlier files' views never enter state (their inner matches
    still emit, their null rows never do); (2) the query watermark is
    the MIN across both sides, so each flush carries a far-future view
    AND click."""
    ev, _, schema = events_stream_setup
    root = str(tmp_path / "attrib_left_src")
    import time as _time

    from pyspark.sql import Window as W

    sliced = ev.withColumn(
        "__q__", F.ntile(4).over(W.orderBy("ts"))
    )
    for i in range(1, 5):
        (sliced.filter(F.col("__q__") == i).drop("__q__")
         .coalesce(1).write.mode("append").parquet(root))
        _time.sleep(1.1)

    def split(df):
        views = df.filter(F.col("event_type") == "view").select(
            "user_id", F.col("event_id").alias("view_id"), "ts"
        )
        clicks = df.filter(F.col("event_type") == "click").select(
            "user_id", F.col("event_id").alias("click_id"), "ts"
        )
        return views, clicks

    bv, bc = split(ev)
    batch = se.attribution_join(bv, bc, how="left_outer")
    sv, _ = split(se.stream_from_batch_dir(spark, root, schema))
    _, sc2 = split(se.stream_from_batch_dir(spark, root, schema))
    stream = se.attribution_join(sv, sc2, watermark="2 hours", how="left_outer")
    q = (
        stream.writeStream.format("memory")
        .queryName("attrib_left_test")
        .outputMode("append")
        .start()
    )
    flush_ids = [10**9, 10**9 + 1, 10**9 + 2, 10**9 + 3]
    try:
        q.processAllAvailable()
        # flush batches: a far-future view AND click advance BOTH
        # sides' watermarks; the second flush provides the batch in
        # which cleanup emits the trailing null rows
        for i in (0, 1):
            base = ev.limit(1)
            flush = base.select(
                F.lit(flush_ids[2 * i]).alias("event_id"),
                (F.col("ts") + F.expr(f"INTERVAL {60 + 30 * i} DAYS")).alias("ts"),
                F.col("user_id"), F.lit("view").alias("event_type"),
                F.col("value"), F.col("props"),
            ).unionByName(base.select(
                F.lit(flush_ids[2 * i + 1]).alias("event_id"),
                (F.col("ts") + F.expr(f"INTERVAL {60 + 30 * i} DAYS")).alias("ts"),
                F.col("user_id"), F.lit("click").alias("event_type"),
                F.col("value"), F.col("props"),
            ))
            _time.sleep(1.1)
            flush.coalesce(1).write.mode("append").parquet(root)
            q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table("attrib_left_test").filter(
        ~F.col("view_id").isin(flush_ids)
        & (F.col("click_id").isNull() | ~F.col("click_id").isin(flush_ids))
    )

    cols = ["user_id", "view_id", "click_id", "lag_s"]
    assert _sorted_rows(got.filter(F.col("click_id").isNotNull()), cols) == \
        _sorted_rows(batch.filter(F.col("click_id").isNotNull()), cols)
    # outer rows: exact equality once the flushes closed every horizon
    assert _sorted_rows(got.filter(F.col("click_id").isNull()), cols) == \
        _sorted_rows(batch.filter(F.col("click_id").isNull()), cols)
    assert batch.filter(F.col("click_id").isNull()).count() > 0


def test_streaming_trending_topk_equals_batch(spark, events_stream_setup):
    """Trending top-k: the incremental query maintains the windowed
    counts; the rank stage (not expressible inside a streaming agg)
    applies to the sink table per refresh — and must reproduce the
    batch trending_topk exactly."""
    ev, root, schema = events_stream_setup
    batch = se.trending_topk(ev)
    stream_counts = se.tumbling_counts(
        se.stream_from_batch_dir(spark, root, schema),
        watermark="1 hour",
    )
    se.run_to_memory_sink(stream_counts, "trend_counts")
    got = se.rank_trending(spark.table("trend_counts"))
    cols = ["window_start", "event_type", "cnt", "rnk"]
    assert _sorted_rows(got, cols) == _sorted_rows(batch, cols)


def test_streaming_trending_topk_drops_late_data_like_batch(spark, events_stream_setup, tmp_path):
    """Late-drop parity: an event arriving AFTER the watermark has
    passed its window must be dropped by the streaming aggregation, so
    the emitted top-k equals the batch top-k computed WITHOUT that
    event — and would differ if the late event had been counted.

    Determinism: files are written sequentially (distinct mtimes, the
    file source consumes in modification-time order) so the watermark
    provably advances past the late event's window before it arrives:
    batch 1 = on-time events, batch 2 = a far-future flush event
    (watermark -> +30 days), batch 3 = the late event (dropped).
    Append mode: windows emit once finalized, the flush's own window
    stays in state and never emits."""
    import time as _time

    ev, _, schema = events_stream_setup
    root = str(tmp_path / "late_src")

    on_time = ev.orderBy("ts").limit(200)
    base_row = ev.orderBy("ts").limit(1)
    flush = base_row.select(
        F.lit(10**9).alias("event_id"),
        (F.col("ts") + F.expr("INTERVAL 30 DAYS")).alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    late = base_row.select(
        F.lit(10**9 + 1).alias("event_id"),
        "ts", "user_id", "event_type", "value", "props",
    )
    for piece in (on_time, flush, late):
        piece.coalesce(1).write.mode("append").parquet(root)
        _time.sleep(1.1)

    stream_counts = se.tumbling_counts(
        se.stream_from_batch_dir(spark, root, schema), watermark="1 hour"
    )
    se.run_to_memory_sink(stream_counts, "trend_late", output_mode="append")
    got = se.rank_trending(spark.table("trend_late"))

    cols = ["window_start", "event_type", "cnt", "rnk"]
    want = se.trending_topk(on_time)
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)
    # the test bites: had the late event been counted, the counts table
    # would differ in its window
    with_late = se.trending_topk(on_time.unionByName(late))
    assert _sorted_rows(with_late, cols) != _sorted_rows(want, cols)


def test_streaming_session_stats_equals_batch(spark, events_stream_setup):
    """session_stats rides the same stateful session aggregation as
    sessionize — the streaming run must reproduce the batch stats
    (dwell, bounce, decimal sums) exactly."""
    ev, root, schema = events_stream_setup
    batch = se.session_stats(ev)
    # replay files aren't time-ordered: use a watermark wider than the
    # data span (the sessionize parity test's lesson) so no replayed
    # row is dropped as late
    stream = se.session_stats(
        se.stream_from_batch_dir(spark, root, schema), watermark="60 days"
    )
    se.run_to_memory_sink(stream, "sess_stats_test")
    got = spark.table("sess_stats_test")
    cols = ["user_id", "session_start", "n_events", "duration_s",
            "is_bounce", "sum_value"]
    assert _sorted_rows(got, cols) == _sorted_rows(batch, cols)


def test_windowed_distinct_users_stream_equals_batch(spark, events_stream_setup):
    """Two chained stateful aggregates (window-user dedup -> window
    count) must produce the same distinct-user counts incrementally as
    in batch."""
    ev, root, schema = events_stream_setup
    batch = se.windowed_distinct_users(ev)
    # replay files aren't event-time-ordered: a tight horizon would
    # drop "late" rows at the dedup (same rationale as the sessionize
    # parity test); 60 days > the event range
    stream = se.windowed_distinct_users(
        se.stream_from_batch_dir(spark, root, schema), watermark="60 days"
    )
    se.run_to_memory_sink(stream, "wdu_sink", output_mode="complete")
    cols = ["window_start", "distinct_users"]
    assert _sorted_rows(spark.table("wdu_sink"), cols) == _sorted_rows(batch, cols)


def test_stream_upsert_parquet_merges_like_batch(spark, tmp_path):
    """foreachBatch CDC upsert loop: streamed change batches merged
    into the parquet state must equal one batch apply_changes over the
    full feed; re-running with no new files is a no-op; a re-applied
    batch (crash between state swap and checkpoint commit) would also
    be a no-op because apply_changes is last-writer-wins by seq."""
    from clinical_data_lake_spark.operators.cdc import apply_changes

    src = str(tmp_path / "changes")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    schema = "k long, v string, seq long, op string"

    slices = [
        [(1, "a1", 1, "U"), (2, "b1", 2, "U"), (3, "c1", 3, "U")],
        [(1, "a2", 4, "U"), (2, None, 5, "D")],
        [(2, "b3", 6, "U"), (4, "d1", 7, "U"), (3, None, 8, "D")],
    ]
    import time as _time

    for sl in slices:
        spark.createDataFrame(sl, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _time.sleep(1.1)  # distinct mtimes -> deterministic file order

    changes_stream = se.stream_from_batch_dir(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    se.stream_upsert_parquet(
        changes_stream, state, ckpt, keys=["k"], value_cols=["v"]
    )
    got = {(r.k, r.v) for r in spark.read.parquet(state).collect()}
    all_changes = spark.createDataFrame(sum(slices, []), schema)
    empty = spark.createDataFrame([], "k long, v string")
    want = {(r.k, r.v) for r in
            apply_changes(empty, all_changes, ["k"]).collect()}
    assert got == want == {(1, "a2"), (2, "b3"), (4, "d1")}
    # idempotent re-run: no new files -> state unchanged
    changes2 = se.stream_from_batch_dir(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    se.stream_upsert_parquet(changes2, state, ckpt, keys=["k"], value_cols=["v"])
    assert {(r.k, r.v) for r in spark.read.parquet(state).collect()} == want


def test_stream_upsert_parquet_recovers_interrupted_swap(spark, tmp_path):
    """ADVICE r9: the state swap is two renames (dst→bak, staging→dst);
    a crash between them leaves no state dir. Restart must restore the
    committed snapshot from .bak — NOT treat the missing dir as
    first-run and abandon prior state (permanent data loss, since the
    checkpoint skips re-delivering already-committed batches)."""
    import os
    import shutil
    import time as _time

    src = str(tmp_path / "changes")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    schema = "k long, v string, seq long, op string"

    spark.createDataFrame(
        [(1, "a1", 1, "U"), (2, "b1", 2, "U")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    _time.sleep(1.1)
    stream1 = se.stream_from_batch_dir(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    se.stream_upsert_parquet(stream1, state, ckpt, keys=["k"], value_cols=["v"])
    assert {(r.k, r.v) for r in spark.read.parquet(state).collect()} == {
        (1, "a1"), (2, "b1")
    }

    # Simulate the crash window: dst has been renamed to .bak, the
    # staging→dst rename never happened, and a stale staging dir from
    # the interrupted write is still lying around.
    os.rename(state, state + ".bak")
    os.makedirs(state + ".staging", exist_ok=True)
    with open(state + ".staging/_incomplete", "w") as fh:
        fh.write("partial")

    # New change batch arrives; restart the loop from the checkpoint.
    spark.createDataFrame([(2, "b2", 3, "U"), (3, "c1", 4, "U")],
                          schema).coalesce(1).write.mode("append").parquet(src)
    _time.sleep(1.1)
    stream2 = se.stream_from_batch_dir(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    se.stream_upsert_parquet(stream2, state, ckpt, keys=["k"], value_cols=["v"])
    got = {(r.k, r.v) for r in spark.read.parquet(state).collect()}
    # key 1 survives ONLY if .bak was recovered; keys 2/3 carry the
    # re-delivered + new updates
    assert got == {(1, "a1"), (2, "b2"), (3, "c1")}
    assert not os.path.exists(state + ".bak")
    assert not os.path.exists(state + ".staging")

    # Corrupt state must raise loudly, not read as empty first-run.
    shutil.rmtree(state)
    os.makedirs(state)
    with open(os.path.join(state, "part-00000.parquet"), "w") as fh:
        fh.write("this is not parquet")
    spark.createDataFrame([(5, "e1", 9, "U")], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _time.sleep(1.1)
    stream3 = se.stream_from_batch_dir(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    import pytest as _pytest

    with _pytest.raises(Exception):
        se.stream_upsert_parquet(
            stream3, state, ckpt, keys=["k"], value_cols=["v"]
        )


def test_streaming_windowed_histogram_equals_batch(spark, events_stream_setup):
    """Fixed-bin window histograms: streaming counts must equal the
    batch twin, and merging the per-window bins up to per-type totals
    must equal a direct batch histogram over the same rows — the
    streaming-then-batch mergeable-summary pipeline."""
    from clinical_data_lake_spark.operators.aggregates import histogram_rollup

    ev, root, schema = events_stream_setup
    batch = se.windowed_histogram(ev)
    stream = se.windowed_histogram(
        se.stream_from_batch_dir(spark, root, schema), watermark="1 hour"
    )
    se.run_to_memory_sink(stream, "whist_test")
    got = spark.table("whist_test")
    cols = ["window_start", "event_type", "bin", "cnt"]
    assert _sorted_rows(got, cols) == _sorted_rows(batch, cols)
    # merge the streamed window histograms up to per-type and compare
    # with the direct batch histogram_rollup — bit-exact, no sketch
    merged = {
        (r.event_type, r.bin): r.total
        for r in got.groupBy("event_type", "bin")
        .agg(F.sum("cnt").cast("long").alias("total"))
        .collect()
    }
    direct = {
        (r.event_type, r.bin): r.cnt
        for r in histogram_rollup(
            ev, ["event_type"], "value", 0.0, 600.0, 120
        ).collect()
    }
    assert merged == direct


def test_streaming_volume_anomaly_equals_batch(spark, events_stream_setup):
    """Stream-scored volume anomalies against a batch-trained seasonal
    baseline must equal the same scorer run on the static frame — the
    offline-train / online-score split, with the baseline broadcast
    into the stream."""
    from clinical_data_lake_spark.operators.timeseries import (
        seasonal_baseline,
    )

    ev, root, schema = events_stream_setup
    baseline = seasonal_baseline(ev, "ts", "event_type").withColumnRenamed(
        "key", "event_type"
    )
    # low threshold so the tiny sf0.001 stream actually emits rows
    batch = se.volume_anomaly(ev, baseline, z_threshold=0.5)
    stream = se.volume_anomaly(
        se.stream_from_batch_dir(spark, root, schema),
        baseline,
        z_threshold=0.5,
        watermark="1 hour",
    )
    se.run_to_memory_sink(stream, "vanom_test")
    got = spark.table("vanom_test")
    cols = ["window_start", "event_type", "n", "mu", "sigma", "z"]
    rows = _sorted_rows(got, cols)
    assert rows == _sorted_rows(batch, cols)
    assert len(rows) > 0


def test_merge_stream_to_parquet_equals_sequential_batch_fold(spark, tmp_path):
    """Streaming MERGE (foreachBatch + merge_into + staged swap) over
    three ordered change slices must land exactly the state of the
    sequential batch fold the driver certifies as ``stream_upsert``:
    batch 1 inserts re-keyed pending orders, batch 2 UPDATES those very
    inserts (ordering matters — a one-shot union merge is not
    equivalent), batch 3 deletes via the negative-price signal. Slices
    are single files written sequentially (distinct mtimes: the file
    source consumes in modification-time order) and drained with
    maxFilesPerTrigger=1 so each slice is its own micro-batch."""
    import time

    from clinical_data_lake_spark.driver_queries import QUERIES

    sf = SF_SMALL
    od = read_table(spark, sf, "orders")
    pend = od.filter(
        (F.col("o_orderstatus") == "P") & (F.col("o_orderkey") % 100 == 0)
    )
    b1 = pend.select(
        (F.col("o_orderkey") + F.lit(2_000_000_000)).alias("o_orderkey"),
        "o_custkey",
        F.lit("O").alias("o_orderstatus"),
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )
    b2 = pend.select(
        (F.col("o_orderkey") + F.lit(2_000_000_000)).alias("o_orderkey"),
        "o_custkey",
        F.lit("F").alias("o_orderstatus"),
        (F.col("o_totalprice") * F.lit(1.10)).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    b3 = od.filter(
        (F.col("o_orderpriority") == "5-LOW")
        & (F.col("o_orderstatus") == "F")
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.lit(-1.0).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    src_dir = str(tmp_path / "changes")
    for i, b in enumerate((b1, b2, b3)):
        b.coalesce(1).write.parquet(f"{src_dir}/slice{i}")
        time.sleep(1.1)  # distinct mtimes -> deterministic file order
    # flatten the slice part-files into one dir for the file source
    import glob
    import os
    import shutil

    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i in range(3):
        for f in sorted(glob.glob(f"{src_dir}/slice{i}/part-*.parquet")):
            shutil.copy(f, os.path.join(flat, f"{i}-{os.path.basename(f)}"))
            os.utime(
                os.path.join(flat, f"{i}-{os.path.basename(f)}"),
                (1_700_000_000 + i, 1_700_000_000 + i),
            )
    target = str(tmp_path / "target")
    od.write.parquet(target)  # seed with the initial snapshot
    changes = (
        spark.readStream.schema(od.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    se.merge_stream_to_parquet(
        changes,
        target,
        "o_orderkey",
        checkpoint=str(tmp_path / "ckpt"),
        delete_condition=F.col("src.o_totalprice") < 0,
    )
    got = sorted(
        map(tuple, spark.read.parquet(target).collect())
    )
    want = sorted(map(tuple, QUERIES["stream_upsert"](spark, sf).collect()))
    assert got == want


def test_streaming_clean_doc_equals_batch_with_replay(spark, tmp_path_factory):
    """clean_doc_stream: the streamed survivors' fingerprint KEY SET
    (through gates + watermarked dedup, with every file REPLAYED once
    = an at-least-once source) equals the batch twin's — the
    stream_clean registry artifact."""
    import shutil

    root = str(tmp_path_factory.mktemp("doc_stream_src"))
    docs = read_table(spark, SF_SMALL, "documents").withColumn(
        "ingest_ts",
        F.to_timestamp(F.lit("2024-01-01 00:00:00"))
        + F.make_interval(secs=F.col("doc_id").cast("double")),
    )
    docs.repartition(3).write.mode("overwrite").parquet(root)
    # replay every file once: at-least-once delivery
    import os as _os

    for i, f in enumerate(list(_os.listdir(root))):
        if f.endswith(".parquet"):
            shutil.copy(f"{root}/{f}", f"{root}/replay_{i}.parquet")

    batch = se.clean_doc_stream(docs).select("text_hash")
    stream = se.clean_doc_stream(
        se.stream_from_batch_dir(spark, root, docs.schema),
        ts_col="ingest_ts",
        watermark="365 days",
    ).select("text_hash")
    assert stream.isStreaming
    se.run_to_memory_sink(stream, "clean_doc_test", output_mode="append")
    got = sorted(r.text_hash for r in spark.table("clean_doc_test").collect())
    want = sorted(r.text_hash for r in batch.collect())
    assert got == want
    assert len(got) > 0


def test_clean_doc_stream_requires_ts_on_streams(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("doc_stream_src2"))
    docs = read_table(spark, SF_SMALL, "documents")
    docs.write.mode("overwrite").parquet(root)
    with pytest.raises(ValueError):
        se.clean_doc_stream(se.stream_from_batch_dir(spark, root, docs.schema))


def test_admit_doc_stream_equals_sequential_fold(spark, tmp_path):
    """Streaming incremental-dedup admission (foreachBatch vs the
    incremental_admission_fold batch twin): the streamed decisions and
    the final ledger must equal the sequential fold's, slice for
    slice — including an accepted doc from slice 0 blocking its own
    near-duplicate arriving in slice 2."""
    import time as _time

    from clinical_data_lake_spark.llm.dedup import (
        incremental_admission_fold,
    )

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    fresh1 = "one two three four five six seven eight nine ten eleven"
    fresh2 = "red blue green yellow purple orange cyan magenta lime teal"
    ledger_rows = [(0, base)]
    slices = [
        [(10, fresh1)],                       # accept (novel)
        [(11, base + " coda")],               # near dup of ledger 0
        [(12, fresh1), (13, fresh2),          # 12 = exact dup of 10
         (14, fresh2 + " extra word here")],  # 14 near dup of 13? same slice
    ]
    schema = "doc_id long, text string"

    src = str(tmp_path / "incoming")
    ledger_dir = str(tmp_path / "ledger")
    dec_dir = str(tmp_path / "decisions")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(ledger_rows, schema).write.parquet(ledger_dir)
    for sl in slices:
        spark.createDataFrame(sl, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _time.sleep(1.1)  # distinct mtimes -> deterministic file order

    stream = se.stream_from_batch_dir(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=1
    )
    se.admit_doc_stream(
        stream, ledger_dir, dec_dir, ckpt, threshold=0.5
    )

    got = {
        (r["doc_id"], r["decision"])
        for r in spark.read.parquet(dec_dir).collect()
    }
    fold = incremental_admission_fold(
        spark.createDataFrame(ledger_rows, schema),
        [spark.createDataFrame(sl, schema) for sl in slices],
        threshold=0.5,
    )
    want = {(r["doc_id"], r["decision"]) for r in fold.collect()}
    from clinical_data_lake_spark.operators.caching import release_persisted

    release_persisted()
    assert got == want
    assert dict(got)[11] == "near_dup"     # blocked by the seed ledger
    assert dict(got)[12] == "exact_dup"    # blocked by slice-0 acceptance
    # ledger = seed + exactly the accepted docs, no duplicates
    ledger_ids = sorted(
        r["doc_id"] for r in spark.read.parquet(ledger_dir).collect()
    )
    accepted = sorted([0] + [i for i, d in got if d == "accept"])
    assert ledger_ids == accepted


def test_admit_doc_stream_replay_keeps_ledger_duplicate_free(spark, tmp_path):
    """At-least-once replay: draining the SAME source files with a
    FRESH checkpoint re-admits every batch; every re-run row flips to
    exact_dup (its content is already in the ledger) and the ledger
    gains nothing — the anti-join replay guard plus content
    fingerprints keep the sink converged."""
    import time as _time

    schema = "doc_id long, text string"
    src = str(tmp_path / "incoming")
    ledger_dir = str(tmp_path / "ledger")
    dec_dir = str(tmp_path / "decisions")
    spark.createDataFrame(
        [(0, "seed document with enough words to shingle properly here")],
        schema,
    ).write.parquet(ledger_dir)
    spark.createDataFrame(
        [(10, "first novel document content alpha beta gamma delta")],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    _time.sleep(1.1)

    for ck in ("ckpt1", "ckpt2"):  # second drain = full replay
        stream = se.stream_from_batch_dir(
            spark, src, spark.read.parquet(src).schema,
            max_files_per_trigger=1,
        )
        se.admit_doc_stream(
            stream, ledger_dir, dec_dir, str(tmp_path / ck), threshold=0.5
        )

    ledger_ids = [
        r["doc_id"] for r in spark.read.parquet(ledger_dir).collect()
    ]
    assert sorted(ledger_ids) == [0, 10]  # replay appended nothing
    decs = sorted(
        (r["doc_id"], r["decision"])
        for r in spark.read.parquet(dec_dir).collect()
    )
    assert decs == [(10, "accept"), (10, "exact_dup")]
