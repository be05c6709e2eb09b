"""Event-stream window aggregations.

Design: each aggregation is ONE plan-builder function applied to either
a batch DataFrame or a streaming DataFrame — the DataFrame API is
identical, so the oracle-checked batch result (driver queries
``tumble_count``/``slide_agg``) certifies the same logical plan the
stream runs. Streaming adds only the watermark (bounds state: late rows
beyond the horizon are dropped and window state can be evicted — at
100 TB/day of events unbounded state is the first thing that kills a
job) and the sink trigger.

Scale notes: windowed group-aggs shuffle on (window, keys); partial
aggregation happens map-side per micro-batch. State store size =
#open windows x #keys — bounded by the watermark horizon.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str | None = "event_type",
    width: str = "10 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window counts: (window_start, key, cnt).

    Batch twin of the driver's oracle-checked ``tumble_count``; pass a
    streaming DataFrame + ``watermark`` for the incremental version.
    """
    if watermark is not None:
        events = events.withWatermark(ts_col, watermark)
    keys: list[Column | str] = [F.window(ts_col, width).alias("w")]
    if key_col is not None:
        keys.append(key_col)
    out = events.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
    cols = [F.col("w.start").cast("long").alias("window_start")]
    if key_col is not None:
        cols.append(F.col(key_col))
    return out.select(*cols, "cnt")


def windowed_histogram(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    width: str = "10 minutes",
    lo: float = 0.0,
    hi: float = 600.0,
    n_bins: int = 120,
    watermark: str | None = None,
) -> DataFrame:
    """Per-window fixed-bin value histograms:
    (window_start, key, bin, cnt) — the STREAMING producer for
    ``operators.aggregates.histogram_rollup``'s mergeable summaries:
    because the bin edges are fixed globally, window histograms merge
    downstream into any coarser rollup (daily, per-key, all-time) by
    integer addition, bit-exactly — the streaming-then-batch
    distribution pipeline without a sketch's merge-order caveats.
    Out-of-range values clamp into the edge bins (count everything).

    One watermarked streaming aggregation keyed by
    (window, key, bin); state per key is bounded by n_bins x windows
    inside the watermark horizon. Batch twin: the same expression on a
    static frame (the parity test's oracle).
    """
    if watermark is not None:
        events = events.withWatermark(ts_col, watermark)
    if not hi > lo:
        raise ValueError(f"windowed_histogram: need hi > lo, got [{lo}, {hi}]")
    bin_width = (float(hi) - float(lo)) / int(n_bins)
    b = F.floor(
        (F.col(value_col).cast("double") - F.lit(float(lo))) / F.lit(bin_width)
    )
    b = F.least(F.greatest(b, F.lit(0)), F.lit(int(n_bins) - 1))
    return (
        events.groupBy(
            F.window(ts_col, width).alias("w"),
            F.col(key_col),
            b.cast("int").alias("bin"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            key_col,
            "bin",
            "cnt",
        )
    )


def sliding_agg(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    width: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Sliding-window count + exact decimal sum emitted as double:
    (window_start, cnt, sum_value). Batch twin of ``slide_agg``."""
    if watermark is not None:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(F.window(ts_col, width, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col(value_col).cast("decimal(18,3)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").cast("long").alias("window_start"), "cnt", "sum_value")
    )


def trending_topk(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    width: str = "10 minutes",
    k: int = 3,
) -> DataFrame:
    """Per-window trending keys: the top-``k`` keys by count in each
    tumbling window, ties broken by key ascending (deterministic):
    (window_start, key, cnt, rnk).

    Built ON TOP of the same ``tumbling_counts`` plan the streaming
    wrapper runs — the rank stage windows over the (window, key) COUNT
    table (bounded by key cardinality per window, never event-scale).
    In streaming, ranking can't ride inside the incremental query
    (no window functions over streaming aggregates); the supported
    shape is ``rank_trending`` applied per sink table / foreachBatch
    micro-batch — see ``test_streaming.py``'s parity test.
    """
    counts = tumbling_counts(events, ts_col, key_col, width)
    return rank_trending(counts, key_col, k)


def rank_trending(counts: DataFrame, key_col: str = "event_type", k: int = 3) -> DataFrame:
    """Rank a (window_start, key, cnt) table to its per-window top-k —
    the batch stage a foreachBatch sink applies to the incrementally-
    maintained counts."""
    from pyspark.sql import Window

    w = Window.partitionBy("window_start").orderBy(F.desc("cnt"), F.asc(key_col))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def stream_from_batch_dir(
    spark,
    path: str,
    schema,
    fmt: str = "parquet",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream over a directory — the standard way to replay
    batch data as a stream (tests, backfills). ``maxFilesPerTrigger``
    paces micro-batches."""
    return (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )


def run_to_memory_sink(
    df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
    timeout_sec: float = 300.0,
):
    """Execute a streaming aggregation to completion against a memory
    sink and return the terminated query; results are then readable via
    ``spark.table(query_name)``. availableNow processes everything
    currently in the source and stops — the batch-equivalence test
    harness.

    Raises on timeout instead of returning: a still-running query means
    the memory table is silently partial, and every caller immediately
    reads it (the same failure mode ``stream_to_parquet`` guards
    against — under heavy host load the old 120 s cap produced a
    one-row-short stream-stream join result that looked like a
    correctness bug)."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"streaming query {query_name!r} still running after {timeout_sec}s"
        )
    return q


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming exact dedup: keep the first arrival per key, with
    dedup state evicted beyond the watermark horizon — the ingest-side
    guard against at-least-once sources (Kafka replays, file re-drops).
    Unbounded ``dropDuplicates`` state grows forever on a 100 TB/day
    stream; ``dropDuplicatesWithinWatermark`` keeps state proportional
    to keys-per-horizon instead. On a batch DataFrame this degrades to
    plain ``dropDuplicates`` (same result set, no state concept)."""
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def running_user_counts(
    events: DataFrame,
    key_col: str = "user_id",
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-key
    running event count, one updated row emitted per key per
    micro-batch — the template for stateful logic Spark's built-in
    windows can't express (per-entity accumulators, custom eviction,
    model state).

    State = one long per key (bounded: #distinct keys, not #events);
    batches arrive as Arrow-backed pandas frames, so per-batch work is
    vectorized. The update closure is self-contained (no module refs)
    so it pickles cleanly to executor Python workers.

    Batch equivalence: the LAST emitted row per key equals the batch
    ``groupBy(key).count()`` — asserted in tests/test_streaming.py.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = f"{key_col} long, n_events long"
    state_schema = "n long"

    def update(key, pdfs, state):
        import pandas as _pd

        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield _pd.DataFrame({key_col: [key[0]], "n_events": [n]})

    return events.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def sessionize(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stateful sessionization via Spark's native session window
    (gap-based): (key, session_start, session_end, n_events).

    ``F.session_window`` is the built-in replacement for a custom
    applyInPandasWithState session operator — state merges happen
    JVM-side. Works identically on batch DataFrames (no watermark
    needed there).
    """
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(F.session_window(ts_col, gap).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    keys: list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to a
    live event stream (user profile, device registry, reference codes).

    Structured Streaming supports joining a stream to a static
    DataFrame natively — no state store involved; the static side is
    re-read per micro-batch (so a refreshed dim table is picked up on
    the next trigger). With ``broadcast_dim`` the dim hashes once onto
    every executor instead of shuffling each micro-batch — the right
    plan whenever the dim fits in memory; disable it for huge dims and
    let AQE pick a shuffle join. Works identically on a batch
    DataFrame, which is what the parity test exploits.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return events.join(d, on=keys, how=how)


def attribution_join(
    views: DataFrame,
    clicks: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    horizon_s: int = 1800,
    watermark: str = "1 hour",
    left_id: str = "view_id",
    right_id: str = "click_id",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join — view-to-click attribution: every
    (view, click) pair for the same key where the click lands within
    ``horizon_s`` seconds AFTER the view. Returns
    (key, view_id, click_id, view_ts, click_ts, lag_s).

    ``how="left_outer"`` additionally emits every UNCONVERTED view with
    NULL click columns — the funnel-drop-off side of attribution. In
    streaming mode the engine can only declare a view unmatched once
    the watermark passes its horizon, so outer null rows trail the
    inner matches by (watermark + horizon) of event time; the
    time-interval condition is what makes outer emission possible at
    all (an unconstrained outer stream-stream join would wait
    forever).

    The one Structured Streaming join mode the other builders don't
    cover: BOTH sides are streams, so matches can arrive in either
    order and the engine buffers each side in the state store. The
    time-interval predicate is what makes that state bounded — with
    both sides watermarked, rows older than (watermark + horizon) are
    evicted; an equality-only stream-stream join would buffer forever.
    On batch DataFrames the same plan is a plain interval join, which
    is how the driver oracle certifies the semantics
    (``attribution_join``); the streaming≡batch parity test replays
    the batch data through a file-source stream.

    100 TB shape: state shuffles on the join key; per-key state size =
    events-per-horizon, independent of stream length.
    """
    v = views.select(
        F.col(key_col).alias("__k__"),
        F.col(left_id),
        F.col(ts_col).alias("view_ts"),
    )
    c = clicks.select(
        F.col(key_col).alias("__ck__"),
        F.col(right_id),
        F.col(ts_col).alias("click_ts"),
    )
    if v.isStreaming:
        v = v.withWatermark("view_ts", watermark)
    if c.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if how not in ("inner", "left_outer"):
        raise ValueError(f"attribution_join supports inner/left_outer, got {how!r}")
    cond = (
        (F.col("__k__") == F.col("__ck__"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {int(horizon_s)} SECONDS"))
    )
    return (
        v.join(c, on=cond, how=how)
        .select(
            F.col("__k__").alias(key_col),
            left_id,
            right_id,
            "view_ts",
            "click_ts",
            (F.col("click_ts").cast("long") - F.col("view_ts").cast("long")).alias("lag_s"),
        )
    )


def stream_to_parquet(
    df: DataFrame,
    path: str,
    checkpoint: str,
    output_mode: str = "append",
    timeout_sec: float = 300.0,
    partition_by: list[str] | None = None,
):
    """Durable streaming sink: parquet files + a write-ahead checkpoint,
    processed with availableNow (drain everything currently in the
    source, then stop — the incremental-batch pattern: re-running the
    same query picks up exactly the new source files, giving
    exactly-once file output across restarts via the checkpoint's
    source offsets + sink commit log).

    At scale this IS the ingestion loop: a cron-triggered availableNow
    run replaces a always-on cluster for hourly/daily freshness at a
    fraction of the cost, with identical semantics. ``partition_by``
    lays out hive-style directories for downstream partition pruning.
    """
    w = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    q = w.start()
    if not q.awaitTermination(timeout_sec):
        # the availableNow drain outran the timeout: returning now
        # would hand callers a sink with silently partial output
        q.stop()
        raise TimeoutError(
            f"availableNow drain to {path} still running after "
            f"{timeout_sec}s; stopped the query — raise timeout_sec "
            f"or shrink the backlog per run"
        )
    return q


def running_user_totals_tws(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """The same per-key accumulator as ``running_user_counts``, on the
    transformWithStateInPandas API (Spark 4.x): a StatefulProcessor
    with a typed ValueState holding (n_events, sum_value) per key, one
    updated row emitted per key per micro-batch.

    Why both: applyInPandasWithState is the widely-deployed interface;
    transformWithState is its successor — typed state variables
    (value/list/map), per-processor init/close hooks, timers, and TTL —
    and requires the RocksDB state store provider (the store that
    actually scales: changelog-checkpointed, not JVM-heap-bound, the
    configuration a 100 TB deployment runs anyway).

    Environment note: the TWS state-server protocol needs the
    ``google.protobuf`` Python package at runtime; in containers
    without it the query fails at init (this repo's test skips with
    the cause, mirroring the delta-gated paths). The
    applyInPandasWithState twin above carries the certified coverage.

    Batch equivalence: last emitted row per key equals the batch
    groupBy count/sum — asserted in tests/test_streaming.py.
    """
    import pandas as _pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    out_schema = f"{key_col} long, n_events long, sum_value double"

    class _Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", "n long, s double")

        def handleInputRows(self, key, rows, timerValues):
            n, s = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                s += float(pdf[value_col].sum())
            self._state.update((n, s))
            yield _pd.DataFrame(
                {key_col: [key[0]], "n_events": [n], "sum_value": [s]}
            )

        def close(self) -> None:
            pass

    return events.groupBy(key_col).transformWithStateInPandas(
        _Totals(), out_schema, "update", "processingTime"
    )


def session_stats(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    value_col: str | None = "value",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-session engagement stats on top of the same native
    session-window plan ``sessionize`` uses: first/last event time,
    dwell (last - first, the ACTUAL event span, not the gap-padded
    window end), event count, bounce flag (single-event session), and
    the decimal-exact value sum:

        (key, session_start, n_events, duration_s, is_bounce
         [, sum_value])

    All measures ride the ONE stateful session aggregation — no
    second pass, no join; works identically on batch (no watermark)
    and streaming inputs.
    """
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("__first__"),
        F.max(ts_col).alias("__last__"),
    ]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,3)")).cast("double")
            .alias("sum_value")
        )
    out = (
        events.groupBy(F.session_window(ts_col, gap).alias("w"), key_col)
        .agg(*aggs)
        .select(
            key_col,
            F.unix_timestamp("__first__").alias("session_start"),
            F.col("n_events").cast("long").alias("n_events"),
            (F.unix_timestamp("__last__") - F.unix_timestamp("__first__"))
            .cast("long")
            .alias("duration_s"),
            (F.col("n_events") == 1).alias("is_bounce"),
            *(["sum_value"] if value_col is not None else []),
        )
    )
    return out


def windowed_distinct_users(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    width: str = "10 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Distinct active users per tumbling window:
    (window_start, distinct_users) — the DAU/WAU-style reach metric.

    COUNT(DISTINCT) is not an incremental streaming aggregate, so the
    plan is the two-stage exact reformulation that IS: first a
    (window, user) aggregate (streaming state = one row per active
    user per window, exactly the information any exact distinct count
    must hold; the watermark evicts closed windows), then a per-window
    count. Spark >= 3.4 chains the two stateful aggregates in append
    mode. The batch twin runs the identical plan — certified by the
    driver oracle; streaming parity pinned in tests.
    """
    if watermark is not None:
        events = events.withWatermark(ts_col, watermark)
    # dedup-then-aggregate, NOT aggregate-then-aggregate: streaming
    # dropDuplicates emits each first (window, user) occurrence
    # immediately — it introduces no watermark-delayed rows, so the
    # downstream windowed count is the long-supported single stateful
    # aggregation (chained window aggregates trip the global-watermark
    # correctness check and, in append mode, withhold unclosed
    # windows). The event-time column rides through the dedup so the
    # final window groups on real event time.
    deduped = events.withColumn(
        "__ws__", F.window(ts_col, width)["start"]
    ).dropDuplicates([user_col, "__ws__"])
    return (
        deduped.groupBy(F.window(ts_col, width).alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("distinct_users"))
        .select(F.col("w.start").cast("long").alias("window_start"), "distinct_users")
    )


def stream_upsert_parquet(
    changes: DataFrame,
    state_path: str,
    checkpoint: str,
    keys: list[str],
    value_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
    timeout_sec: float = 300.0,
):
    """Streaming CDC upsert into a parquet state table — the canonical
    lakehouse ingestion loop: each micro-batch of change rows MERGEs
    into the current snapshot via ``cdc.apply_changes`` inside
    ``foreachBatch`` (the pattern every sink without native MERGE
    uses), written atomically by staged-directory swap. availableNow +
    checkpoint = an idempotent incremental batch: re-running without
    new source files changes nothing; crash-restart re-applies only
    unprocessed batches (apply_changes is deterministic and
    last-writer-wins by ``seq_col``, so re-applying a batch that
    already merged is a no-op).

    At 100 TB the state write is the cost — with Delta/Iceberg the
    foreachBatch body becomes a native MERGE and the rest of this
    machinery (checkpointing, ordering, idempotence) is unchanged.
    """
    from ..operators.cdc import apply_changes

    cols = list(dict.fromkeys([*keys, *value_cols]))

    def _paths(spark):
        jvm = spark.sparkContext._jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        dst = jvm.org.apache.hadoop.fs.Path(state_path)
        src = jvm.org.apache.hadoop.fs.Path(state_path.rstrip("/") + ".staging")
        bak = jvm.org.apache.hadoop.fs.Path(state_path.rstrip("/") + ".bak")
        return dst.getFileSystem(hconf), dst, src, bak

    def merge_batch(batch_df, batch_id: int):
        spark = batch_df.sparkSession
        fs, dst, src, bak = _paths(spark)
        # Crash recovery BEFORE reading: the swap below is two renames
        # (dst→bak, staging→dst), and a crash between them leaves no
        # state dir while .bak still holds the committed snapshot. The
        # checkpoint had NOT committed that batch (foreachBatch commits
        # on return), so restoring .bak and letting the re-delivered
        # batch merge again is exactly-once — apply_changes is
        # deterministic and last-writer-wins. Treating the missing dir
        # as first-run instead would silently abandon all prior state.
        if not fs.exists(dst) and fs.exists(bak):
            fs.rename(bak, dst)
        if fs.exists(src):
            fs.delete(src, True)  # stale staging from an interrupted write
        if fs.exists(dst):
            # No except here: a CORRUPT state dir must raise loudly,
            # not masquerade as an empty first-run snapshot.
            snapshot = spark.read.parquet(state_path).select(*cols)
        else:
            snapshot = spark.createDataFrame(
                [], batch_df.select(*cols).schema
            )
        new_snap = apply_changes(
            snapshot, batch_df, keys, seq_col=seq_col, op_col=op_col
        )
        new_snap.write.mode("overwrite").parquet(
            state_path.rstrip("/") + ".staging"
        )
        if fs.exists(bak):
            fs.delete(bak, True)
        if fs.exists(dst):
            fs.rename(dst, bak)
        fs.rename(src, dst)
        if fs.exists(bak):
            fs.delete(bak, True)

    q = (
        changes.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"stream_upsert_parquet drain into {state_path} still running "
            f"after {timeout_sec}s"
        )
    return q


def volume_anomaly(
    events: DataFrame,
    baseline: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    width: str = "1 hour",
    z_threshold: float = 2.0,
    watermark: str | None = None,
    digits: int = 6,
) -> DataFrame:
    """Streaming volume-anomaly scoring against a BATCH-TRAINED
    seasonal baseline — the production shape of
    ``operators.timeseries.seasonal_anomaly``: the baseline (key,
    hour-of-day, mu, sigma) comes from history offline; the live
    stream only aggregates tumbling window counts and scores each
    closed window against the broadcast baseline. One stateful
    windowed aggregation + one stream-static broadcast join — no
    stream-side history, state bounded by the watermark horizon.

    Emits flagged windows only: (window_start, key, n, mu, sigma, z)
    with z = (n - mu)/sigma rounded to ``digits``. Batch twin: same
    builder on a static frame (the parity test's oracle). Windows with
    no baseline row (unseen key) are dropped — score only what history
    can judge.
    """
    counts = tumbling_counts(
        events, ts_col=ts_col, key_col=key_col, width=width,
        watermark=watermark,
    )
    hour = F.hour(F.timestamp_seconds(F.col("window_start"))).cast("int")
    base = baseline.select(
        F.col(key_col),
        F.col("hour").cast("int").alias("__bh__"),
        F.col("mu").cast("double").alias("__mu__"),
        F.col("sigma").cast("double").alias("__sg__"),
    ).filter(F.col("__sg__").isNotNull() & (F.col("__sg__") > 0.0))
    scored = counts.withColumn("__h__", hour).join(
        F.broadcast(base),
        on=[
            counts[key_col] == base[key_col],
            F.col("__h__") == F.col("__bh__"),
        ],
    )
    z = F.round(
        (F.col("cnt").cast("double") - F.col("__mu__")) / F.col("__sg__"),
        digits,
    )
    return scored.select(
        "window_start",
        counts[key_col].alias(key_col),
        F.col("cnt").cast("long").alias("n"),
        (F.round(F.col("__mu__"), digits) + F.lit(0.0)).alias("mu"),
        (F.round(F.col("__sg__"), digits) + F.lit(0.0)).alias("sigma"),
        (z + F.lit(0.0)).alias("z"),
    ).filter(F.abs(F.col("z")) >= F.lit(float(z_threshold)))


def merge_stream_to_parquet(
    changes: DataFrame,
    target_dir: str,
    keys: list[str] | str,
    checkpoint: str,
    update_condition: Column | None = None,
    delete_condition: Column | None = None,
    insert: bool = True,
    timeout_sec: float = 300.0,
):
    """Streaming ``MERGE INTO`` on the plain-parquet path: every
    micro-batch of ``changes`` upserts into the parquet directory
    ``target_dir`` through ``cdc.merge_into`` (WHEN MATCHED UPDATE /
    DELETE, WHEN NOT MATCHED INSERT — the Delta streaming-upsert habit,
    ``foreachBatch`` + ``MERGE``, without Delta). The target is
    rewritten per batch with the staged rename swap
    (``catalog._rewrite_in_place``): parquet cannot overwrite a path it
    is reading, and the swap restores the original on failure.

    Exactly-once story: availableNow + the checkpoint's source offsets
    give at-least-once batch delivery, and THIS merge shape is
    idempotent under replay — re-applying a batch updates rows to the
    values they already hold, re-inserts become matched updates of
    identical rows, and re-deletes match nothing — so the sink state
    converges even when a batch is retried after a crash between the
    directory swap and the checkpoint commit.

    ``target_dir`` must exist (seed it with the initial snapshot
    before starting). At 100 TB the per-batch cost is one full-outer
    merge join plus a full rewrite of the target — the same cost
    profile as a Delta MERGE that rewrites every file; partition the
    target and pre-filter batches to touched partitions when change
    locality allows."""
    from ..catalog import _rewrite_in_place
    from ..operators.cdc import merge_into

    def _apply(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _rewrite_in_place(
            batch_df.sparkSession,
            target_dir,
            lambda tgt: merge_into(
                tgt,
                batch_df,
                keys,
                update_condition=update_condition,
                delete_condition=delete_condition,
                insert=insert,
            ),
        )

    q = (
        changes.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"availableNow merge drain into {target_dir} still running "
            f"after {timeout_sec}s; stopped the query"
        )
    return q


def clean_doc_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang: str = "en",
    min_tokens: int = 5,
    max_tokens: int = 5000,
    min_quality: float = 0.2,
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming corpus-ingest hygiene: the same scan-side
    score-and-gate stage batch ``clean_corpus`` runs (token/quality/
    lang-id gates — pure projections, streaming-safe), then exact
    dedup on the text fingerprint with watermark-bounded state
    (``dropDuplicatesWithinWatermark``) — clean AT INGEST instead of
    re-scanning the lake nightly. State is keys-per-horizon, not
    corpus-lifetime: the property that makes the op runnable on a
    100 TB/day feed. Batch inputs degrade to plain ``dropDuplicates``
    on the fingerprint (identical surviving KEY SET; which physical
    row survives per fingerprint is engine/arrival-order-arbitrary,
    so downstream consumers key on ``text_hash`` — the stream_dedup
    convention).

    Returns (id, [ts], n_tokens, quality, text_hash) survivors.
    """
    from ..llm.corpus import score_and_gate

    extra = (ts_col,) if ts_col else ()
    kept = score_and_gate(
        docs, id_col, text_col, lang, min_tokens, max_tokens, min_quality,
        extra_cols=extra,
    ).drop("pred_lang")
    if kept.isStreaming:
        if not ts_col:
            raise ValueError("streaming input needs ts_col for the watermark")
        return kept.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["text_hash"]
        )
    return kept.dropDuplicates(["text_hash"])


def watermark_lateness_audit(
    events: DataFrame,
    ts_col: str = "ts",
    arrival_col: str = "event_id",
    delays_s: tuple[int, ...] = (0, 60, 300, 3600),
    num_batches: int = 256,
    digits: int = 6,
) -> DataFrame:
    """Watermark-delay planning table for the streaming pack: for each
    candidate ``withWatermark`` delay, how many events the stream
    would DROP as too-late — the number you need BEFORE picking the
    delay (too small silently loses data, too large bloats every
    stateful operator's store by the same factor).

    Semantics mirror Structured Streaming: the watermark advances at
    micro-batch boundaries to ``max(event time seen in prior batches)
    - delay``, and a row is dropped when its event time is older than
    the CURRENT watermark. Arrival order is modeled by ``arrival_col``
    (ingest sequence), micro-batches by ``num_batches`` equal-width
    arrival slices; batch 0 drops nothing (no watermark yet), exactly
    like a fresh query. Coarser batches advance the watermark less
    often, so the audit is a mild UNDER-estimate of drops vs a
    finer-triggered stream — the conservative direction for capacity
    planning is a larger ``num_batches``.

    Scale shape: one scan rolls events into per-slice max event times;
    the slice table is ``num_batches`` rows BY CONSTRUCTION (not
    data-sized — a fixed batch_size would funnel N/batch_size rows
    through the prefix window at 100 TB), so the running prior-batch
    max is a window over a bounded table; each event then joins its
    slice row broadcast-style and every (event, delay) test is a
    projection. No global event-order sort ever happens.
    """
    from pyspark.sql import Window

    bounds = events.agg(
        F.min(arrival_col).alias("__lo__"), F.max(arrival_col).alias("__hi__")
    )
    # floor(double division): operands stay exactly representable
    # (arrival deltas * num_batches << 2^53) and IEEE division is
    # exactly rounded, so both engines compute the identical slice id.
    slice_id = F.least(
        F.floor(
            ((F.col(arrival_col) - F.col("__lo__"))
             * F.lit(int(num_batches))).cast("double")
            / (F.col("__hi__") - F.col("__lo__") + F.lit(1)).cast("double")
        ),
        F.lit(num_batches - 1).cast("long"),
    )
    # persisted: this narrow (slice, epoch) frame feeds BOTH the
    # per-slice max rollup and the join-back — unpersisted, the events
    # scan (the dominant I/O at scale) runs twice more
    from ..operators.caching import track_persist

    ev = track_persist(
        events.crossJoin(F.broadcast(bounds)).select(
            slice_id.cast("long").alias("__b__"),
            F.unix_timestamp(F.col(ts_col)).alias("__t__"),
        )
    )
    batches = ev.groupBy("__b__").agg(F.max("__t__").alias("__bmax__"))
    prior = Window.orderBy("__b__").rowsBetween(
        Window.unboundedPreceding, -1
    )
    batches = batches.select(
        "__b__", F.max("__bmax__").over(prior).alias("__wm_ts__")
    )
    joined = ev.join(F.broadcast(batches), on="__b__")
    delays = F.array(*[F.lit(int(d)) for d in delays_s])
    exploded = joined.select(
        "__t__", "__wm_ts__", F.explode(delays).alias("delay_s")
    )
    late = (
        F.col("__wm_ts__").isNotNull()
        & (F.col("__t__") < F.col("__wm_ts__") - F.col("delay_s"))
    )
    n = F.count(F.lit(1))
    return (
        exploded.groupBy("delay_s")
        .agg(
            n.cast("long").alias("n_events"),
            F.sum(late.cast("long")).alias("n_late"),
        )
        .select(
            "delay_s",
            "n_events",
            "n_late",
            F.round(
                F.col("n_late").cast("double") / F.col("n_events").cast("double"),
                digits,
            ).alias("frac_late"),
        )
    )


def admit_doc_stream(
    docs: DataFrame,
    ledger_dir: str,
    decisions_dir: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = 100,
    timeout_sec: float = 300.0,
):
    """Streaming incremental-dedup ADMISSION — the ingest pipeline a
    100 TB corpus actually runs: every micro-batch of new documents is
    admitted against the ledger parquet at ``ledger_dir`` via
    ``llm.dedup.incremental_dedup`` (exact fingerprint gate + directed
    batch x ledger capped-index Jaccard), accepted docs are APPENDED
    to the ledger (so a duplicate later in the stream is blocked by a
    doc accepted earlier — the sequential-fold semantics
    ``incremental_admission_fold`` certifies against DuckDB), and
    every decision row (id, decision, batch id) is appended to
    ``decisions_dir``.

    Seed ``ledger_dir`` with the initial corpus snapshot before
    starting. Per-batch cost is |batch| x |ledger| inverted-index
    terms plus one ledger scan — the ledger is read fresh each batch
    (appends from prior batches are visible because parquet appends
    are new files). Replay story: at-least-once batch delivery can
    re-run a batch after a crash between the ledger append and the
    checkpoint commit; a re-run batch's accepted docs would already
    sit in the ledger and every row would flip to exact_dup — so the
    decisions log is the at-least-once artifact (dedup it on id
    downstream, keeping the FIRST decision per id), while the ledger
    itself stays duplicate-free: re-accepted ids are excluded by an
    anti-join against the current ledger ids before the append.
    """
    from ..llm.dedup import incremental_dedup
    from ..operators.caching import release_persisted

    spark_ref = docs.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ledger = spark_ref.read.parquet(ledger_dir)
        dec = incremental_dedup(
            batch_df, ledger, id_col, text_col, n, threshold, max_doc_freq
        )
        try:
            dec.select(
                F.col(id_col),
                "decision",
                F.lit(batch_id).cast("long").alias("batch_id"),
            ).write.mode("append").parquet(decisions_dir)
            accepted = batch_df.join(
                dec.filter(F.col("decision") == "accept").select(id_col),
                on=id_col,
                how="left_semi",
            ).join(  # replay guard: never re-append an id already present
                ledger.select(id_col), on=id_col, how="left_anti"
            )
            # materialize BEFORE the append: `accepted`'s plan scans
            # ledger_dir (incremental_dedup + the anti-join above), and
            # a write must never share a live plan with a scan of its
            # own destination — append mode happens to list files at
            # planning time today, but a re-listed or speculatively
            # re-executed scan could read its own partial output.
            # localCheckpoint cuts the lineage at batch size.
            accepted = accepted.select(*ledger.columns).localCheckpoint(eager=True)
            accepted.write.mode("append").parquet(ledger_dir)
        finally:
            release_persisted()

    q = (
        docs.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"availableNow admission drain into {ledger_dir} still running "
            f"after {timeout_sec}s; stopped the query"
        )
    return q
