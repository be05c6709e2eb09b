"""Deterministic sampling operators for training-data pipelines.

``df.sample()`` / ``randomSplit`` are seed-reproducible only for a fixed
partitioning — repartition the input and the sample changes. At 100 TB
that makes experiment reruns non-reproducible. The operators here key
the sampling decision on a *hash of the row's own key*, so membership is
a pure function of the data: stable across partitionings, engines, and
reruns, and joinable (the same key samples identically in two tables,
which is what you need to sample a fact table and its dimensions
consistently).

All are pure projections/filters — no shuffle, full codegen; the
per-group variant adds the one shuffle its window needs.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 2-hex-digit md5 prefix thresholds: fraction k/256 ≈ prefix < hex(k)
_HEX = "0123456789abcdef"


def _md5_prefix(col: str) -> F.Column:
    return F.substring(F.md5(F.col(col).cast("string")), 1, 2)


def hash_sample(df: DataFrame, key_col: str, n_256: int) -> DataFrame:
    """Keep rows whose md5(key) prefix falls in the first ``n_256``/256
    of hash space (e.g. n_256=26 ≈ 10.2%). Deterministic: the same key
    is always in or always out, independent of partitioning or engine —
    md5 hex is identical everywhere, so the oracle can replay it.
    """
    if not 0 < n_256 <= 256:
        raise ValueError("n_256 must be in (0, 256]")
    if n_256 == 256:  # full hash space: every prefix is < the (3-digit)
        return df     # threshold, but hex math would yield '00' -> 0 rows
    threshold = _HEX[(n_256 >> 4) & 0xF] + _HEX[n_256 & 0xF]
    return df.filter(_md5_prefix(key_col) < F.lit(threshold))


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: Sequence[float] = (0.8, 0.1, 0.1),
    labels: Sequence[str] = ("train", "val", "test"),
    alias: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment keyed on md5(key) —
    the reproducible, engine-portable replacement for seeded
    ``randomSplit`` (02-patient-trajectory.py:85-87), whose output
    changes with partitioning. Weights are quantized to 256 hash cells
    (resolution ~0.4%); every key lands in exactly one split, forever,
    in any engine that can compute md5."""
    if len(weights) != len(labels) or len(labels) < 2:
        raise ValueError("need matching weights/labels, at least 2")
    total = float(sum(weights))
    cells = []
    cum = 0.0
    for w in weights[:-1]:
        cum += w / total
        cells.append(max(1, min(255, round(cum * 256))))
    prefix = _md5_prefix(key_col)
    expr = F.lit(labels[-1])
    for cell, label in zip(reversed(cells), reversed(labels[:-1])):
        threshold = _HEX[(cell >> 4) & 0xF] + _HEX[cell & 0xF]
        expr = F.when(prefix < F.lit(threshold), F.lit(label)).otherwise(expr)
    return df.withColumn(alias, expr)


def sample_per_group(
    df: DataFrame,
    group_keys: Sequence[str],
    key_col: str,
    n: int,
    rank_alias: str = "rn",
) -> DataFrame:
    """Deterministic fixed-size per-group sample: rank rows inside each
    group by md5(key) (a uniform-ish but reproducible order, key
    tie-break) and keep the first ``n``. The distributed replacement for
    the reference's unordered ``.limit(n)`` cohort balancing
    (02-patient-trajectory.py:77), which picks whatever rows arrive
    first. One partitionBy(group) exchange; no global sort."""
    w = Window.partitionBy(*group_keys).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    return (
        df.select("*", F.row_number().over(w).alias(rank_alias))
        .filter(F.col(rank_alias) <= n)
    )


def sample_mixture(
    df: DataFrame,
    group_col: str,
    key_col: str,
    rates_256: Mapping[str, int],
    default_256: int = 0,
) -> DataFrame:
    """Deterministic domain-mixture sampling: group ``g`` keeps
    ``rates_256[g]``/256 of its rows, selected by md5(key) prefix —
    the training-data knob for hitting per-domain mixture targets
    (e.g. keep all English, half German, none of the rest). Groups not
    in ``rates_256`` keep ``default_256``/256.

    Same guarantees as ``hash_sample``: membership is a pure function
    of the key, identical under any partitioning and replayable in any
    engine with md5. A pure filter — no shuffle at any scale.
    """
    for g, r in rates_256.items():
        if not 0 <= r <= 256:
            raise ValueError(f"rate for {g!r} must be in [0, 256], got {r}")
    if not 0 <= default_256 <= 256:
        raise ValueError(f"default_256 must be in [0, 256], got {default_256}")

    prefix = _md5_prefix(key_col)

    def keep(n_256: int) -> F.Column:
        if n_256 == 256:
            return F.lit(True)
        if n_256 == 0:
            return F.lit(False)
        return prefix < F.lit(_HEX[(n_256 >> 4) & 0xF] + _HEX[n_256 & 0xF])

    pred = keep(default_256)
    for g, r in rates_256.items():
        pred = F.when(F.col(group_col) == g, keep(r)).otherwise(pred)
    return df.filter(pred)


def stratified_split(
    df: DataFrame,
    strata_cols: Sequence[str],
    key_col: str,
    weights: Sequence[float] = (0.8, 0.2),
    labels: Sequence[str] = ("train", "test"),
    alias: str = "split",
) -> DataFrame:
    """Exact stratified split: within each stratum, rows are ranked by
    md5(key) (deterministic, partitioning-independent) and cut at
    ``round(cum_weight * stratum_size)`` — so every stratum lands its
    EXACT proportion in every split, the class-balance guarantee
    ``hash_split`` (expected proportions only) can't give small or
    skewed classes. One window shuffle on the strata columns.
    """
    if len(weights) != len(labels) or len(labels) < 2:
        raise ValueError("need len(weights) == len(labels) >= 2")
    if any(w <= 0 for w in weights):
        raise ValueError("weights must be positive")
    total = float(sum(weights))

    w_rank = Window.partitionBy(*strata_cols).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    w_all = Window.partitionBy(*strata_cols)
    rn = F.row_number().over(w_rank)
    cnt = F.count(F.lit(1)).over(w_all)

    expr = F.lit(labels[-1])
    cum = 0.0
    cuts = []
    for w in weights[:-1]:
        cum += w / total
        cuts.append(cum)
    for cut, label in zip(reversed(cuts), reversed(labels[:-1])):
        expr = F.when(rn <= F.round(F.lit(cut) * cnt), F.lit(label)).otherwise(expr)
    return df.withColumn(alias, expr)


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-ES): per group, keep the ``k`` rows with
    the smallest -ln(u)/w, where u is an md5-derived uniform of the
    row's key and w its (positive) weight — inclusion probability
    proportional to weight, membership a pure function of the data
    (any partitioning, any engine with md5 replays it; the standard
    use: sample training docs proportional to length/quality).

    u = (first 13 md5 hex digits + 0.5) / 16^13 — 52 bits, exact in a
    double, strictly inside (0,1) so ln() is finite. One window
    shuffle on the group key; everything else is a projection.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    v = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 13), 16, 10
    ).cast("long")
    u = (v.cast("double") + F.lit(0.5)) / F.lit(float(16**13))
    aes = -F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(group_col).orderBy(F.asc("__aes__"), F.asc(key_col))
    return (
        df.withColumn("__aes__", aes)
        .withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= k)
        .drop("__aes__", "__rn__")
    )


def alpha_mixture_rates(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.5,
    target_frac: float = 0.5,
) -> DataFrame:
    """Temperature-scaled mixture rates — the mC4/XLM-R alpha-sampling
    rule for multi-domain corpora: group ``g``'s share of the sampled
    corpus is proportional to ``n_g ** alpha``, flattening the natural
    (head-heavy) distribution so low-resource groups are not drowned
    out (alpha=1 keeps natural proportions, alpha=0 equalizes groups).

    With ``T = target_frac * N`` total sampled rows, group ``g`` keeps

        rate_g = min(1, T * n_g**alpha / sum_h(n_h**alpha) / n_g)

    quantized to 65536 hash cells for exact engine-portable replay
    (the same md5-prefix trick as ``sample_mixture``, at 16-bit
    resolution because rates here are data-derived, not caller-picked).
    Groups capped at 1 (rate would exceed their size) under-deliver
    the target slightly — the standard single-pass approximation; the
    exact fix is iterative water-filling, which no pretraining mixer
    bothers with.

    Returns (group, n_docs, rate_65536). One groupBy on the
    low-cardinality group key + two 1-row broadcast scalars.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    return alpha_mixture_rates_from_counts(counts, group_col, alpha, target_frac)


def alpha_mixture_rates_from_counts(
    counts: DataFrame,
    group_col: str,
    alpha: float = 0.5,
    target_frac: float = 0.5,
) -> DataFrame:
    """``alpha_mixture_rates`` from a pre-aggregated per-group table
    (one row per group with an ``n_docs`` column). Extra columns in
    ``counts`` (e.g. per-group token sums) are carried through — this
    lets callers fold auxiliary aggregates into the SAME groupBy that
    feeds the rate computation, avoiding a second corpus scan and a
    null-unsafe re-join on the group key (a NULL group survives a
    groupBy but not an equality join).
    """
    weight = F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha)))
    weighted = counts.withColumn("__w__", weight)
    totals = weighted.agg(
        F.sum("n_docs").alias("__n__"), F.sum("__w__").alias("__wsum__")
    )
    rate = F.least(
        F.lit(1.0),
        F.lit(float(target_frac))
        * F.col("__n__").cast("double")
        * F.col("__w__")
        / F.col("__wsum__")
        / F.col("n_docs").cast("double"),
    )
    extra = [c for c in counts.columns if c not in (group_col, "n_docs")]
    return (
        weighted.crossJoin(F.broadcast(totals))
        .select(
            F.col(group_col),
            F.col("n_docs"),
            *[F.col(c) for c in extra],
            F.floor(rate * F.lit(65536.0)).cast("int").alias("rate_65536"),
        )
    )


def sample_alpha_mixture(
    df: DataFrame,
    group_col: str,
    key_col: str,
    alpha: float = 0.5,
    target_frac: float = 0.5,
) -> DataFrame:
    """Apply ``alpha_mixture_rates``: keep a row iff the first 4 hex
    digits of md5(key) fall below its group's quantized rate. Same
    guarantees as ``hash_sample``/``sample_mixture``: membership is a
    pure function of (key, corpus composition) — stable across
    partitionings and engines — and consistent across tables sharing
    the key. The rates side is group-cardinality-sized, so the join is
    a broadcast: the corpus is scanned once, no shuffle.
    """
    rates = alpha_mixture_rates(df, group_col, alpha, target_frac)
    thresh = F.lower(F.lpad(F.hex(F.col("rate_65536")), 4, "0"))
    keep = (F.col("rate_65536") >= 65536) | (
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 4) < thresh
    )
    return (
        df.join(F.broadcast(rates), on=group_col)
        .filter(keep)
        .drop("n_docs", "rate_65536")
    )


def negative_samples(
    anchors: DataFrame,
    corpus: DataFrame,
    k: int,
    anchor_col: str = "query_id",
    id_col: str = "doc_id",
    positives: DataFrame | None = None,
    oversample: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for
    each anchor, ``k`` pseudo-uniform corpus ids — reproducible across
    runs, partitionings, and engines (pure md5 arithmetic, the same
    contract as ``hash_split``), with an anchor's known positives
    excluded when ``positives`` (anchor_col, id_col) is given. Output:
    (anchor_col, neg_rank 1..k, id_col).

    Hash-ring construction: every corpus id sits on a ring at
    md5(id); each (anchor, slot) probe lands at md5(anchor:slot:seed)
    and takes the next corpus id clockwise (first pos >= probe,
    wrapping). ``oversample`` extra slots absorb positive-exclusion
    losses and probe collisions; rank keeps the first k surviving
    slots. With heavy oversampling loss an anchor can emit < k rows —
    raise ``oversample`` (loss is ~|positives per anchor| / |corpus|).

    Scale shape — the ring match is NOT a global-order window: ring
    and probes bucket by the first two hex chars (256 order-preserving
    segments), the clockwise carry runs inside each bucket, and
    wraparound across empty tails resolves against a 256-row
    per-bucket successor table (broadcast). One corpus-scale shuffle
    on the bucket key; probes are |anchors| x (k + oversample).
    """
    m = k + oversample
    probe_pos = F.md5(
        F.concat_ws(":", F.col(anchor_col).cast("string"),
                    F.col("__slot__").cast("string"), F.lit(str(seed)))
    )
    probes = (
        anchors.select(anchor_col).distinct()
        .select(
            anchor_col,
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("__slot__"),
        )
        .select(anchor_col, "__slot__", probe_pos.alias("__pos__"))
    )
    ring = corpus.select(
        F.col(id_col).alias("__rid__"),
        F.md5(F.col(id_col).cast("string")).alias("__pos__"),
    )
    bkt = F.substring("__pos__", 1, 2)

    # clockwise carry inside each bucket: descending pos, corpus rows
    # first on ties (pos == probe counts as a match)
    u = (
        ring.select(
            bkt.alias("__bkt__"), "__pos__", "__rid__",
            F.lit(None).cast(probes.schema[anchor_col].dataType).alias(anchor_col),
            F.lit(None).cast("int").alias("__slot__"),
            F.lit(0).alias("__isp__"),
        )
        .unionByName(
            probes.select(
                bkt.alias("__bkt__"), "__pos__",
                F.lit(None).cast(ring.schema["__rid__"].dataType).alias("__rid__"),
                F.col(anchor_col), F.col("__slot__").cast("int").alias("__slot__"),
                F.lit(1).alias("__isp__"),
            )
        )
    )
    w = (
        Window.partitionBy("__bkt__")
        .orderBy(F.desc("__pos__"), F.asc("__isp__"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("__next__", F.last("__rid__", ignorenulls=True).over(w))

    # wraparound: per-bucket first (smallest-pos) corpus id, then each
    # bucket's successor = the first id of the next non-empty bucket
    # (cyclic) — a 256-row table, windowed tiny, broadcast back
    firsts = ring.groupBy(bkt.alias("__bkt__")).agg(
        F.min_by("__rid__", "__pos__").alias("__first__")
    )
    # every hex bucket gets a row (a probe may land in a bucket with
    # no corpus ids at all); empty buckets inherit the next non-empty
    # bucket's first id via ignorenulls-first over the 256-row table
    spark = corpus.sparkSession
    buckets256 = spark.range(256).select(
        F.lpad(F.lower(F.conv(F.col("id").cast("string"), 10, 16)), 2, "0").alias(
            "__bkt__"
        )
    )
    all_bkts = buckets256.join(F.broadcast(firsts), on="__bkt__", how="left")
    w_succ = Window.orderBy(F.asc("__bkt__")).rowsBetween(1, Window.unboundedFollowing)
    glob_first = F.first("__first__", ignorenulls=True).over(
        Window.orderBy(F.asc("__bkt__")).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    succ = all_bkts.select(
        "__bkt__",
        F.coalesce(
            F.first("__first__", ignorenulls=True).over(w_succ), glob_first
        ).alias("__succ__"),
    )

    matched = (
        carried.filter(F.col("__isp__") == 1)
        .join(F.broadcast(succ), on="__bkt__", how="left")
        .select(
            anchor_col, "__slot__",
            F.coalesce("__next__", "__succ__").alias(id_col),
        )
    )
    if positives is not None:
        matched = matched.join(
            positives.select(anchor_col, id_col), on=[anchor_col, id_col],
            how="left_anti",
        )
    w_rank = Window.partitionBy(anchor_col).orderBy(F.asc("__slot__"))
    return (
        matched.withColumn("neg_rank", F.row_number().over(w_rank))
        .filter(F.col("neg_rank") <= k)
        .select(anchor_col, F.col("neg_rank").cast("int").alias("neg_rank"), id_col)
    )


def backtest_folds(
    df: DataFrame,
    ts_col: str,
    n_folds: int = 3,
    digits: int = 6,
) -> DataFrame:
    """Rolling-origin backtest splits for time-ordered data — the
    temporal cross-validation plain random k-fold gets WRONG on
    series (training on the future leaks). The observed [min, max]
    timespan divides into ``n_folds + 1`` equal slices; fold i trains
    on everything before cutoff i and tests on the next slice:

        train_i = ts <  c_i,   test_i = c_i <= ts < c_{i+1}

    Returns one summary row per fold:
    (fold, train_end, test_end, n_train, n_test) with epoch-second
    cutoffs — feed the bounds back as filters to materialize a fold.

    Scale shape: one 1-row min/max aggregate broadcast against the
    fact table, one explode over the ``n_folds``-element fold array,
    one group-count — the data shuffles once on the fold id, and
    cutoffs are pure arithmetic (no sampling, no window).
    """
    ts = F.col(ts_col).cast("timestamp").cast("long")
    bounds = df.agg(
        F.min(ts).alias("__lo__"), F.max(ts).alias("__hi__")
    )
    span = (F.col("__hi__") - F.col("__lo__")).cast("double")
    width = span / F.lit(float(n_folds + 1))
    folds = F.array(
        *[
            F.struct(
                F.lit(i).alias("fold"),
                # floor, not round: HALF_UP vs banker's rounding differs
                # across engines at exact .5 boundaries; floor is identical
                (F.col("__lo__") + F.floor(width * i).cast("long")).alias("c0"),
                (F.col("__lo__") + F.floor(width * (i + 1)).cast("long")).alias("c1"),
            )
            for i in range(1, n_folds + 1)
        ]
    )
    tagged = (
        df.select(ts.alias("__ts__"))
        .crossJoin(F.broadcast(bounds.select(F.explode(folds).alias("f"))))
        .select(
            F.col("f.fold").alias("fold"),
            F.col("f.c0").alias("train_end"),
            F.col("f.c1").alias("test_end"),
            F.when(F.col("__ts__") < F.col("f.c0"), F.lit("train"))
            .when(F.col("__ts__") < F.col("f.c1"), F.lit("test"))
            .alias("__role__"),
        )
    )
    return (
        tagged.groupBy("fold", "train_end", "test_end")
        .agg(
            F.sum((F.col("__role__") == "train").cast("long")).alias("n_train"),
            F.sum((F.col("__role__") == "test").cast("long")).alias("n_test"),
        )
        .select("fold", "train_end", "test_end", "n_train", "n_test")
    )


def balance_classes(
    df: DataFrame,
    label_col: str,
    id_col: str,
    seed: int = 42,
) -> DataFrame:
    """Deterministic class balancing: downsample every class to the
    SMALLEST class's size, keeping each class's md5-rank-lowest rows —
    the imbalanced-training fix (02-patient-trajectory.py:44-52 builds
    case/control cohorts by hand; this generalizes to any label) that
    stays reproducible across runs, partitionings, and engines
    (md5(seed:id) order, not rand()).

    Scale shape: one group-count for class sizes (broadcast 1-row min),
    one window PER CLASS (shuffle keyed by the label) ranking by the
    md5 position — never a global order; the filter keeps rank <=
    min_size.
    """
    sizes = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("__sz__"))
    min_size = sizes.agg(F.min("__sz__").alias("__min__"))
    pos = F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(label_col).orderBy(pos, F.col(id_col))
    return (
        df.withColumn("__rk__", F.row_number().over(w))
        .crossJoin(F.broadcast(min_size))
        .filter(F.col("__rk__") <= F.col("__min__"))
        .drop("__rk__", "__min__")
    )
