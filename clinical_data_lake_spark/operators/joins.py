"""Join operators (SURVEY.md §2.4 J1-J5 + semi).

Reference call sites rebuilt:
- J1 equi inner join, key-list form (3-table denormalization)
       00-etl-rwd.py:136-141; 02-patient-trajectory.py:58
- J2 expression-form join              01-rwe-dashboard.r:80-81
- J3 left outer + ifnull fill          01-rwe-dashboard.r:110
- J4 left anti (negative-control cohort) 02-patient-trajectory.py:73-79
- J5 crossJoin of a 1-row scalar       include/featurise.py:33

Scale notes: dimension sides get an explicit ``broadcast()`` hint where
the caller knows they're small (region/nation/organizations-class
tables); otherwise Catalyst+AQE picks broadcast vs sort-merge and splits
skewed partitions. The scalar cross-join is always broadcast — a 1-row
nested-loop over 100 TB would otherwise shuffle everything.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def join_on_keys(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """J1/J3 — USING-style equi join (00-etl-rwd.py:136-141)."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=list(keys), how=how)


def join_on_expr(left: DataFrame, right: DataFrame, cond: Column, how: str = "inner") -> DataFrame:
    """J2 — expression-form join (01-rwe-dashboard.r:80-81)."""
    return left.join(right, on=cond, how=how)


def denormalize(
    fact: DataFrame,
    dims: Sequence[tuple[DataFrame, Sequence[str], bool]],
) -> DataFrame:
    """Chained multi-way denormalization (the reference's
    ``patient_encounters`` build, 00-etl-rwd.py:136-141).

    ``dims`` is ``[(dim_df, keys, broadcast?), ...]``. Catalyst reorders
    inner joins; explicit broadcast hints keep small dims off the shuffle.
    """
    out = fact
    for dim, keys, bcast in dims:
        out = join_on_keys(out, dim, keys, "inner", broadcast_right=bcast)
    return out


def anti_join(left: DataFrame, right: DataFrame, cond: Column | Sequence[str]) -> DataFrame:
    """J4 — rows of ``left`` with no match (negative-control cohort,
    02-patient-trajectory.py:73-79)."""
    on = cond if isinstance(cond, Column) else list(cond)
    return left.join(right, on=on, how="left_anti")


def semi_join(left: DataFrame, right: DataFrame, cond: Column | Sequence[str]) -> DataFrame:
    """left-semi — anti's dual (not in the reference; completes the set)."""
    on = cond if isinstance(cond, Column) else list(cond)
    return left.join(right, on=on, how="left_semi")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: Sequence[str],
    tolerance_s: int | None = None,
) -> DataFrame:
    """As-of join: each left row picks up the LATEST right row of the
    same key with ``right_ts <= left_ts`` (inclusive). Spark has no
    native operator; this is the composition form:

        tag both sides -> union -> per-key window sorted by
        (ts, side) -> last(ignorenulls) carries the most recent right
        values forward -> keep left rows.

    One shuffle on the key, one sort — the same cost as a sort-merge
    join, with no range-condition explosion (a naive
    ``left.join(right, ts_r <= ts_l)`` is O(|matches|) per key pair and
    degenerates to cross-join-per-key at scale). Right rows sort BEFORE
    left rows at equal timestamps, giving the inclusive <= semantic.

    CALLER CONTRACT: ``right`` must be unique per (key, right_ts) —
    pre-aggregate or rank-dedupe ties first, else "latest" is
    ill-defined (and engines disagree). Left rows with no prior right
    row emit nulls.

    ``tolerance_s`` is the pandas ``merge_asof(tolerance=...)``
    staleness bound: a match older than that many seconds before the
    left timestamp emits nulls instead (the left row itself is kept) —
    a carried vital/price from last year should not decorate today's
    event. Implemented by carrying the matched right timestamp in the
    same struct; no extra shuffle.
    """
    from pyspark.sql import Window

    lcols = left.columns
    l_tagged = left.select(
        F.col(key).alias("__k__"),
        F.col(left_ts).cast("timestamp").alias("__ts__"),
        F.lit(1).alias("__side__"),
        F.struct(*lcols).alias("__lrow__"),
        F.lit(None).cast(
            "struct<__rts__: timestamp, " + ", ".join(
                f"{c}: {right.schema[c].dataType.simpleString()}" for c in right_value_cols
            ) + ">"
        ).alias("__rval__"),
    )
    r_tagged = right.select(
        F.col(key).alias("__k__"),
        F.col(right_ts).cast("timestamp").alias("__ts__"),
        F.lit(0).alias("__side__"),
        F.lit(None).cast(l_tagged.schema["__lrow__"].dataType.simpleString()).alias("__lrow__"),
        F.struct(
            F.col(right_ts).cast("timestamp").alias("__rts__"), *right_value_cols
        ).alias("__rval__"),
    )
    u = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("__k__")
        .orderBy("__ts__", "__side__")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "__side__", "__lrow__", "__ts__",
        F.last("__rval__", ignorenulls=True).over(w).alias("__rmatch__"),
    )
    if tolerance_s is None:
        rcols = [F.col(f"__rmatch__.{c}").alias(c) for c in right_value_cols]
    else:
        fresh = F.col("__rmatch__.__rts__") >= (
            F.col("__ts__") - F.expr(f"INTERVAL {int(tolerance_s)} SECONDS")
        )
        rcols = [
            F.when(fresh, F.col(f"__rmatch__.{c}")).alias(c)
            for c in right_value_cols
        ]
    out = carried.filter(F.col("__side__") == 1).select(
        *[F.col(f"__lrow__.{c}").alias(c) for c in lcols], *rcols
    )
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
) -> DataFrame:
    """Point-in-interval join (custom operator): rows of ``points``
    matched to every interval containing them.

    Spark plans a naive ``p BETWEEN s AND e`` join as a broadcast
    nested loop — O(|points| x |intervals|) at any scale. Binned
    restatement: each point lands in exactly ONE width-``bucket_width``
    bucket; each interval explodes to every bucket it overlaps; an
    equi-join on the bucket id + the exact containment filter gives the
    same pairs with a hash-shuffle plan. No dedup needed — a (point,
    interval) pair can only meet in the point's single bucket.

    Pick ``bucket_width`` near the typical interval length: each
    interval then explodes to ~2 buckets (cost ~2x interval count),
    and a bucket's candidates are the intervals overlapping it, not
    the whole table.
    """
    p = points.withColumn(
        "__bkt__", F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long")
    )
    i = intervals.withColumn(
        "__bkt__",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(bucket_width)).cast("long"),
                F.floor(F.col(end_col) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    return (
        p.join(i, on="__bkt__")
        .filter((F.col(point_col) >= F.col(start_col)) & (F.col(point_col) <= F.col(end_col)))
        .drop("__bkt__")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: float,
) -> DataFrame:
    """Interval-overlap join (custom operator): pairs whose
    [start, end] ranges intersect — ``ls <= re AND rs <= le``.

    Same binning idea as ``range_join`` but both sides explode to the
    buckets they span, so a pair can meet in several buckets; crediting
    the match to ONE canonical bucket (the bucket of the overlap
    region's start = max of the two starts) removes duplicates with a
    filter instead of a dropDuplicates shuffle. Plan: explode both
    sides (~len/width rows each), hash-join on bucket, exact overlap +
    canonical-bucket filter. Linear in input + output; no nested loop.
    """
    lb = left.withColumn(
        "__bkt__",
        F.explode(
            F.sequence(
                F.floor(F.col(left_start) / F.lit(bucket_width)).cast("long"),
                F.floor(F.col(left_end) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    rb = right.withColumn(
        "__bkt__",
        F.explode(
            F.sequence(
                F.floor(F.col(right_start) / F.lit(bucket_width)).cast("long"),
                F.floor(F.col(right_end) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    overlap_start_bkt = F.floor(
        F.greatest(F.col(left_start), F.col(right_start)) / F.lit(bucket_width)
    ).cast("long")
    return (
        lb.join(rb, on="__bkt__")
        .filter(
            (F.col(left_start) <= F.col(right_end))
            & (F.col(right_start) <= F.col(left_end))
            & (F.col("__bkt__") == overlap_start_bkt)
        )
        .drop("__bkt__")
    )


def with_global_scalar(df: DataFrame, scalar_df: DataFrame) -> DataFrame:
    """J5 — attach a 1-row aggregate to every row
    (include/featurise.py:33 crossJoin of the global min date).

    Always broadcast: the scalar side is one row by construction, and a
    broadcast nested-loop join is shuffle-free at any fact-table scale.
    """
    return df.crossJoin(F.broadcast(scalar_df))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigation equi-join: spread a hot join key over ``salt``
    reducers. Left rows get a salt in [0, salt); the right side (the
    small one — a dim table that would otherwise pile onto the hot
    key's single reducer) is replicated once per salt value; the join
    key becomes (on..., salt). The result is row-identical to the
    plain join — salting only changes the shuffle routing, which is
    why AQE's skew-join splitting can't always replace it: AQE splits
    oversized *partitions* after the fact, salting prevents the
    pile-up when one KEY alone exceeds a task (the agg-side analog is
    ``aggregates.salted_group_count``).

    Only ``inner``, ``left``, ``left_semi`` and ``left_anti`` are
    salt-safe (each left row carries exactly one salt, so it matches
    at most one right replica set). A right/full outer join would
    emit unmatched right rows once per salt value — rejected.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti"}
    if how not in allowed:
        raise ValueError(f"salted_join supports {sorted(allowed)}, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    # any routing works (the salt never reaches the output); hashing the
    # key columns plus a per-row id keeps hot-key rows spread evenly
    row_salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in keys], F.monotonically_increasing_id()),
        F.lit(salt),
    )
    l = left.withColumn("__salt__", row_salt.cast("int"))
    r = right.withColumn(
        "__salt__", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return l.join(r, on=keys + ["__salt__"], how=how).drop("__salt__")


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 2,
    block_prefix: int = 0,
    dist_alias: str = "edit_dist",
) -> DataFrame:
    """Edit-distance (fuzzy) join: every (left, right) pair whose
    Levenshtein distance on (``left_col``, ``right_col``) is at most
    ``max_dist`` — the entity-resolution primitive behind linking
    free-text clinical descriptions / drug names across sources, where
    the reference joins only on exact codes (00-etl-rwd.py:136-141).

    Exact length-band blocking replaces the nested loop:
    ``lev(a, b) <= d`` implies ``|len(a) - len(b)| <= d``, so with band
    width ``d + 1`` every qualifying pair shares one of at most three
    adjacent bands (a run of ``2d + 1`` consecutive lengths can straddle
    two band boundaries). The right side lands in its single band
    ``floor(len/(d+1))``; the left side is replicated to the (<= 3)
    bands covering ``[len-d, len+d]``. The join is then a
    plain equi shuffle on the band key and only same-band candidates
    reach the Levenshtein filter — no candidate is ever lost, and the
    candidate count is the sum of band-size products instead of
    |L| x |R|. ``F.levenshtein(..., threshold)`` early-aborts the DP
    above ``max_dist`` (banded O(d*n) instead of O(n^2) per pair).

    ``block_prefix > 0`` additionally requires the first k lowercase
    characters to agree — the classic approximate blocking key for
    name data. That is a recall trade (pairs differing inside the
    prefix are not emitted) and is OFF by default; the length bands
    alone keep the operator exact.

    Column names must be disjoint across the two inputs (rename before
    calling, as with Spark's own join). Output: left columns + right
    columns + ``dist_alias`` (int).
    """
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    w = max_dist + 1
    lo_band = F.floor((F.length(left_col) - max_dist) / w)
    hi_band = F.floor((F.length(left_col) + max_dist) / w)
    l = left.withColumn("__band__", F.explode(F.sequence(lo_band, hi_band)))
    r = right.withColumn("__band__", F.floor(F.length(right_col) / w))
    if block_prefix > 0:
        l = l.withColumn("__blk__", F.lower(F.substring(left_col, 1, block_prefix)))
        r = r.withColumn("__blk__", F.lower(F.substring(right_col, 1, block_prefix)))
        on = ["__band__", "__blk__"]
    else:
        on = ["__band__"]
    # threshold form returns -1 when the distance exceeds max_dist, so
    # one banded-DP evaluation both filters and yields the distance
    dist = F.levenshtein(F.col(left_col), F.col(right_col), max_dist)
    return (
        l.join(r, on=on)
        .withColumn(dist_alias, dist)
        .filter(F.col(dist_alias) >= 0)
        .drop(*on)
    )


def fs_match_score(
    pairs: DataFrame,
    field_params: Mapping[str, tuple[Column, float, float]],
    threshold: float | None = None,
    digits: int = 6,
) -> DataFrame:
    """Fellegi–Sunter record-linkage scoring — the probabilistic stage
    that turns candidate pairs (from ``fuzzy_join`` / sorted-
    neighborhood / LSH blocking) into ranked match decisions:

        score = sum_fields  log2(m_f / u_f)          if field agrees
                            log2((1-m_f) / (1-u_f))  otherwise

    ``field_params``: field name -> (agreement Column over the pair
    row, m, u) with m = P(agree | match), u = P(agree | non-match).
    NULL agreement counts as disagreement (three-valued logic made
    explicit). Emits per-field agreement flags, the total ``score``,
    and ``is_match`` when ``threshold`` is given.

    The log-weights are driver-side Python constants folded into one
    projection — no shuffle, no UDF; the expensive part of linkage is
    the blocking that produced ``pairs``, not this scoring pass.
    """
    import math

    out = pairs
    score = None
    for name, (agree_col, m, u) in field_params.items():
        if not (0.0 < m < 1.0 and 0.0 < u < 1.0):
            raise ValueError(f"m/u for {name!r} must be in (0, 1)")
        flag = F.coalesce(agree_col, F.lit(False))
        out = out.withColumn(f"agree_{name}", flag)
        w_a = math.log2(m / u)
        w_d = math.log2((1.0 - m) / (1.0 - u))
        term = F.when(F.col(f"agree_{name}"), F.lit(w_a)).otherwise(F.lit(w_d))
        score = term if score is None else score + term
    out = out.withColumn("score", F.round(score, digits))
    if threshold is not None:
        out = out.withColumn("is_match", F.col("score") >= F.lit(threshold))
    return out


def nearest_asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: Sequence[str],
) -> DataFrame:
    """Nearest-match as-of join (pandas ``merge_asof
    (direction='nearest')``): each left row picks the right row of the
    same key whose timestamp is CLOSEST — before or after — with ties
    (equidistant) resolved to the earlier (backward) match,
    deterministic. The sensor-alignment sibling of ``asof_join``
    (which only looks backward).

    Same single-shuffle composition as ``asof_join``: both sides tag
    and union, and the backward carry (last right value up to the
    row) and the forward carry (first right value after it) ride the
    SAME per-key window sort — one Exchange, one sort, two Window
    frames. Right rows sort before left at equal timestamps, so an
    exact-timestamp match is the backward candidate at distance 0.
    Caller contract as asof_join: right unique per (key, right_ts).
    Adds ``matched_ts`` (the chosen right timestamp) alongside the
    value columns; left rows with no right rows at all emit nulls.
    """
    from pyspark.sql import Window

    lcols = left.columns
    rstruct_type = (
        "struct<__rts__: timestamp, "
        + ", ".join(
            f"{c}: {right.schema[c].dataType.simpleString()}" for c in right_value_cols
        )
        + ">"
    )
    l_tagged = left.select(
        F.col(key).alias("__k__"),
        F.col(left_ts).cast("timestamp").alias("__ts__"),
        F.lit(1).alias("__side__"),
        F.struct(*lcols).alias("__lrow__"),
        F.lit(None).cast(rstruct_type).alias("__rval__"),
    )
    r_tagged = right.select(
        F.col(key).alias("__k__"),
        F.col(right_ts).cast("timestamp").alias("__ts__"),
        F.lit(0).alias("__side__"),
        F.lit(None).cast(l_tagged.schema["__lrow__"].dataType.simpleString()).alias("__lrow__"),
        F.struct(
            F.col(right_ts).cast("timestamp").alias("__rts__"), *right_value_cols
        ).alias("__rval__"),
    )
    u = l_tagged.unionByName(r_tagged)
    order = [F.col("__ts__"), F.col("__side__")]
    w_back = (
        Window.partitionBy("__k__").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("__k__").orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = u.select(
        "__side__", "__lrow__", "__ts__",
        F.last("__rval__", ignorenulls=True).over(w_back).alias("__b__"),
        F.first("__rval__", ignorenulls=True).over(w_fwd).alias("__f__"),
    )
    bts, fts = F.col("__b__.__rts__"), F.col("__f__.__rts__")
    lts = F.col("__ts__")
    back_wins = F.col("__f__").isNull() | (
        F.col("__b__").isNotNull()
        & ((lts.cast("double") - bts.cast("double"))
           <= (fts.cast("double") - lts.cast("double")))
    )
    chosen = F.when(back_wins, F.col("__b__")).otherwise(F.col("__f__"))
    out = carried.filter(F.col("__side__") == 1).select(
        *[F.col(f"__lrow__.{c}").alias(c) for c in lcols],
        chosen["__rts__"].alias("matched_ts"),
        *[chosen[c].alias(c) for c in right_value_cols],
    )
    return out


def fs_pattern_counts(
    pairs: DataFrame,
    agreement_cols: Mapping[str, Column],
) -> DataFrame:
    """Agreement-pattern frequency table for Fellegi-Sunter parameter
    estimation: one boolean column per comparison field (NULL counts
    as disagreement), grouped and counted. At most 2^k rows regardless
    of pair volume — the bounded summary EM runs on. Oracle-twinned
    standalone; ``fs_em_weights`` consumes it."""
    flags = [
        F.coalesce(col, F.lit(False)).alias(f"agree_{name}")
        for name, col in agreement_cols.items()
    ]
    return (
        pairs.select(*flags)
        .groupBy(*[f"agree_{name}" for name in agreement_cols])
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


def fs_em_weights(
    pairs: DataFrame,
    agreement_cols: Mapping[str, Column],
    max_iter: int = 25,
    init_p: float = 0.1,
    init_m: float = 0.9,
    init_u: float = 0.1,
    digits: int = 6,
) -> DataFrame:
    """EM-estimated Fellegi-Sunter m/u probabilities (Winkler 1988):
    learn, UNSUPERVISED, each comparison field's P(agree | match) and
    P(agree | non-match) from the candidate pairs themselves, instead
    of hand-picking them for ``fs_match_score``. Two-class latent
    mixture over agreement patterns, fitted with a fixed number of EM
    iterations (deterministic given the fixed init — no RNG).

    Scale shape: the corpus-side work is ONE groupBy producing the
    <= 2^k-row pattern table (``fs_pattern_counts``); EM itself runs
    driver-side on that bounded summary — the only collect is 2^k
    rows, independent of pair volume. k is capped at 12 to keep that
    claim honest.

    Returns one row per field: (field, m, u, w_agree, w_disagree) —
    the log2 weights ``fs_match_score`` consumes — plus a final row
    ('__p_match__', p, NULL, NULL, NULL) with the estimated match
    prevalence.
    """
    import math

    names = list(agreement_cols)
    if len(names) > 12:
        raise ValueError("fs_em_weights: more than 12 comparison fields")
    rows = fs_pattern_counts(pairs, agreement_cols).collect()
    patterns = [
        (tuple(1 if r[f"agree_{n}"] else 0 for n in names), int(r["n_pairs"]))
        for r in rows
    ]
    total = sum(c for _, c in patterns) or 1
    p = float(init_p)
    m = [float(init_m)] * len(names)
    u = [float(init_u)] * len(names)
    for _ in range(max_iter):
        num_p = 0.0
        m_num = [0.0] * len(names)
        u_num = [0.0] * len(names)
        w_sum = 0.0
        for gamma, c in patterns:
            pm = p
            pu = 1.0 - p
            for i, g in enumerate(gamma):
                pm *= m[i] if g else (1.0 - m[i])
                pu *= u[i] if g else (1.0 - u[i])
            w = pm / (pm + pu) if (pm + pu) > 0 else 0.0
            num_p += c * w
            w_sum += c * w
            for i, g in enumerate(gamma):
                if g:
                    m_num[i] += c * w
                    u_num[i] += c * (1.0 - w)
        p = min(max(num_p / total, 1e-9), 1.0 - 1e-9)
        uw_sum = total - w_sum
        for i in range(len(names)):
            m[i] = min(max(m_num[i] / w_sum if w_sum > 0 else init_m, 1e-6), 1 - 1e-6)
            u[i] = min(max(u_num[i] / uw_sum if uw_sum > 0 else init_u, 1e-6), 1 - 1e-6)
    spark = pairs.sparkSession
    out = [
        (
            n,
            round(m[i], digits),
            round(u[i], digits),
            round(math.log2(m[i] / u[i]), digits),
            round(math.log2((1.0 - m[i]) / (1.0 - u[i])), digits),
        )
        for i, n in enumerate(names)
    ] + [("__p_match__", round(p, digits), None, None, None)]
    return spark.createDataFrame(
        out, "field string, m double, u double, w_agree double, w_disagree double"
    )


def grid_nearest_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    x_col: str = "x",
    y_col: str = "y",
    radius: float = 1.0,
    digits: int = 9,
) -> DataFrame:
    """Bounded-radius nearest-neighbor SPATIAL join on planar
    coordinates: for each left point, the single closest right point
    within ``radius`` (squared-Euclidean metric; for lat/lon at city
    scale use an equirectangular projection upstream — the metric
    stays pure arithmetic, so the operator is exactly replayable; a
    haversine variant would only reorder near-ties at these scales).

    Never a cross join: both sides bucket into a ``radius``-sized
    grid, left cells explode to their 3x3 neighbor ring (9 rows per
    left point, a constant), and candidates meet in an EQUI join on
    the cell key — the standard distributed spatial-join plan
    (points-in-cells + halo). A right point within ``radius`` is
    always inside the ring, so the bounded-radius semantics are
    LOSSLESS; per-left argmin via one min(struct(d2, right_id))
    aggregate (deterministic id tie-break), no window over candidate
    rows. Left points with no right point in range are absent from
    the output (the caller left-joins back if needed).

    Scale shape: two scans, one equi-join shuffling on cell keys
    (candidate volume = ring density, not n_left x n_right), one
    groupBy on the left id. Skewed cells (urban cores) spread via the
    usual salting upstream if needed.
    """
    if radius <= 0:
        raise ValueError("radius must be positive")
    r = float(radius)
    lx, ly = F.col(x_col).cast("double"), F.col(y_col).cast("double")
    l_pts = left.select(
        F.col(left_id).alias("__lid__"),
        lx.alias("__lx__"),
        ly.alias("__ly__"),
        F.floor(lx / r).cast("long").alias("__cx__"),
        F.floor(ly / r).cast("long").alias("__cy__"),
    )
    ring = F.array(*[F.lit(i) for i in (-1, 0, 1)])
    l_cells = (
        l_pts.select(
            "__lid__", "__lx__", "__ly__",
            F.explode(ring).alias("__dx__"), "__cx__", "__cy__",
        )
        .select(
            "__lid__", "__lx__", "__ly__",
            (F.col("__cx__") + F.col("__dx__")).alias("__cx__"),
            F.explode(ring).alias("__dy__"),
            "__cy__",
        )
        .select(
            "__lid__", "__lx__", "__ly__",
            "__cx__",
            (F.col("__cy__") + F.col("__dy__")).alias("__cy__"),
        )
    )
    rx, ry = F.col(x_col).cast("double"), F.col(y_col).cast("double")
    r_pts = right.select(
        F.col(right_id).alias("__rid__"),
        rx.alias("__rx__"),
        ry.alias("__ry__"),
        F.floor(rx / r).cast("long").alias("__cx__"),
        F.floor(ry / r).cast("long").alias("__cy__"),
    )
    d2 = (
        (F.col("__lx__") - F.col("__rx__"))
        * (F.col("__lx__") - F.col("__rx__"))
        + (F.col("__ly__") - F.col("__ry__"))
        * (F.col("__ly__") - F.col("__ry__"))
    )
    cand = (
        l_cells.join(r_pts, on=["__cx__", "__cy__"])
        .select(
            "__lid__",
            "__rid__",
            F.round(d2, digits).alias("__d2__"),
        )
        .filter(F.col("__d2__") <= F.lit(r * r))
    )
    best = cand.groupBy("__lid__").agg(
        F.min(F.struct(F.col("__d2__"), F.col("__rid__"))).alias("__b__")
    )
    return best.select(
        F.col("__lid__").alias(left_id),
        F.col("__b__.__rid__").alias(right_id),
        (F.col("__b__.__d2__") + F.lit(0.0)).alias("dist_sq"),
    )
