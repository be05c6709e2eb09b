"""CDC / MERGE-style change application without Delta.

The reference leans on Delta Lake for upserts (00-etl-rwd.py's
overwrite dance; OPTIMIZE in catalog.py); this module provides the
MERGE INTO semantics as pure DataFrame algebra for plain-parquet
deployments: given a base snapshot and a change feed of upserts and
deletes with a monotonic sequence column, produce the post-apply
state — highest-sequence change per key wins, a winning delete
removes the key, untouched snapshot rows pass through.

100 TB shape: the snapshot — by far the big side — is NEVER windowed
and never shuffled. Conflict resolution (the row_number window) runs
on the change feed only; the snapshot is filtered with one anti-join
against the distinct changed keys (broadcast by AQE when the feed is
small, the overwhelmingly common case) and unioned with the winning
upserts. Cost: one window over |changes| + one join pass over the
snapshot scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: list[str] | str,
    seq_col: str = "seq",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply a change feed to a snapshot; returns the new snapshot
    (same schema as ``snapshot``).

    ``changes`` must carry the snapshot's columns plus ``seq_col``
    (monotonic version — later wins) and ``op_col`` (``delete_op``
    deletes the key; anything else upserts). Ties on ``seq_col``
    within a key are broken deterministically by ``op_col`` descending
    (an upsert and a delete with the same sequence resolve to the
    upsert — 'U' > 'D') so replays are reproducible.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    w = Window.partitionBy(*key_list).orderBy(
        F.col(seq_col).desc(), F.col(op_col).desc()
    )
    winners = (
        changes.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )
    changed_keys = winners.select(*key_list)
    kept = snapshot.join(changed_keys, on=key_list, how="left_anti")
    upserts = winners.filter(F.col(op_col) != delete_op).select(*snapshot.columns)
    return kept.unionByName(upserts)


def merge_into(
    target: DataFrame,
    source: DataFrame,
    keys: list[str] | str,
    update_cols: list[str] | None = None,
    update_condition=None,
    delete_condition=None,
    insert: bool = True,
) -> DataFrame:
    """Delta-Lake-``MERGE INTO``-shaped upsert on plain DataFrames /
    parquet: condition-driven WHEN MATCHED UPDATE / WHEN MATCHED
    DELETE / WHEN NOT MATCHED INSERT, without an op/sequence column
    (``apply_changes`` is the CDC-feed sibling; this is the shape a
    Delta user writes by hand). Returns the post-merge snapshot with
    the target's schema.

    Semantics (Delta MERGE with one clause of each kind):
    - matched and ``delete_condition``            -> row removed;
    - matched and ``update_condition`` (default
      always) -> target row with ``update_cols`` (default: every
      non-key target column present in the source) replaced by the
      source's values;
    - matched otherwise                            -> target row kept;
    - source-only                                  -> inserted when
      ``insert`` (source must carry the target's columns);
    - target-only                                  -> kept.
    Conditions are Columns over the aliases ``tgt`` / ``src``
    (``F.col("src.o_totalprice") < 0``), exactly how Delta MERGE
    conditions reference the two sides.

    Like Delta, a source with MULTIPLE rows per key is an error (the
    merge would be ambiguous): enforced IN-PLAN — per-key source
    counts ride the merge join's own source input on the same key
    shuffle (no pre-flight job), and a duplicate key fails loudly by
    name via ``raise_error``.

    100 TB shape: ONE full-outer shuffle join on the merge keys — the
    canonical distributed MERGE plan (AQE broadcasts the source side
    when it is small, the common case); per-row clause resolution is
    pure projection. No windows, no second pass over the target.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    if update_cols is None:
        update_cols = [
            c for c in target.columns
            if c not in key_list and c in source.columns
        ]
    upd_set = set(update_cols)

    guard_msg = F.concat(
        F.lit(
            "merge_into: multiple source rows match the same key "
            "(ambiguous merge, the Delta MERGE error contract); "
            "deduplicate the source first; offending key: "
        ),
        F.concat_ws("/", *[F.col(k).cast("string") for k in key_list]),
    )
    # per-key count as a key-partitioned window over the source (the
    # SMALL side): null-safe (NULL keys form their own group, unlike a
    # count-table equi-join back, which would silently drop them) and
    # join-free — the guard rides the source's own shuffle
    wcnt = Window.partitionBy(*key_list)
    # a source row with ANY null key can never equi-match a target
    # row, so duplicates among such rows are plain multiple inserts,
    # not ambiguity — only fully-keyed duplicates are errors
    all_nn = None
    for k in key_list:
        nn = F.col(k).isNotNull()
        all_nn = nn if all_nn is None else (all_nn & nn)
    src_g = (
        source.withColumn("__sn__", F.count(F.lit(1)).over(wcnt))
        .select(
            F.when((F.col("__sn__") == 1) | ~all_nn, F.col(key_list[0]))
            .otherwise(F.raise_error(guard_msg))
            .alias(key_list[0]),
            *[F.col(c) for c in source.columns if c != key_list[0]],
        )
        .withColumn("__s__", F.lit(1))
    )
    t = target.withColumn("__t__", F.lit(1)).alias("tgt")
    s = src_g.alias("src")
    cond = None
    for k in key_list:
        c = F.col(f"tgt.{k}") == F.col(f"src.{k}")
        cond = c if cond is None else (cond & c)
    j = t.join(s, cond, "full_outer")

    matched = F.col("tgt.__t__").isNotNull() & F.col("src.__s__").isNotNull()
    upd = update_condition if update_condition is not None else F.lit(True)
    dele = delete_condition if delete_condition is not None else F.lit(False)

    keep = F.when(matched, ~dele).when(
        F.col("src.__s__").isNotNull(), F.lit(insert)
    ).otherwise(F.lit(True))

    out_cols = []
    for c in target.columns:
        tv, sv = F.col(f"tgt.{c}"), (
            F.col(f"src.{c}") if c in source.columns else None
        )
        if c in key_list:
            out_cols.append(F.coalesce(tv, sv).alias(c))
        elif sv is not None:
            expr = (
                F.when(F.col("tgt.__t__").isNull(), sv)  # insert row
                .when(matched & upd & F.lit(c in upd_set), sv)
                .otherwise(tv)
            )
            out_cols.append(expr.alias(c))
        else:
            out_cols.append(tv.alias(c))
    return j.filter(keep).select(*out_cols)


def scd2_build(
    changes: DataFrame,
    keys: list[str] | str,
    attr_cols: list[str],
    ts_col: str = "ts",
    seq_col: str | None = None,
) -> DataFrame:
    """Build a slowly-changing-dimension Type 2 table from a change
    feed: one validity interval per *distinct consecutive attribute
    version* per key, with ``valid_from`` / ``valid_to`` / ``is_current``.

    The warehouse counterpart of the reference's overwrite-style
    dimension refresh (00-etl-rwd.py:136-141): instead of keeping only
    the latest row per key, history is preserved as half-open
    intervals [valid_from, valid_to) — the shape ``scd2_lookup`` (and
    any as-of join) consumes.

    Semantics: rows are ordered per key by (``ts_col``, ``seq_col``);
    consecutive rows whose ``attr_cols`` are unchanged are compacted
    into the earlier row's interval (change-only compaction, null-safe
    comparison), so re-delivering an unchanged snapshot never splits
    an interval. ``valid_to`` is the next *changed* version's
    ``valid_from``; NULL on the open (current) interval.

    100 TB shape: one shuffle on the key columns; the compaction lag
    and the closing lead reuse the SAME (key, order) window
    partitioning, so Spark plans a single Exchange and two Window
    nodes over it. No join, no broadcast, no second pass.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    order = [F.col(ts_col).asc()] + ([F.col(seq_col).asc()] if seq_col else [])
    w = Window.partitionBy(*key_list).orderBy(*order)
    ver = F.struct(*[F.col(c) for c in attr_cols])
    changed = (
        changes.withColumn("__prev__", F.lag(ver).over(w))
        .filter(F.col("__prev__").isNull() | ~ver.eqNullSafe(F.col("__prev__")))
        .drop("__prev__")
    )
    w2 = Window.partitionBy(*key_list).orderBy(*order)
    out = changed.select(
        *key_list,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w2).alias("valid_to"),
    )
    return out.withColumn("is_current", F.col("valid_to").isNull())


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    keys: list[str] | str,
    fact_ts: str = "ts",
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Point-in-time enrichment against an SCD2 dimension: each fact
    row picks the dimension version whose [valid_from, valid_to)
    interval contains ``fact_ts``.

    Plan: an equi-join on the key columns carrying the interval
    predicate as a join condition — fan-out is bounded by versions per
    key. ``broadcast_dim=True`` (default) hints the dimension side for
    broadcast — correct for the usual executor-memory-sized dimension
    (one row per attribute change). On HIGH-CHURN feeds where the SCD2
    dim approaches change-feed scale, pass ``broadcast_dim=False`` so
    the forced broadcast can't OOM the executors and AQE picks the
    strategy (shuffle join on the keys) from runtime stats; the fact
    table then shuffles once on the key columns.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    f, d = facts.alias("__f__"), dim.alias("__d__")
    cond = None
    for k in key_list:
        c = F.col(f"__f__.{k}") == F.col(f"__d__.{k}")
        cond = c if cond is None else (cond & c)
    ts = F.col(f"__f__.{fact_ts}")
    cond = (
        cond
        & (ts >= F.col("__d__.valid_from"))
        & (F.col("__d__.valid_to").isNull() | (ts < F.col("__d__.valid_to")))
    )
    dim_cols = [c for c in dim.columns if c not in key_list]
    joined = f.join(F.broadcast(d) if broadcast_dim else d, cond, how)
    return joined.select("__f__.*", *[F.col(f"__d__.{c}") for c in dim_cols])


def incremental_agg(
    snapshot: DataFrame,
    changes: DataFrame,
    agg_snapshot: DataFrame,
    group_cols: list[str],
    value_col: str,
    keys: list[str] | str,
    seq_col: str = "seq",
    op_col: str = "op",
    delete_op: str = "D",
    cnt_col: str = "cnt",
    sum_col: str = "sum_value",
) -> DataFrame:
    """Maintain a per-group (count, sum) aggregate under a change feed
    WITHOUT rescanning the fact table: retract the touched keys' old
    contributions, add their post-merge contributions, and patch the
    existing aggregate — the materialized-view maintenance pass that
    turns a full 100 TB re-aggregation into work proportional to
    |changes|.

    ``agg_snapshot`` must be the (group_cols..., cnt, sum_value)
    aggregate of ``snapshot`` (decimal-exact sums, as
    ``q_agg_groupcount``-style rollups produce). Returns the new
    aggregate in the same shape, dropping groups whose count reaches
    zero.

    Plan: the change feed resolves winners (window over |changes|);
    the snapshot contributes ONLY its touched-key rows via one
    semi-join (broadcast under AQE when the feed is small — the
    overwhelmingly common case); the delta is a two-sided union
    aggregated on the group keys; the old aggregate is patched with
    one outer join on the (low-cardinality) group keys. The fact
    table is scanned once, filtered to touched keys — never
    re-aggregated.

    Exactness: retraction arithmetic is decimal (the same
    decimal(18,3) accumulation the certified rollups use) so
    retract-then-add reproduces the direct aggregate bit-for-bit —
    which is exactly what the oracle checks (incremental Spark result
    vs DuckDB's direct aggregate of the post-merge snapshot).
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    w = Window.partitionBy(*key_list).orderBy(
        F.col(seq_col).desc(), F.col(op_col).desc()
    )
    winners = (
        changes.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )
    touched = winners.select(*key_list).distinct()
    old_rows = snapshot.join(touched, on=key_list, how="left_semi")
    new_rows = apply_changes(old_rows, changes, keys, seq_col, op_col, delete_op)
    dv = F.col(value_col).cast("decimal(18,3)")
    neg = old_rows.groupBy(*group_cols).agg(
        (-F.count(F.lit(1))).alias("__dc__"),
        (-F.sum(dv)).alias("__ds__"),
    )
    pos = new_rows.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__dc__"),
        F.sum(dv).alias("__ds__"),
    )
    delta = (
        neg.unionByName(pos)
        .groupBy(*group_cols)
        .agg(F.sum("__dc__").alias("__dc__"), F.sum("__ds__").alias("__ds__"))
    )
    zero_s = F.lit(0).cast("decimal(18,3)")
    merged = agg_snapshot.select(
        *group_cols,
        F.col(cnt_col).alias("__c0__"),
        F.col(sum_col).cast("decimal(18,3)").alias("__s0__"),
    ).join(delta, on=group_cols, how="full_outer")
    cnt = F.coalesce("__c0__", F.lit(0).cast("long")) + F.coalesce(
        F.col("__dc__"), F.lit(0).cast("long")
    )
    ssum = F.coalesce("__s0__", zero_s) + F.coalesce(F.col("__ds__").cast("decimal(18,3)"), zero_s)
    return (
        merged.select(
            *group_cols,
            cnt.cast("long").alias(cnt_col),
            ssum.cast("double").alias(sum_col),
        )
        .filter(F.col(cnt_col) > 0)
    )


def snapshot_changes(
    old: DataFrame,
    new: DataFrame,
    keys: list[str] | str,
    compare_cols: list[str] | None = None,
    op_col: str = "op",
) -> DataFrame:
    """Derive the row-level change feed that turns snapshot ``old``
    into snapshot ``new`` — the INVERSE of ``apply_changes`` (and the
    CDC-generation step for sources that only publish full snapshots):

        op = 'I'  key only in new          (new values)
        op = 'U'  key in both, any compared column differs (new values)
        op = 'D'  key only in old          (old values)

    Unchanged keys emit nothing, so the feed size tracks the actual
    churn, not the table. Round-trip law (pinned by a property test):
    ``apply_changes(old, snapshot_changes(old, new) + seq) == new``.

    NULL-safe comparison (NULL -> value and value -> NULL both count
    as changes; NULL == NULL does not). One full-outer shuffle join on
    the keys — the same single-pass shape as ``table_diff``, emitting
    rows instead of counts.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in key_list]
    cmp_list = [c for c in compare_cols if c not in key_list]

    o = old.select(
        *key_list,
        F.lit(1).alias("__po__"),
        *[F.col(c).alias(f"__o_{c}__") for c in cmp_list],
    )
    n = new.select(
        *key_list,
        F.lit(1).alias("__pn__"),
        *[F.col(c).alias(f"__n_{c}__") for c in cmp_list],
    )
    j = o.join(n, on=key_list, how="full_outer")
    in_o, in_n = F.col("__po__").isNotNull(), F.col("__pn__").isNotNull()
    differs = None
    for c in cmp_list:
        d = ~F.col(f"__o_{c}__").eqNullSafe(F.col(f"__n_{c}__"))
        differs = d if differs is None else (differs | d)
    op = (
        F.when(in_n & ~in_o, F.lit("I"))
        .when(in_o & ~in_n, F.lit("D"))
        .when(in_o & in_n & (differs if differs is not None else F.lit(False)), F.lit("U"))
    )
    out_vals = [
        F.when(F.col(op_col) == "D", F.col(f"__o_{c}__"))
        .otherwise(F.col(f"__n_{c}__"))
        .alias(c)
        for c in cmp_list
    ]
    return (
        j.withColumn(op_col, op)
        .filter(F.col(op_col).isNotNull())
        .select(*key_list, op_col, *out_vals)
    )
