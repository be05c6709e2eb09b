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
