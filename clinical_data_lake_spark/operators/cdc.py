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
