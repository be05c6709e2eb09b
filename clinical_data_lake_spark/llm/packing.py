"""Sequence packing for LLM training-data pipelines.

Training examples are fixed token budgets (e.g. 2048, 8192); packing
many short documents into one sequence instead of padding each is a
throughput multiplier. The operator here is the distributed version of
the standard greedy pack:

1. shard documents by a *data-derived* key (``xxhash64(doc_id) mod
   shards``) — membership is a pure function of the data, so results
   are identical for any physical partitioning of the input;
2. within each shard, scan docs in doc-id order and close a bin
   whenever the next doc would overflow the budget (greedy
   next-fit). A doc longer than the budget gets its own bin, flagged.

Per-shard state is a single running (bin, fill) pair, so each shard is
one pass over its rows inside an Arrow-batched ``applyInPandas`` —
Python, but vectorized transfer and O(rows) work; at 100 TB the cost
is one shuffle on the shard key plus a linear scan, and shard count
scales the parallelism independently of input layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_greedy(
    docs: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    budget: int = 2048,
    shards: int = 64,
) -> DataFrame:
    """Assign each doc a (shard, bin) so that per-bin token sums stay
    within ``budget`` (singleton oversized docs excepted, flagged via
    ``oversize``). Deterministic: shard = xxhash64(id) mod shards, scan
    order = id order."""
    import pandas as pd

    out_schema = (
        f"{id_col} long, {token_col} long, shard int, bin long, oversize boolean"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        bins, fills, overs = [], [], []
        cur_bin, cur_fill = 0, 0
        for t in pdf[token_col].astype("int64"):
            if cur_fill > 0 and cur_fill + t > budget:
                cur_bin += 1
                cur_fill = 0
            overs.append(t > budget)
            bins.append(cur_bin)
            cur_fill += t
            if cur_fill >= budget:  # full (or oversized singleton): close
                cur_bin += 1
                cur_fill = 0
        pdf["bin"] = pd.Series(bins, dtype="int64")
        pdf["oversize"] = pd.Series(overs, dtype="bool")
        return pdf[[id_col, token_col, "shard", "bin", "oversize"]]

    sharded = docs.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(token_col).cast("long").alias(token_col),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards)).cast("int").alias("shard"),
    )
    return sharded.groupBy("shard").applyInPandas(pack, schema=out_schema)


def pack_stats(packed: DataFrame, token_col: str = "n_tokens", budget: int = 2048) -> DataFrame:
    """Per-(shard, bin) fill summary — the packing-efficiency readout
    (mean fill fraction is the metric that justifies packing at all)."""
    return (
        packed.groupBy("shard", "bin")
        .agg(
            F.sum(token_col).alias("fill"),
            F.count(F.lit(1)).alias("n_docs"),
            F.max("oversize").alias("has_oversize"),
        )
        .withColumn("fill_frac", (F.col("fill") / F.lit(float(budget))).cast("double"))
    )
