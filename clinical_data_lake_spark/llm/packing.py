"""Sequence packing for LLM training-data pipelines.

Training examples are fixed token budgets (e.g. 2048, 8192); packing
many short documents into one sequence instead of padding each is a
throughput multiplier. Two distributed packers:

- ``pack_concat`` — concatenate-and-cut (GPT-style) packing, fully
  JVM-side: lay documents head-to-tail in deterministic id order
  within each shard and cut at every ``budget`` boundary. A document
  whose span crosses a boundary is split across the two sequences
  (flagged). One window over the shard, zero Python — the 100 TB
  fast path, and the semantics most pretraining pipelines actually
  use (fill fraction is exactly 1.0 except each shard's last bin).
- ``pack_greedy`` — exact greedy next-fit (close a bin when the next
  doc would overflow; no doc is ever split). Sequential semantics, so
  per-shard state lives in an Arrow-batched ``applyInPandas`` scan —
  the exactness fallback when downstream can't handle split docs.

Both shard by a *data-derived* key (``xxhash64(doc_id) mod shards``) —
membership is a pure function of the data, so results are identical
for any physical partitioning of the input. Shard count defaults to
data-derived (``ceil(rows / rows_per_shard)``) so per-task work is
bounded by ``rows_per_shard`` regardless of corpus size: a fixed
shard count would grow per-task memory linearly with the corpus and
OOM the pandas path at scale.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _derive_shards(
    docs: DataFrame, shards: int | None, rows_per_shard: int
) -> int:
    """Data-derived shard count: one cheap count job (parquet metadata
    for raw scans) bounds every shard near ``rows_per_shard`` rows, so
    per-task memory stays constant as the corpus grows."""
    if shards is not None:
        if shards < 1:
            raise ValueError("shards must be >= 1")
        return shards
    if rows_per_shard < 1:
        raise ValueError("rows_per_shard must be >= 1")
    return max(1, math.ceil(docs.count() / rows_per_shard))


def _sharded(
    docs: DataFrame, id_col: str, token_col: str, n_shards: int,
    shard_by_hash: bool = True,
) -> DataFrame:
    # hash sharding decorrelates shard membership from id order (even
    # fill when ids cluster); pmod-of-id sharding is engine-portable
    # (expressible in any SQL dialect for oracle comparison)
    key = F.xxhash64(F.col(id_col)) if shard_by_hash else F.col(id_col).cast("long")
    return docs.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(token_col).cast("long").alias(token_col),
        F.pmod(key, F.lit(n_shards)).cast("int").alias("shard"),
    )


def split_to_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
    sep: str = " ",
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    long-document half of sequence budgeting (packing merges short
    docs; this cuts long ones), and the standard RAG/embedding-index
    chunker. Returns one row per chunk:

        (id, chunk_id, chunk_text, n_tokens)

    Chunk i covers whitespace tokens [i*step, i*step + chunk_tokens)
    with step = chunk_tokens - overlap; the final chunk is whatever
    tail remains (tails already fully contained in the previous chunk
    are not re-emitted). Deterministic, pure JVM array expressions
    (split -> transform over a sequence -> posexplode -> slice/join):
    no shuffle at all — chunking composes into any downstream scan,
    and at 100 TB the chunks stream straight into the next operator
    (embedding UDF, chunk-hash dedup) without materializing.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    t = F.split(F.col(text_col), r"\s+")
    n = F.size(t)
    n_chunks = F.greatest(
        F.lit(1),
        F.floor((n - F.lit(overlap) + F.lit(step - 1)) / F.lit(step)).cast("int"),
    )
    chunk = F.posexplode(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.slice(t, i * step + 1, chunk_tokens),
        )
    )
    return docs.select(F.col(id_col), chunk.alias("chunk_id", "__c__")).select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.array_join("__c__", sep).alias("chunk_text"),
        F.size("__c__").cast("long").alias("n_tokens"),
    )


def pack_concat(
    docs: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    budget: int = 2048,
    shards: int | None = None,
    rows_per_shard: int = 250_000,
    shard_by_hash: bool = True,
) -> DataFrame:
    """Concatenate-and-cut packing, all JVM-side window arithmetic.

    Documents are laid head-to-tail in id order within each shard;
    sequence ``bin`` = floor(start_offset / budget), ``bin_offset`` =
    the doc's start within that bin, ``split`` = true when the doc's
    span crosses a bin boundary (it contributes tokens to 2+
    sequences). Plan: one shuffle on the shard key + one window cumsum
    — no Python workers, whole-stage codegen either side of the
    window, per-task work bounded by ``rows_per_shard``.

    ``id_col`` values must be unique: the cumsum uses an explicit ROWS
    frame, so duplicate ids would get an arbitrary (though
    deterministic-per-run) relative order within the shard.
    """
    n_shards = _derive_shards(docs, shards, rows_per_shard)
    # ROWS, not the default RANGE, frame: RANGE treats order-by ties as
    # peers sharing one inclusive cumsum, which corrupts start offsets
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    end = F.sum(token_col).over(w)  # inclusive cumulative tokens
    start = end - F.col(token_col)
    return (
        _sharded(docs, id_col, token_col, n_shards, shard_by_hash)
        .select(
            id_col,
            token_col,
            "shard",
            F.floor(start / budget).alias("bin"),
            (start % budget).alias("bin_offset"),
            # a zero-token doc never splits; otherwise compare the bins
            # of the first and last token
            (
                (F.col(token_col) > 0)
                & (F.floor(start / budget) != F.floor((end - 1) / budget))
            ).alias("split"),
        )
    )


def pack_greedy(
    docs: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    budget: int = 2048,
    shards: int | None = None,
    rows_per_shard: int = 250_000,
    shard_by_hash: bool = True,
) -> DataFrame:
    """Exact greedy next-fit: assign each doc a (shard, bin) so that
    per-bin token sums stay within ``budget`` (singleton oversized docs
    excepted, flagged via ``oversize``); docs are never split.
    Deterministic: shard = xxhash64(id) mod shards, scan order = id
    order. Sequential per-shard state -> Arrow-batched applyInPandas;
    use ``pack_concat`` when cut-at-boundary semantics are acceptable
    (it avoids Python entirely).
    """
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

    n_shards = _derive_shards(docs, shards, rows_per_shard)
    return (
        _sharded(docs, id_col, token_col, n_shards, shard_by_hash)
        .groupBy("shard")
        .applyInPandas(pack, schema=out_schema)
    )


def pack_stats(packed: DataFrame, token_col: str = "n_tokens", budget: int = 2048) -> DataFrame:
    """Per-(shard, bin) fill summary — the packing-efficiency readout
    (mean fill fraction is the metric that justifies packing at all).

    ``pack_greedy`` output (no splits) sums exactly. ``pack_concat``
    output (marked by its ``bin_offset`` column) is accounted exactly
    too: each doc is exploded across every bin its token span touches
    (``sequence`` + ``explode`` — still pure JVM) and contributes
    ``min(end, bin_end) - max(start, bin_start)`` tokens to each, so
    every non-terminal concat bin reads fill fraction exactly 1.0 and
    ``n_docs`` counts the docs occupying (not merely starting in) the
    bin. Zero-token docs count in their starting bin with 0 fill."""
    if "bin_offset" in packed.columns:  # concat-packed: span-exact explode
        b = F.lit(budget).cast("long")
        start = F.col("bin") * b + F.col("bin_offset")
        end = start + F.col(token_col)
        last_bin = F.when(
            F.col(token_col) > 0, F.floor((end - 1) / b)
        ).otherwise(F.col("bin"))
        per_bin = packed.select(
            "shard",
            start.alias("_start"),
            end.alias("_end"),
            F.explode(F.sequence(F.col("bin"), last_bin)).alias("bin"),
        )
        contrib = F.least(F.col("_end"), (F.col("bin") + 1) * b) - F.greatest(
            F.col("_start"), F.col("bin") * b
        )
        return (
            per_bin.groupBy("shard", "bin")
            .agg(F.sum(contrib).alias("fill"), F.count(F.lit(1)).alias("n_docs"))
            .withColumn("fill_frac", (F.col("fill") / F.lit(float(budget))).cast("double"))
        )
    agg = [
        F.sum(token_col).alias("fill"),
        F.count(F.lit(1)).alias("n_docs"),
    ]
    if "oversize" in packed.columns:
        agg.append(F.max("oversize").alias("has_oversize"))
    return (
        packed.groupBy("shard", "bin")
        .agg(*agg)
        .withColumn("fill_frac", (F.col("fill") / F.lit(float(budget))).cast("double"))
    )


def truncation_loss(
    docs: DataFrame,
    limits: tuple[int, ...] = (16, 32, 64),
    group_col: str = "lang",
    text_col: str = "text",
    digits: int = 6,
) -> DataFrame:
    """Context-length planning table: for each candidate maximum
    sequence length, how many documents a hard truncation would cut
    and what fraction of the corpus's tokens it would discard, per
    slice. The capacity-planning twin of the packing operators —
    ``pack_*`` assumes a sequence length; this table is how that
    length gets CHOSEN (token loss vs context cost), and per-slice
    because the answer differs by language/source.

    One corpus scan: whitespace token counts (the same expression the
    certified text_stats twin pins) cross a tiny in-plan limits array
    via explode, then one (slice, limit) aggregate. Integer token
    sums; one loss-rate division per output row. The limits array is
    literal — no join, no second scan per limit.
    """
    if not limits:
        raise ValueError("need at least one limit")
    from ..functions.text import token_count

    tok = token_count(F.col(text_col))
    base = docs.select(
        F.col(group_col),
        tok.alias("__tok__"),
        F.explode(
            F.array(*[F.lit(int(m)) for m in limits])
        ).alias("max_len"),
    )
    n_tokens = F.sum("__tok__").cast("long")
    lost = F.sum(
        F.greatest(F.col("__tok__") - F.col("max_len"), F.lit(0).cast("long"))
    ).cast("long")
    return base.groupBy(group_col, "max_len").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((F.col("__tok__") > F.col("max_len")).cast("long"))
        .cast("long")
        .alias("n_truncated"),
        n_tokens.alias("n_tokens"),
        lost.alias("n_tokens_lost"),
        F.round(lost.cast("double") / n_tokens.cast("double"), digits).alias(
            "loss_rate"
        ),
    )


def packing_drift(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    piece_len_a: int = 4,
    piece_len_b: int = 3,
    shards: int = 8,
    digits: int = 6,
) -> DataFrame:
    """Packing-efficiency drift between two tokenizer versions — the
    sequence-budget half of the tokenizer-swap pre-flight that
    ``fertility_drift`` starts: fertility says the same corpus costs
    more TOKENS under vocab B; this says what that does to the PACKED
    training set — bins (sequences) used, fill fraction, and the
    fraction of documents cut by a bin boundary, under identical
    concat-and-cut packing (``pack_concat``, id-mod sharding so every
    number is engine-replayable). A swap that inflates tokens 15% can
    inflate SEQUENCES more or less than 15% depending on how doc
    lengths interact with the budget — and the split fraction (a
    training-quality cost: more documents straddling sequence
    boundaries) moves independently. This one row is the capacity
    side of the swap decision.

    NULL-text documents are excluded (they pack nothing under either
    vocab). Token counts use the scan-speed BPE-ish estimator with
    the vocab modeled by ``piece_len`` exactly as ``fertility_drift``
    does; swap in real tokenizer UDFs for production calibration —
    the plan shape is what matters at scale.

    Scale shape: ONE scan computes both vocabs' token counts (the
    projection is shared and persisted); each version then pays
    ``pack_concat``'s one shard-key shuffle + window cumsum; every
    aggregate after is shard-bounded (bins per shard is exact long
    arithmetic: ceil(shard_tokens / budget), no doubles). Returns ONE
    row: (n_docs, n_tokens_a, n_tokens_b, n_bins_a, n_bins_b,
    fill_frac_a, fill_frac_b, split_frac_a, split_frac_b,
    budget_ratio, bin_ratio, fill_drift).
    """
    from ..functions.text import bpe_ish_token_count
    from ..operators.caching import track_persist

    if budget < 1:
        raise ValueError("budget must be >= 1")
    base = track_persist(
        docs.filter(F.col(text_col).isNotNull()).select(
            F.col(id_col),
            bpe_ish_token_count(F.col(text_col), piece_len_a).alias("__ta__"),
            bpe_ish_token_count(F.col(text_col), piece_len_b).alias("__tb__"),
        )
    )
    sides = {}
    for ver, tok in (("a", "__ta__"), ("b", "__tb__")):
        packed = pack_concat(
            base.select(F.col(id_col), F.col(tok).alias("n_tokens")),
            id_col=id_col,
            budget=budget,
            shards=shards,
            shard_by_hash=False,
        )
        per_shard = packed.groupBy("shard").agg(
            F.count(F.lit(1)).cast("long").alias("__d__"),
            F.sum("n_tokens").cast("long").alias("__t__"),
            F.sum(F.col("split").cast("long")).cast("long").alias("__s__"),
        )
        # exact long ceil-division (`div`), the shard_plan convention:
        # bins used by a non-empty concat-packed shard is exactly
        # ceil(shard_tokens / budget)
        bins = F.expr(
            f"(__t__ + {int(budget) - 1}) div {int(budget)}"
        ).cast("long")
        sides[ver] = per_shard.agg(
            F.sum("__d__").cast("long").alias(f"__docs_{ver}__"),
            F.sum("__t__").cast("long").alias(f"n_tokens_{ver}"),
            F.sum(bins).cast("long").alias(f"n_bins_{ver}"),
            F.sum("__s__").cast("long").alias(f"__splits_{ver}__"),
        )
    one = sides["a"].crossJoin(sides["b"])

    def _ratio(num: F.Column, den: F.Column) -> F.Column:
        return F.round(
            num.cast("double") / den.cast("double"), digits
        ) + F.lit(0.0)

    b = F.lit(int(budget)).cast("long")
    wide = one.select(
        F.col("__docs_a__").alias("n_docs"),
        "n_tokens_a",
        "n_tokens_b",
        "n_bins_a",
        "n_bins_b",
        _ratio(F.col("n_tokens_a"), F.col("n_bins_a") * b).alias("fill_frac_a"),
        _ratio(F.col("n_tokens_b"), F.col("n_bins_b") * b).alias("fill_frac_b"),
        _ratio(F.col("__splits_a__"), F.col("__docs_a__")).alias("split_frac_a"),
        _ratio(F.col("__splits_b__"), F.col("__docs_b__")).alias("split_frac_b"),
        _ratio(F.col("n_tokens_b"), F.col("n_tokens_a")).alias("budget_ratio"),
        _ratio(F.col("n_bins_b"), F.col("n_bins_a")).alias("bin_ratio"),
    )
    # drift differences the ROUNDED fractions (single source of truth
    # for the fill definition; the oracle does the same)
    return wide.select(
        "*",
        (
            F.round(F.col("fill_frac_b") - F.col("fill_frac_a"), digits)
            + F.lit(0.0)
        ).alias("fill_drift"),
    )
