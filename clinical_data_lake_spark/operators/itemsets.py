"""Frequent-itemset / association-rule mining over basket-shaped data.

The market-basket view of the reference's co-occurrence analytics
(02-patient-trajectory.py:53-87 computes per-patient condition
co-occurrence; the comorbidity_topk query certifies the pairwise
rollup): which items appear together more often than chance, scored
with the standard support / confidence / lift measures.

Scale shape (the apriori pruning, distributed):

1. Item supports — one groupBy(item) over the basket lines.
2. PRUNE before pairing: only items with support >= min_support can
   participate in a frequent pair (apriori monotonicity), so the
   basket lines are semi-joined down to frequent items first. This is
   the step that keeps the within-basket self-join from exploding on
   long-tail items at 100 TB.
3. Pair generation — self-join ON the basket key (item_a < item_b),
   then one groupBy(pair). Fan-out is quadratic only in the FREQUENT
   items per basket, bounded by the prune.
4. Measures — pair counts joined to the (small, frequent-only)
   item-support table, broadcast; all counts stay integer until the
   final per-row double divisions, so results are bit-reproducible
   across partitionings and engines.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: float = 0.01,
    min_pair_support: float | None = None,
    digits: int = 6,
) -> DataFrame:
    """Association rules over (basket, item) lines.

    Returns one row per unordered frequent pair:

        (item_a, item_b, n_a, n_b, n_ab, support,
         conf_a_to_b, conf_b_to_a, lift)

    with ``support = n_ab / n_baskets``, ``conf_a_to_b = n_ab / n_a``,
    ``lift = support / (supp_a * supp_b)``. Duplicate (basket, item)
    lines are collapsed first (set semantics — a basket holds an item
    or not). ``min_support`` prunes items before pairing;
    ``min_pair_support`` (defaults to ``min_support``) filters the
    emitted pairs.
    """
    if min_pair_support is None:
        min_pair_support = min_support
    lines = baskets.select(
        F.col(basket_col).alias("__bk__"), F.col(item_col).alias("__it__")
    ).distinct()
    n_baskets_df = lines.select("__bk__").distinct().agg(
        F.count(F.lit(1)).alias("__nb__")
    )
    item_n = lines.groupBy("__it__").agg(F.count(F.lit(1)).alias("__ni__"))
    frequent = (
        item_n.crossJoin(F.broadcast(n_baskets_df))
        .filter(F.col("__ni__") >= F.lit(min_support) * F.col("__nb__"))
        .select("__it__", "__ni__")
    )
    pruned = lines.join(frequent.select("__it__"), on="__it__", how="left_semi")
    a = pruned.select("__bk__", F.col("__it__").alias("item_a"))
    b = pruned.select("__bk__", F.col("__it__").alias("item_b"))
    pair_n = (
        a.join(b, on="__bk__")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    na = frequent.select(F.col("__it__").alias("item_a"), F.col("__ni__").alias("n_a"))
    nb = frequent.select(F.col("__it__").alias("item_b"), F.col("__ni__").alias("n_b"))
    out = (
        pair_n.join(F.broadcast(na), on="item_a")
        .join(F.broadcast(nb), on="item_b")
        .crossJoin(F.broadcast(n_baskets_df))
        .filter(F.col("n_ab") >= F.lit(min_pair_support) * F.col("__nb__"))
    )
    supp = F.col("n_ab") / F.col("__nb__")
    lift = (F.col("n_ab") * F.col("__nb__")) / (F.col("n_a") * F.col("n_b"))
    return out.select(
        "item_a",
        "item_b",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("n_ab").cast("long").alias("n_ab"),
        F.round(supp, digits).alias("support"),
        F.round(F.col("n_ab") / F.col("n_a"), digits).alias("conf_a_to_b"),
        F.round(F.col("n_ab") / F.col("n_b"), digits).alias("conf_b_to_a"),
        F.round(lift, digits).alias("lift"),
    )


def fpgrowth_itemsets(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: float = 0.05,
) -> DataFrame:
    """Frequent itemsets of ALL sizes via spark.ml's FPGrowth — the
    scalable generalization of ``basket_rules``' pairwise pass (FP-Tree
    compression, no candidate explosion). Returns

        (itemset, n_items, freq)

    with ``itemset`` the lexicographically-sorted '>'-joined items —
    a deterministic, engine-comparable rendering of MLlib's array
    output. Counts are exact (FP-Growth is exact, only the traversal
    is clever), so size-bounded slices are oracle-checkable against
    plain SQL co-occurrence counts: freq >= ceil(min_support * n_tx),
    MLlib's own threshold rule.

    Scale: FPGrowth distributes by suffix partitioning (PFP); input
    reduces to one transactions table (collect_set per basket) first.
    """
    from pyspark.ml.fpm import FPGrowth

    tx = baskets.groupBy(F.col(basket_col).alias("__bk__")).agg(
        F.collect_set(F.col(item_col)).alias("items")
    )
    model = FPGrowth(
        itemsCol="items", minSupport=min_support, minConfidence=0.0
    ).fit(tx)
    fi = model.freqItemsets
    return fi.select(
        F.concat_ws(">", F.array_sort("items")).alias("itemset"),
        F.size("items").cast("int").alias("n_items"),
        F.col("freq").cast("long").alias("freq"),
    )


def pmi_cooccurrence(
    df: DataFrame,
    x_col: str,
    y_col: str,
    min_count: int = 1,
    digits: int = 6,
) -> DataFrame:
    """Pointwise mutual information between two categorical columns —
    the cell-level association table feature selection and corpus
    analysis read (which (x, y) combinations are over/under-
    represented vs independence):

        pmi(x, y) = ln( n_xy * N / (n_x * n_y) )

    One groupBy on (x, y); the two marginal tables derive from the
    CELL table (grouping-key-cardinality-sized — no second pass over
    the data) and broadcast back. Every count stays integer; each
    row's pmi is one deterministic double log — no order-dependent
    float summation anywhere, which is what makes the table (unlike a
    single summed MI scalar) bit-reproducible across partitionings.
    Rows with NULL in either column are excluded (standard contingency
    semantics).
    """
    cells = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(x_col, y_col)
        .agg(F.count(F.lit(1)).alias("n_xy"))
    )
    mx = cells.groupBy(x_col).agg(F.sum("n_xy").alias("n_x"))
    my = cells.groupBy(y_col).agg(F.sum("n_xy").alias("n_y"))
    tot = cells.agg(F.sum("n_xy").alias("__n__"))
    out = (
        cells.filter(F.col("n_xy") >= min_count)
        .join(F.broadcast(mx), on=x_col)
        .join(F.broadcast(my), on=y_col)
        .crossJoin(F.broadcast(tot))
    )
    pmi = F.log((F.col("n_xy") * F.col("__n__")) / (F.col("n_x") * F.col("n_y")))
    return out.select(
        x_col,
        y_col,
        F.col("n_xy").cast("long").alias("n_xy"),
        F.col("n_x").cast("long").alias("n_x"),
        F.col("n_y").cast("long").alias("n_y"),
        F.round(pmi, digits).alias("pmi"),
    )


def mutual_information(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Scalar mutual information I(X;Y) in nats — the feature-
    selection score summarizing the ``pmi_cooccurrence`` table:

        I = sum_cells (n_xy / N) * pmi(x, y)

    A naive double sum over cells is order-dependent (float addition
    does not associate); here each cell's term is rounded to a
    decimal(28,14) and summed DECIMALLY, so the scalar is identical
    under any partitioning — the same trick the certified decimal
    rollups use, applied to log-domain terms. Emitted as one row
    (n_cells, mi_nats).
    """
    cells = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(x_col, y_col)
        .agg(F.count(F.lit(1)).alias("n_xy"))
    )
    mx = cells.groupBy(x_col).agg(F.sum("n_xy").alias("n_x"))
    my = cells.groupBy(y_col).agg(F.sum("n_xy").alias("n_y"))
    tot = cells.agg(F.sum("n_xy").alias("__n__"))
    pmi = F.log((F.col("n_xy") * F.col("__n__")) / (F.col("n_x") * F.col("n_y")))
    term = F.round((F.col("n_xy") / F.col("__n__")) * pmi, 14).cast("decimal(28,14)")
    return (
        cells.join(F.broadcast(mx), on=x_col)
        .join(F.broadcast(my), on=y_col)
        .crossJoin(F.broadcast(tot))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.round(F.sum(term).cast("double"), 9).alias("mi_nats"),
        )
    )


def prefixspan_patterns(
    events: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    item_col: str,
    min_support: float = 0.1,
    max_len: int = 2,
) -> DataFrame:
    """Frequent SEQUENTIAL patterns via spark.ml's PrefixSpan (Pei et
    al. 2001) — the ordered counterpart of ``fpgrowth_itemsets``: a
    pattern a>b is supported by every entity whose event sequence
    contains an a somewhere BEFORE a b (not necessarily adjacent).
    Returns (pattern, n_steps, freq) with ``pattern`` the
    '>'-joined step items — deterministic, engine-comparable.

    Sequences are built per key by sorting events on ``order_cols``
    (include a unique tiebreaker: collect_list order is otherwise
    partition-dependent); every step is a singleton itemset, so
    patterns are pure event-type chains. Support counts are exact and
    MLlib thresholds at ceil(min_support * n_sequences) — the same
    rule the SQL twin replays: single steps are distinct-entity type
    counts, two-step chains are distinct entities with an ordered
    occurrence pair.

    Scale: PrefixSpan distributes by prefix projection; the input
    reduces to one sequence table (a per-key sort of that key's own
    events — partitioned, never global) before mining.
    """
    from pyspark.ml.fpm import PrefixSpan

    ordered = F.array_sort(
        F.collect_list(
            F.struct(
                *[F.col(c).alias(f"__o{i}__") for i, c in enumerate(order_cols)],
                F.col(item_col).cast("string").alias("__it__"),
            )
        )
    )
    seqs = (
        events.groupBy(F.col(key_col).alias("__k__"))
        .agg(ordered.alias("__s__"))
        .select(
            F.transform("__s__", lambda r: F.array(r["__it__"])).alias(
                "sequence"
            )
        )
    )
    ps = PrefixSpan(
        minSupport=float(min_support),
        maxPatternLength=int(max_len),
        sequenceCol="sequence",
    )
    out = ps.findFrequentSequentialPatterns(seqs)
    return out.select(
        F.concat_ws(
            ">", F.transform("sequence", lambda step: F.concat_ws(",", step))
        ).alias("pattern"),
        F.size("sequence").cast("int").alias("n_steps"),
        F.col("freq").cast("long").alias("freq"),
    )


def item_cf_neighbors(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    top_k: int = 5,
    min_cooc: int = 2,
    digits: int = 6,
    max_basket_size: int | None = 10_000,
) -> DataFrame:
    """Item-item collaborative filtering: for every item, its top-k
    most similar items by CO-OCCURRENCE COSINE
    (cooc(i,j) / sqrt(n_i * n_j)) — the "customers who bought X also
    bought Y" recommender primitive. Where ``basket_rules`` scores
    directional confidence/lift for rule mining, the symmetric cosine
    is the standard item-kNN scoring (Sarwar et al., WWW'01).

    Returns (item, neighbor, cooc, sim, rnk) with rnk over sim desc,
    neighbor asc — deterministic. Pairs below ``min_cooc`` are pruned
    (noise floor).

    Scale shape: the classic distributed item-CF plan — distinct
    (basket, item) pairs self-join ON THE BASKET KEY (fan-out bounded
    by basket size, never an item-item cross join), integer
    co-occurrence counts, item frequencies join back onto the bounded
    pair table, one top-k window partitioned BY ITEM. The basket
    self-join is quadratic PER BASKET, so one hot basket (a shared
    service account, a crawler session) silently dominates the whole
    job — ``max_basket_size`` is therefore ENFORCED in-plan
    (theil_sen-style ``raise_error`` riding the join's own left input,
    co-partitioned on the basket key: no pre-flight job, no second
    scan): an oversized basket fails the job loudly with its key named
    instead of quietly going quadratic. Raise the cap, pre-sample hot
    baskets upstream when they are legitimate, or pass
    ``max_basket_size=None`` to opt out of the guard entirely (the
    pre-cap behavior: legitimate super-hub baskets complete, slowly).
    """
    from pyspark.sql import Window

    bi = (
        baskets.select(
            F.col(basket_col).alias("__b__"), F.col(item_col).alias("__i__")
        )
        .filter(F.col("__i__").isNotNull())
        .distinct()
    )
    from .caching import track_persist

    bi = track_persist(bi)
    freq = bi.groupBy(F.col("__i__").alias("item")).agg(
        F.count(F.lit(1)).cast("long").alias("__n__")
    )
    if max_basket_size is None:
        a = bi.select("__b__", F.col("__i__").alias("item"))
    else:
        bsize = bi.groupBy("__b__").agg(F.count(F.lit(1)).alias("__bn__"))
        guard_msg = F.concat(
            F.lit(
                f"item_cf_neighbors: basket over {max_basket_size} items "
                f"(self-join is quadratic per basket); cap or sample hot "
                f"baskets upstream, or raise max_basket_size; offending "
                f"basket: "
            ),
            F.col("__b__").cast("string"),
        )
        a = bi.join(bsize, on="__b__").select(
            "__b__",
            F.when(F.col("__bn__") <= F.lit(max_basket_size), F.col("__i__"))
            .otherwise(F.raise_error(guard_msg))
            .alias("item"),
        )
    b = bi.select("__b__", F.col("__i__").alias("neighbor"))
    cooc = (
        a.join(b, on="__b__")
        .filter(F.col("item") != F.col("neighbor"))
        .groupBy("item", "neighbor")
        .agg(F.count(F.lit(1)).cast("long").alias("cooc"))
        .filter(F.col("cooc") >= min_cooc)
    )
    scored = (
        cooc.join(F.broadcast(freq), on="item")
        .withColumnRenamed("__n__", "__ni__")
        .join(
            F.broadcast(freq.withColumnRenamed("item", "neighbor")),
            on="neighbor",
        )
        .withColumnRenamed("__n__", "__nj__")
        .select(
            "item",
            "neighbor",
            "cooc",
            F.round(
                F.col("cooc").cast("double")
                / F.sqrt(
                    F.col("__ni__").cast("double")
                    * F.col("__nj__").cast("double")
                ),
                digits,
            ).alias("sim"),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("item").orderBy(F.desc("sim"), F.asc("neighbor"))
    )
    return (
        scored.withColumn("rnk", rk)
        .filter(F.col("rnk") <= top_k)
        .select(
            "item", "neighbor", "cooc",
            (F.col("sim") + F.lit(0.0)).alias("sim"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )
