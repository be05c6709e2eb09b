"""Graph propagation operators over edge DataFrames.

Companions to the connected-components labeling in llm/dedup.py
(``dup_clusters``): where CC answers "which docs form one duplicate
cluster", PageRank answers "which doc is the most *central* member" —
a better canonical-representative policy than min-id when near-dup
clusters are chains (A~B~C but A!~C), and the standard importance
measure for citation/link graphs.

100 TB shape: the classic distributed PageRank — each iteration is one
equi-join of the rank vector against the (degree-annotated) edge list
on the source id plus one groupBy on the destination id, both
shuffling on node ids, linear in |edges|. Fixed iteration count keeps
the result deterministic and oracle-comparable (an unrolled SQL twin);
``localCheckpoint`` truncates lineage so iteration N's plan doesn't
replay 1..N-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .caching import iter_checkpoint


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    undirected: bool = True,
    eager_checkpoint: bool = True,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank; returns (node, rank).

    SIDE EFFECT: with ``eager_checkpoint=True`` (default), CONSTRUCTING
    the returned DataFrame runs Spark jobs — the edge emitter is
    materialized via an eager localCheckpoint before the degree
    derivation. Lazy checkpointing is strictly worse here: the final
    single-action job would recompute the un-truncated emitter lineage
    in every join branch before the checkpoint lands (measured 5.0s vs
    2.9s at sf0.1 on the near-dup graph). Pass
    ``eager_checkpoint=False`` when you only want the plan (e.g. for
    inspection) and accept the recomputation if you then execute it.
    ``checkpoint_dir`` switches every per-iteration truncation from
    executor-local blocks to RELIABLE DFS checkpoints — see
    ``caching.iter_checkpoint`` for the executor-loss trade; pass a
    DFS path for long iterative runs on a churning cluster.

    Per-node form: rank = (1-d) + d * sum(rank_in / deg_out), starting
    from rank 1.0 everywhere — ranks average 1, independent of graph
    size. ``undirected=True`` (the near-dup-graph case) symmetrizes
    the edge list first, which also guarantees every node both sends
    and receives mass (no dangling-node correction needed; for a
    directed graph with sinks, pass the symmetrized form or accept
    that sink mass leaves the system, as in the original formulation).
    Float contributions are summed in shuffle order — deterministic to
    the last ulp only per-plan, so round before comparing across
    engines.
    """
    if undirected:
        # symmetrize with ONE pass over `edges` (explode both
        # directions per row) — a union of two selects would evaluate
        # the edge-producing subtree twice, which doubles the cost when
        # the edges come from an expensive emitter (e.g. jaccard pairs)
        e = edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("s"), F.col(dst).alias("d")),
                    F.struct(F.col(dst).alias("s"), F.col(src).alias("d")),
                )
            ).alias("__p__")
        ).select(F.col("__p__.s").alias("__s__"), F.col("__p__.d").alias("__d__"))
    else:
        e = edges.select(F.col(src).alias("__s__"), F.col(dst).alias("__d__"))
    # Checkpoint the symmetrized edge list BEFORE deriving the degree
    # table: the edges may come from an expensive emitter (e.g. the
    # jaccard pair computation), and `e.join(deg)` holds e's lineage in
    # BOTH join branches — without the checkpoint the emitter runs once
    # per branch plus once per iteration (measured 8.8s vs 5.4s at
    # sf0.1 on the near-dup graph, where the emitter dominates).
    # See the docstring: eager by default (construction runs jobs, but
    # lazy would recompute the emitter per branch inside the first
    # action's single job — measured 5.0s vs 2.9s at sf0.1).
    e = iter_checkpoint(e.distinct(), checkpoint_dir, eager=eager_checkpoint)
    deg = e.groupBy("__s__").agg(F.count(F.lit(1)).alias("__deg__"))
    # (src, dst, out-degree(src)) — reused by every iteration; its own
    # checkpoint is cheap once `e` is materialized
    ewd = iter_checkpoint(e.join(deg, on="__s__"), checkpoint_dir, eager=eager_checkpoint)

    # init from the materialized edge list so nothing re-derives `edges`
    ranks = (
        ewd.select(F.col("__s__").alias("node"))
        .distinct()
        .withColumn("rank", F.lit(1.0))
    )
    for _ in range(iterations):
        ranks = (
            ewd.join(ranks, ewd["__s__"] == ranks["node"])
            .groupBy(F.col("__d__").alias("node"))
            .agg(
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.sum(F.col("rank") / F.col("__deg__"))
                ).alias("rank")
            )
        )
        ranks = iter_checkpoint(ranks, checkpoint_dir, eager=False)
    return ranks


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle participation counts over an undirected graph
    — the local clustering signal that separates tight duplicate
    CLIQUES from accidental chains (A~B~C without A~C) in the near-dup
    graph ``dup_clusters``/``pagerank`` operate on. Returns
    (node, n_triangles) for every node incident to >= 1 edge.

    The classic ordered-wedge plan (node-iterator with total order):
    edges canonicalize to a < b once, so each triangle a < b < c is
    enumerated EXACTLY once as wedge (a,b)+(b,c) closed by edge (a,c)
    — no 6x duplicate enumeration, no degree-squared hot keys beyond
    the wedge join itself. Cost: one self-join on the shared wedge
    vertex + one semi-join against the edge list — the standard
    distributed shape, linear shuffles on node ids.
    """
    from .caching import track_persist

    # referenced by both wedge sides, the closing semi-join, and the
    # node list — persist so the upstream edge-producing plan (often a
    # full similarity join) runs once, not four times
    e = track_persist(
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    w1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    w2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    tri = (
        w1.join(w2, on="y")
        .join(
            e.select(F.col("a").alias("x"), F.col("b").alias("z")),
            on=["x", "z"],
            how="left_semi",
        )
    )
    per_node = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    nodes = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .distinct()
    )
    return (
        nodes.join(per_node, on="node", how="left")
        .select(
            "node",
            F.coalesce("n_triangles", F.lit(0).cast("long")).alias("n_triangles"),
        )
    )


def link_prediction(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    digits: int = 6,
    max_degree: int | None = 10_000,
) -> DataFrame:
    """Common-neighbors + Adamic-Adar link prediction over an
    undirected graph: for every NON-adjacent pair sharing at least one
    neighbor, score how likely the missing edge is —

        cn(a,b) = |N(a) ∩ N(b)|
        aa(a,b) = sum_{z in N(a) ∩ N(b)} 1 / ln(deg(z))

    (Adamic-Adar down-weights promiscuous hubs). On the near-dup pair
    graph this surfaces document pairs the similarity join MISSED but
    the cluster structure implies — the standard candidate-recovery /
    graph-completion pass. Returns (node_a, node_b, cn, aa) with
    node_a < node_b.

    Scale shape: edges canonicalize + symmetrize once; wedges join on
    the shared neighbor z (one shuffle keyed by node id); existing
    edges leave via one anti-join; degrees join on z BEFORE the
    per-pair rollup so the Adamic-Adar terms ride the same wedge rows
    (decimal-summed, merge-order-exact). Hub nodes fan out deg² wedges,
    so ``max_degree`` is ENFORCED in-plan (theil_sen-style
    ``raise_error`` riding the wedge join's own left input, which the
    degree join reaches on the same node-id shuffle key — no
    pre-flight job): one super-hub fails the job loudly with its node
    id named instead of quietly exploding the wedge count. Raise the
    cap, drop/sample hub nodes upstream exactly as the shingle index
    caps document frequency, or pass ``max_degree=None`` to opt out of
    the guard (the pre-cap behavior: legitimate hubs complete, at
    deg^2 wedge cost).
    """
    from .caching import track_persist

    # the canonical edge table is referenced FOUR times below (both
    # adjacency branches, the anti-join, degrees via adj) — without a
    # persist each reference replays the entire upstream plan (for
    # near-dup graphs that is the full similarity join, ~4x the cost)
    e = track_persist(
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    adj = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    deg = adj.groupBy(F.col("u").alias("z")).agg(
        F.count(F.lit(1)).cast("long").alias("__deg__")
    )
    # degrees join the LEFT wedge input (same node-id key the wedge
    # join shuffles on) rather than the deg^2-sized wedge output: the
    # guard fires BEFORE the fan-out it protects against, and the
    # Adamic-Adar degree column rides the wedge rows for free
    w1 = adj.select(F.col("v").alias("x"), F.col("u").alias("z")).join(
        deg, on="z"
    )
    if max_degree is None:
        w1 = w1.select("z", "x", "__deg__")
    else:
        guard_msg = F.concat(
            F.lit(
                f"link_prediction: node degree over {max_degree} (wedge "
                f"join fans out deg^2 pairs per hub); drop or sample hub "
                f"nodes upstream, or raise max_degree; offending node: "
            ),
            F.col("z").cast("string"),
        )
        w1 = w1.select(
            "z",
            F.when(F.col("__deg__") <= F.lit(max_degree), F.col("x"))
            .otherwise(F.raise_error(guard_msg))
            .alias("x"),
            "__deg__",
        )
    w2 = adj.select(F.col("u").alias("z"), F.col("v").alias("y"))
    wedges = (
        w1.join(w2, on="z")
        .filter(F.col("x") < F.col("y"))
        .join(
            e.select(F.col("a").alias("x"), F.col("b").alias("y")),
            on=["x", "y"],
            how="left_anti",
        )
    )
    dec = f"decimal(28,{digits})"
    aa_term = F.round(
        F.lit(1.0) / F.log(F.col("__deg__").cast("double")), digits
    )
    return (
        wedges.groupBy(F.col("x").alias("node_a"), F.col("y").alias("node_b"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("cn"),
            F.sum(aa_term.cast(dec)).cast("double").alias("aa"),
        )
    )


def degree_distribution(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Degree histogram of an undirected graph: (degree, n_nodes) —
    the one-glance shape check (is the near-dup graph a few tight
    cliques or one hub-and-spoke hairball?) before committing to a
    pair-join whose cost is sum-of-degrees-squared. Two group-counts,
    nothing else.
    """
    from .caching import track_persist

    e = track_persist(
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    )


def khop_neighbors(
    edges: DataFrame,
    seeds: DataFrame,
    k: int = 3,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    undirected: bool = True,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Breadth-first k-hop neighborhood from a seed set: every node
    reachable within ``k`` edges, tagged with its MINIMUM hop distance
    — the ego-network / blast-radius primitive (contact tracing,
    fraud-ring expansion, feature neighborhoods for graph ML).

    Fixed-k frontier expansion, one join + min-aggregate per hop — the
    standard distributed BFS: at each step only the NEW frontier joins
    the edge table (visited nodes are anti-joined away), so work per
    hop is frontier-out-degree, not graph size. ``k`` is a bounded
    constant (the loop unrolls into the plan); for unbounded closure
    use ``dedup.duplicate_clusters``' label propagation.

    Returns (node, hop) with hop 0 for the seeds themselves; a node
    first reached at two hops simultaneously dedupes via the min.
    """
    from .caching import track_persist

    e = edges.select(F.col(src).alias("__s__"), F.col(dst).alias("__d__"))
    if undirected:
        e = e.union(
            edges.select(F.col(dst).alias("__s__"), F.col(src).alias("__d__"))
        )
    # the loop references the edge table once PER HOP — without this
    # persist the unrolled plan recomputes the (possibly expensive)
    # upstream edge derivation k+ times (measured 9.1s -> 2s at sf0.1
    # on the near-dup graph).
    e = track_persist(e.distinct())
    # Frontiers use eager localCheckpoint, not persist + broadcast
    # hints: BFS is inherently one job per hop, and the hint version
    # paid an extra broadcast-exchange subjob per join on top of the
    # lazy-persist materialization — measured 3.2-3.8s vs 1.4-1.7s
    # steady-state for the checkpointed loop on the same 256-edge
    # graph (the work is pure scheduling at that size). Checkpointing
    # also truncates the per-hop lineage, so hop j's plan never
    # re-walks hops 0..j-1. AQE still auto-broadcasts a small frontier
    # into the edge join and falls back to a shuffle join when the
    # frontier is genuinely large — the adaptive choice a fixed hint
    # would have overridden.
    frontier = (
        seeds.select(F.col(node_col).alias("node"))
        .distinct()
        .select("node", F.lit(0).alias("hop"))
    )
    frontier = iter_checkpoint(frontier, checkpoint_dir)
    visited = frontier
    for hop in range(1, k + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["__s__"])
            .select(F.col("__d__").alias("node"))
            .distinct()
            .join(visited.select("node"), on="node", how="left_anti")
            .select("node", F.lit(hop).alias("hop"))
        )
        nxt = iter_checkpoint(nxt, checkpoint_dir)
        # visited stays a plain union of checkpointed frames — cheap
        # to re-walk, no extra materialization job per hop
        visited = visited.union(nxt)
        # only nodes first reached at exactly this hop expand next round
        frontier = nxt
    return visited.select("node", F.col("hop").cast("int").alias("hop"))


def label_propagation(
    edges: DataFrame,
    k: int = 3,
    src: str = "src",
    dst: str = "dst",
    undirected: bool = True,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007, the LPA variant GraphX ships): every node starts in its
    own community (label = node id); each round, every node adopts the
    most frequent label among its NEIGHBORS, ties broken by the
    smallest label — the deterministic synchronous schedule, so the
    result is a pure function of the graph, replayable round-by-round
    in SQL. ``k`` bounded rounds (LPA converges in a handful on real
    graphs; synchronous LPA can oscillate on bipartite structures,
    which a fixed round count also bounds).

    Returns (node, label): the community assignment after round ``k``.

    Scale shape: per round, one join of the label table onto the edge
    list (both keyed by node id) and one (node, label) count-argmax —
    the same per-round cost as one PageRank step; labels
    localCheckpoint eagerly per round (the ``khop_neighbors`` lesson:
    truncated lineage, one job per round, AQE picks the join strategy
    from real sizes). Community sizes follow with one groupBy on the
    result.
    """
    from .caching import track_persist

    e = edges.select(F.col(src).alias("__s__"), F.col(dst).alias("__d__"))
    if undirected:
        e = e.union(
            edges.select(F.col(dst).alias("__s__"), F.col(src).alias("__d__"))
        )
    e = track_persist(e.distinct())
    labels = (
        e.select(F.col("__s__").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    labels = iter_checkpoint(labels, checkpoint_dir)
    for _ in range(int(k)):
        votes = (
            e.join(labels, e["__d__"] == labels["node"])
            .select(F.col("__s__").alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("__c__"))
        )
        labels = (
            votes.groupBy("node")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("__c__")).alias("nc"),
                        F.col("label").alias("l"),
                    )
                ).alias("__m__")
            )
            .select("node", F.col("__m__")["l"].alias("label"))
        )
        labels = iter_checkpoint(labels, checkpoint_dir)
    return labels


def hits(
    edges: DataFrame,
    k: int = 2,
    src: str = "src",
    dst: str = "dst",
    digits: int = 9,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg 1999): hub and authority scores
    over a DIRECTED edge list — the bipartite-ranking companion to
    ``pagerank`` (who points at the good things / what is pointed at
    by the good pointers). Returns (node, hub, authority) for every
    node incident to an edge; nodes with no out-edges carry hub 0,
    no in-edges authority 0.

    Because every HITS step is LINEAR, per-round normalization
    constants factor out completely — so the iteration runs UNSCALED
    in exact integer arithmetic (hub_0 = 1; authority = sum of hub
    over in-neighbors; hub = sum of authority over out-neighbors; all
    DECIMAL(38,0) counts) and L1-normalizes ONCE at the end. That
    makes the fixed-k result partition-invariant with no float
    summation anywhere, replayable round-by-round in SQL, and avoids
    any per-round global pass.

    Scale shape: one equi-join of the score vector onto the edge list
    plus one groupBy per half-round (identical per-round cost to one
    PageRank step), eager localCheckpoint per round (truncated
    lineage, AQE picks join strategies from real sizes); the two L1
    totals are scalar aggregates cross-joined back (broadcast, never a
    node-scale window).
    """
    from .caching import track_persist

    e = track_persist(
        edges.select(F.col(src).alias("__s__"), F.col(dst).alias("__d__"))
        .filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .distinct()
    )
    d0 = "decimal(38,0)"
    nodes = (
        e.select(F.col("__s__").alias("node"))
        .union(e.select(F.col("__d__").alias("node")))
        .distinct()
    )
    nodes = iter_checkpoint(nodes, checkpoint_dir)
    hub = nodes.select("node", F.lit(1).cast(d0).alias("hub"))
    auth = None
    for _ in range(int(k)):
        auth = (
            e.join(hub, e["__s__"] == hub["node"])
            .groupBy(F.col("__d__").alias("node"))
            .agg(F.sum(F.col("hub")).cast(d0).alias("authority"))
        )
        auth = iter_checkpoint(auth, checkpoint_dir)
        hub = (
            e.join(auth, e["__d__"] == auth["node"])
            .groupBy(F.col("__s__").alias("node"))
            .agg(F.sum(F.col("authority")).cast(d0).alias("hub"))
        )
        hub = iter_checkpoint(hub, checkpoint_dir)
    scored = (
        nodes.join(hub, on="node", how="left")
        .join(auth, on="node", how="left")
        .select(
            "node",
            F.coalesce("hub", F.lit(0).cast(d0)).alias("__h__"),
            F.coalesce("authority", F.lit(0).cast(d0)).alias("__a__"),
        )
    )
    scored = iter_checkpoint(scored, checkpoint_dir)
    totals = scored.agg(
        F.sum("__h__").cast(d0).alias("__th__"),
        F.sum("__a__").cast(d0).alias("__ta__"),
    )
    # divide in doubles: decimal/decimal quantizes to scale 6 and
    # would truncate the normalized scores below `digits`
    return scored.crossJoin(totals).select(
        "node",
        (
            F.round(
                F.col("__h__").cast("double") / F.col("__th__").cast("double"),
                digits,
            )
            + F.lit(0.0)
        ).alias("hub"),
        (
            F.round(
                F.col("__a__").cast("double") / F.col("__ta__").cast("double"),
                digits,
            )
            + F.lit(0.0)
        ).alias("authority"),
    )


def assortativity(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    digits: int = 6,
) -> DataFrame:
    """Degree assortativity of an undirected graph (Newman 2002): the
    Pearson correlation of endpoint degrees over the symmetrized edge
    list — one number answering "do hubs attach to hubs (r > 0,
    social-network shape) or to leaves (r < 0, hub-and-spoke /
    bipartite shape)?". That sign decides whether a pair-join over the
    graph explodes (assortative cores) before anyone runs it.

    All moments are INTEGER-exact: degrees are counts, so the six
    sufficient sums accumulate as DECIMAL(38,0) with no float
    summation anywhere (the ``spearman_corr`` certification pattern);
    the one division happens on the reduced row. Returns a single row
    (n_nodes, n_edges, r); degree-regular graphs (zero variance)
    yield NULL r.

    Scale shape: canonicalize + distinct (one shuffle), a degree
    groupBy, two joins of the bounded degree table back onto edges on
    the node key, one global moment aggregate.
    """
    from .caching import track_persist

    e = track_persist(
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    # each undirected edge contributes BOTH (da,db) and (db,da), making
    # the correlation symmetric without special-casing
    sym = e.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    paired = (
        sym.join(deg.withColumnRenamed("node", "u"), on="u")
        .withColumnRenamed("degree", "du")
        .join(
            deg.withColumnRenamed("node", "v").withColumnRenamed(
                "degree", "dv"
            ),
            on="v",
        )
    )
    d0 = "decimal(38,0)"
    du, dv = F.col("du"), F.col("dv")
    mom = paired.agg(
        F.count(F.lit(1)).cast("long").alias("m2"),
        F.sum(du.cast(d0)).alias("__su__"),
        F.sum(dv.cast(d0)).alias("__sv__"),
        F.sum((du * du).cast(d0)).alias("__suu__"),
        F.sum((dv * dv).cast(d0)).alias("__svv__"),
        F.sum((du * dv).cast(d0)).alias("__suv__"),
    )
    n_nodes = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    m = F.col("m2").cast("double")
    su = F.col("__su__").cast("double")
    sv = F.col("__sv__").cast("double")
    num = F.col("__suv__").cast("double") - su * sv / m
    da = F.col("__suu__").cast("double") - su * su / m
    db = F.col("__svv__").cast("double") - sv * sv / m
    r = F.when((da > 0.0) & (db > 0.0), num / F.sqrt(da * db)).otherwise(
        F.lit(None).cast("double")
    )
    return n_nodes.crossJoin(
        mom.select(
            (F.col("m2") / 2).cast("long").alias("n_edges"),
            (F.round(r, digits) + F.lit(0.0)).alias("r"),
        )
    )


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    label_col: str = "label",
    digits: int = 6,
) -> DataFrame:
    """Newman modularity Q of a node partition over an undirected
    graph — the quality score for ``label_propagation``/``dup_clusters``
    output (Q near 0: the partition is no better than random; Q > 0.3:
    real community structure):

        Q = sum_c [ m_c/m  -  (d_c / 2m)^2 ]

    with m total edges, m_c intra-community edges, d_c the community's
    total degree. Every input is an integer COUNT, so per-community
    terms are computed from exact integers and rounded once; the total
    Q sums the bounded community table's rounded contributions as
    decimals (partition-invariant, the ``srm_check`` pattern).

    Returns one row per community: (label, n_nodes, m_intra, d_total,
    q_contrib, q_total) with q_total repeated — the per-community
    detail IS the diagnostic (which communities carry the structure).

    Scale shape: two label joins onto the canonical edge list (node
    key), one degree groupBy; the two global reductions (total edges,
    total Q) are scalar aggregates cross-joined back (broadcast) —
    never a window over the community table, which is node-scale in
    the worst case (all-singleton partitions).
    """
    from .caching import track_persist

    e = track_persist(
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    lab = labels.select(
        F.col(node_col).alias("node"), F.col(label_col).alias("__lab__")
    )
    # intra-community edge counts
    la = lab.withColumnRenamed("node", "a").withColumnRenamed(
        "__lab__", "__la__"
    )
    lb = lab.withColumnRenamed("node", "b").withColumnRenamed(
        "__lab__", "__lb__"
    )
    tagged = e.join(la, on="a").join(lb, on="b")
    m_intra = (
        tagged.filter(F.col("__la__") == F.col("__lb__"))
        .groupBy(F.col("__la__").alias("label"))
        .agg(F.count(F.lit(1)).cast("long").alias("m_intra"))
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    comm = (
        lab.join(deg, on="node", how="inner")
        .groupBy(F.col("__lab__").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("degree").cast("long").alias("d_total"),
        )
    )
    base = (
        comm.join(m_intra, on="label", how="left")
        .select(
            "label",
            "n_nodes",
            F.coalesce("m_intra", F.lit(0)).cast("long").alias("m_intra"),
            "d_total",
        )
        .localCheckpoint(eager=True)
    )
    # total edge count derives from total degree: m = sum(d)/2 — a
    # 1-row scalar aggregate broadcast back via cross join
    m_tot = base.agg((F.sum("d_total") / 2).cast("long").alias("__m__"))
    per = base.crossJoin(m_tot)
    mm = F.col("__m__").cast("double")
    q = (
        F.col("m_intra").cast("double") / mm
        - (F.col("d_total").cast("double") / (2.0 * mm))
        * (F.col("d_total").cast("double") / (2.0 * mm))
    )
    per = per.select(
        "label",
        "n_nodes",
        "m_intra",
        "d_total",
        (F.round(q, digits) + F.lit(0.0)).alias("q_contrib"),
    ).localCheckpoint(eager=True)
    q_tot = per.agg(
        F.round(
            F.sum(F.col("q_contrib").cast("decimal(18,6)")).cast("double"),
            digits,
        ).alias("__qt__")
    )
    return per.crossJoin(q_tot).select(
        "label",
        "n_nodes",
        "m_intra",
        "d_total",
        "q_contrib",
        (F.col("__qt__") + F.lit(0.0)).alias("q_total"),
    )
