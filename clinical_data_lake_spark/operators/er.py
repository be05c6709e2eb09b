"""Entity-resolution composition: thresholded match pairs to resolved
clusters.

The individual ER stages each exist as certified operators — blocking
(``joins.fuzzy_join`` length bands, ``dedup.sorted_neighborhood_pairs``,
key blocking), pairwise scoring (``joins.fs_match_score``, EM-estimated
weights via ``joins.fs_em_weights``), and transitive closure
(``llm.dedup.dup_clusters``). This module is the composed artifact a
deduplication/master-data user actually runs: score-thresholded pairs
in, resolved entity clusters out. The counterpart of
``llm/corpus.py``'s composed pretraining pipeline for the
record-linkage workload (the reference joins records on exact codes
only; probabilistic resolution is the extension every real-world
registry needs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_matches(
    scored_pairs: DataFrame,
    id_a: str,
    id_b: str,
    match_col: str = "is_match",
) -> DataFrame:
    """Resolve scored candidate pairs into entity clusters: keep pairs
    where ``match_col`` holds, take the transitive closure (min-label
    connected components — matches are symmetric and "same entity" is
    transitive by policy), and annotate every clustered record with its
    cluster id and size. Returns (entity_id, cluster_id, cluster_size);
    records with no accepted match are absent (they are their own
    entity).

    Scale shape: inherits ``dup_clusters``' distributed CC (one
    edge-keyed equi-join per round, rounds = cluster diameter,
    localCheckpoint-truncated lineage); the size annotation is a
    cluster-level rollup joined back onto the (entity, cluster) table —
    nothing fact-sized beyond the pair input itself.
    """
    from ..llm.dedup import dup_clusters

    matches = scored_pairs.filter(F.col(match_col)).select(
        F.col(id_a), F.col(id_b)
    )
    clusters = dup_clusters(
        matches,
        left=id_a,
        right=id_b,
        id_alias="entity_id",
        cluster_alias="cluster_id",
    )
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return clusters.join(sizes, on="cluster_id").select(
        "entity_id", "cluster_id", "cluster_size"
    )
