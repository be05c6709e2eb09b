"""Partition-invariance certification for the r8 rotation window.

The 18 queries rotated into the driver's CORRECTNESS window for r8 had
never had a driver row; several rely on partition-invariant accumulation
patterns (decimal sums, md5-deterministic ordering, checkpoint-free
iterative closures). Before the driver looks, prove that each produces
IDENTICAL output — order-insensitive value hash over name-sorted
columns — under ``spark.sql.shuffle.partitions`` in {1, 7, 32}.

This pins the claim the SQL twins rest on: results depend on the data,
never on how the shuffle happened to split it.
"""

from __future__ import annotations

import datetime
import decimal
import hashlib
import math

import pytest

from clinical_data_lake_spark.driver_queries import QUERIES

from conftest import SF_SMALL

ROTATED_IN = [
    "semantic_dedup",
    "session_stats",
    "trending_topk",
    "fp_itemsets",
    "mutual_info",
    "graph_triangles",
    "pareto",
    "topn_others",
    "incidence",
    "period_growth",
    "impute_median",
    "iqr_filter",
    "class_prototypes",
    "nearest_prototype",
    "path_ngrams",
    "chunk_split",
    "strip_markup",
    "fs_score",
]

PARTITIONINGS = (1, 7, 32)

# r8-new operators whose determinism claims lean on decimal-sum /
# argmax patterns — proven partition-invariant before their r9 window
R8_NEW = [
    "wmedian_price",
    "label_entropy",
    "autocorr",
    "link_predict",
    "retrieval_metrics",
    "corr_matrix",
    "funnel_steps",
    "theil_sen",
    "mad_outliers",
    "benford",
    "event_streaks",
    "snapshot_cdc",
    "seq_gaps",
    "state_dwell",
    "cohort_ltv",
    "dashboard_assoc",
    "balance_classes",
    "multiclass_eval",
    "join_nearest",
    "profile_table",
]

# r9 Priority-2 window entries whose sketches are the classic
# merge-order hazard (HLL / KLL merge commutativity). The exact
# cube/rollup pair must be bit-identical; the approx pair is certified
# with an explicit tolerance (sketch merges are order-dependent at the
# margin, but estimates must stay within the sketch's accuracy bound
# across partitionings — that is the scale-invariance claim).
R9_EXACT = ["agg_cube", "agg_rollup"]
R9_APPROX = ["agg_approx_distinct", "agg_approx_percentile"]

# r9-new operators bound for the r10 window whose determinism leans on
# decimal sums, IEEE chain ordering, argmin tiebreaks, min-hop BFS, or
# rank arithmetic — certified before the driver ever sees them.
R9_NEW = [
    "ann_pq_topk",
    "mann_kendall",
    "spearman",
    "vocab_growth",
    "cooc_counts",
    "knn_classify",
    "silhouette",
    "khop",
    "forecast_eval",
    "sla_rollup",
    "cumulative_distinct",
    "tpch_q9",
    "tpch_q15",
    "tpch_q17",
    # late-r9 additions: MG sketch candidates must not change the exact
    # recount; winnowing's min-selection and BPE's weighted counts are
    # pure hash/integer arithmetic; tumble_distinct is dedup+count
    "heavy_hitters",
    "winnow_pairs",
    "bpe_pairs",
    "tumble_distinct",
    "anova_f",
    "decompose",
    "fs_patterns",
    "tpch_q8",
    "tpch_q2",
    "tpch_q21",
    "hard_negatives",
    "json_profile",
    "dp_counts",
    "forget_audit",
    "proportion_ci",
    "herfindahl",
]

# r10-new operators (bound for the r11 window): decimal replicate sums
# + exact percentiles (poisson_bootstrap), broadcast percentile
# boundaries (rfm), decimal entropy folds (l_diversity), integer
# gram-multiplicity rollups (dup_gram_coverage), pooled-gap arithmetic
# (fairness_audit) — certified before the driver ever sees them.
R10_NEW = [
    "dup_gram_coverage",
    "rfm_segments",
    "fairness_audit",
    "poisson_bootstrap",
    "l_diversity",
    # synchronous LPA argmax tie-breaks; fixed-bin integer histogram
    # merges (mergeability IS the invariance claim)
    "graph_lpa",
    "hist_quantile",
    # composed ER closure (min-label CC over thresholded FS matches);
    # conformal order statistic + md5 split
    "er_pipeline",
    "conformal",
    # skyline's running-max window; ab_power's pooled re-aggregate
    "skyline",
    "ab_power",
    # decimal sufficient-statistics moments broadcast over the facts
    "mahalanobis",
    # PrefixSpan support counting over per-key sorted sequences
    "seq_patterns",
    # bucketed write + shuffle-free rollup must be partitioning-blind
    "bucketed_agg",
    # gaps-and-islands era merge with duplicate tie rows
    "build_eras",
    # windowed fixed-bin counts (streaming-mergeable summary)
    "windowed_hist",
    # contingency folds with decimal marginal products / log-CI math
    "cohens_kappa",
    "odds_ratio",
    # per-entity lag classification + lagged aggregate churn
    "growth_accounting",
    # pooled decimal moments broadcast into per-group adjusted aggs
    "cuped",
    # clinical/epi pack: per-stratum decimal term sums (CMH), decimal
    # score moments (trend test), decimal hazard cumsum (Nelson-Aalen)
    "risk_measures",
    "mcnemar",
    "cmh",
    "cochran_armitage",
    "nelson_aalen",
    # causal pack: single-pass conditional decimal moments; bucketed
    # nearest-match carries with cross-bucket handoff
    "smd_balance",
    "psm_match",
    # reporting: in-group rank trims, bucketed Lorenz ranks, rounded
    # per-touch credit decimal sums
    "trimmed_mean",
    "lorenz_curve",
    "attribution_credit",
    # eval/divergence: md5-replayed replicates, decimal MI/JSD folds
    "permutation_test",
    "info_gain",
    "js_divergence",
    "blocklist",
    # product metrics: decile decimal folds, integer pair counts,
    # exact percentiles, distinct-day reductions
    "brier_ece",
    "kendall_tau",
    "time_to_convert",
    "stickiness",
    # closed-form normal-equation solve; cross-corpus LM backoff join
    "ols2",
    "lm_cross_score",
    # KM-step area fold; per-pair distinct reductions; vocab-table
    # merge folds joined back to the corpus
    "rmst",
    "fd_check",
    "bpe_encode",
    # decimal per-dim pooling; filtered top-k rank determinism
    "embed_pool",
    "ann_filtered",
    # island-merge day sums; decimal person-time reductions
    "pdc",
    "person_time",
    # gap-constrained conditional group-mins; decimal line-sum joins
    "funnel_timeboxed",
    "header_detail",
    # causal completions: stratum reweighting, four-cell decimal DiD,
    # sensitivity arithmetic on the shared 2x2
    "cem_match",
    "did",
    "evalue",
    # precision-weighted decimal pooling; standardized-rate grid sums
    "meta_pool",
    "std_rate",
    # round-9 double moment folds over decimal sufficient sums;
    # decimal per-unit rollups; decimal chi2 window sum
    "weighted_corr",
    "partial_corr",
    "srm_check",
    "ratio_metric_ci",
    # integer-exact HITS iteration + single L1 normalization;
    # integer assortativity moments; per-community rounded divisions
    "graph_hits",
    "graph_assort",
    "graph_modularity",
    # exploded-token integer counts; class-by-value EMD grid walk
    # (round-12 decimal sums); grid-cell argmin determinism; hive-key
    # stats (min/max/count only)
    "readability",
    "fertility",
    "t_closeness",
    "spatial_nearest",
    "partition_stats",
    # broadcast-seed argmin + decimal means; round-9 decimal IPTW
    # weights; rollup-rank NULLS-FIRST contract; integer cum race
    "kmeans_step",
    "iptw",
    "rollup_topn",
    "cum_crossover",
    # round-12 prior/ratio folds before logs; top-k set determinism;
    # zero-filled grid moments; decimal person-time / Byar arithmetic
    "log_odds",
    "vocab_overlap",
    "seasonal_anomaly",
    "sir",
    # conditional decimal arm moments; integer pair counts;
    # zero-filled relative-week grid
    "welch_t",
    "sign_test",
    "event_study",
    # exact conditional percentiles; zero-filled bin CDF (round-12
    # decimal gap sum); complete-calendar label grid
    "qte",
    "wasserstein",
    "future_label",
    # hash-keyed covered-position joins + ordered rebuild; windowed
    # counts scored against broadcast round-9 baseline
    "span_dedup",
    "stream_anomaly",
    # broadcast-prototype guarded cosines, decimal means; per-key
    # count percentiles
    "embed_quality",
    "fk_fanout",
    # basket-keyed integer co-occurrence + deterministic top-k
    "item_cf",
    # bitmask pattern rollup + literal-weight decimal Shapley terms
    "shapley",
    # integer dispersion moments; distinct-count Chapman arithmetic;
    # frequency-of-frequencies richness
    "overdisp",
    "capture_recapture",
    "chao1",
]

# r12-new operators (bound for their named window the same round they
# were registered — ROTATION.md). er_pipeline itself stays covered via
# R10_NEW; its r12 plan (SNM blocking) rides the same registry key.
R12_NEW = [
    # guarded fixed-cardinality-key ER demo: same FS scoring/closure,
    # per-block budget guard riding the pair join
    "er_pipeline_fixed_block_demo",
    # two-key SNM union blocking — bucketed ranks + canonical pair
    # union must be partitioning-blind
    "er_multipass",
    # MERGE clause algebra over a full-outer key join
    "merge_upsert",
    # watermarked dedup's batch twin: distinct key set
    "stream_dedup",
    # md5-deterministic IVF centroids + argmax cell assignment per
    # config — the sweep must not depend on scan/shuffle splits
    "ann_cells_sweep",
    # r12 session 2: sequential MERGE fold (three layered full-outer
    # merges), ER cluster-size rollup over the closure, and the
    # decimal-summed per-dimension embedding profile
    "stream_upsert",
    "er_cluster_stats",
    "embed_dim_stats",
    # r12 session 3 — the training-data curation pack: closure +
    # md5-cell split; two-stage fingerprint rollup; vocabulary-bounded
    # shingle/token aggregates with decimal regression terms; regexp
    # match counts; decimal norm sums; literal-limits token grid
    "leakage_split",
    "dup_rate_by_slice",
    "ngram_diversity",
    "zipf_fit",
    "pii_profile",
    "embed_norm_profile",
    "truncation_loss",
    # batch 2: exact percentile clip calibration; fingerprint
    # self-join syndication matrix; rate-formula planning table;
    # deterministic quantized-vs-exact recall
    "embed_clip_bounds",
    "cross_slice_dups",
    "mixture_plan",
    "quantized_recall",
    # batch 3: LSH-candidate closure; order-normalized split-pair
    # cells; declared-vs-detected language confusion rollup
    "dedup_clusters_lsh",
    "leakage_audit",
    "lang_mismatch",
    # batch 4: gated-fingerprint key set (dedup survivor choice is
    # arbitrary, the projected hash set is not)
    "stream_clean",
]

# r13-new operators (scheduled first in the r14 window at
# registration — ROTATION.md): hash-sampled percentile calibration;
# regexp-chain URL canonical keys; batch-bucketed watermark model;
# md5-portable minhash banding sweep against the lossless exact pair
# set
R13_NEW = [
    "embed_clip_bounds_approx",
    "url_dedup",
    "watermark_lateness",
    "minhash_lsh_sweep",
    # session 2: fingerprint + directed capped-index decision table;
    # distributed prefix-sum shard assignment
    "incremental_dedup",
    "shard_plan",
    # session 3: the sequential-admission fold (checkpointed per-slice
    # decisions must not depend on how the shuffle split any slice)
    "stream_admission",
]

# r14-new operators (scheduled first in the r15 window at
# registration — ROTATION.md): per-(doc, ledger) admission decisions
# over the source-tagged union; stale-centroid cell occupancy drift
# (the Arrow-batched assignment must not depend on batch boundaries);
# two-vocab fertility deltas
R14_NEW = [
    "multi_ledger_dedup",
    "ann_ivf_admit",
    "fertility_drift",
    # session 2: stale-index recall drift (k-bounded per-query lists
    # must not depend on shuffle layout)
    "ann_recall_drift",
    # session 3: topline PSI triplet (rounded-term sums over bounded
    # bin/category tables must not depend on partition merge order)
    "ingest_drift",
]

R15_NEW = [
    # sampled PSI monitor: the md5 sample cut must be row-deterministic
    # (hash of the id, never of partition layout)
    "ingest_drift_sampled",
    # ledger GC: both decision windows key on data (id / fingerprint),
    # so the keep/superseded/dup_retired multiset is layout-free
    "ledger_compaction",
    # fused re-fit decision: single-row policy output over the two
    # bounded audit aggregates
    "ann_refit_policy",
    # packing drift: id-mod shards + ROWS-frame cumsum are pure
    # arithmetic in (id, tokens) — no layout term anywhere
    "packing_drift",
    # session 2: the slice rollup + lag must not depend on partition
    # merge order; the full-outer diff keys purely on (id, fp, source)
    "admission_trend",
    "snapshot_diff",
    # session 3: the composed maintenance job (compaction -> admission
    # -> trend) must be layout-free end-to-end
    "maintenance_pipeline",
]


def _canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, decimal.Decimal):
        return f"d:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return f"t:{v.isoformat()}"
    if isinstance(v, (bytes, bytearray)):
        return f"x:{bytes(v).hex()}"
    return f"s:{v}"


def _result_hash(df) -> str:
    cols = sorted(df.columns)
    rows = sorted(tuple(_canon(r[c]) for c in cols) for r in df.collect())
    h = hashlib.sha256()
    h.update(repr(cols).encode())
    for row in rows:
        h.update(repr(row).encode())
    return h.hexdigest()


@pytest.mark.parametrize("name", R9_APPROX)
def test_partition_invariant_approx(spark, name):
    """The approx queries expose (exact value, within_tol flag). Across
    partitionings the exact column must be bit-identical and the
    tolerance flag must hold under EVERY merge order — the sketch's
    estimate may drift within its accuracy bound, the contract may not."""
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    exact_vals = {}
    try:
        for n_part in PARTITIONINGS:
            spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
            # Also vary the scan parallelism: sketch partials are built
            # per input split, so repartitioning the input exercises a
            # different merge tree than the shuffle knob alone.
            rows = QUERIES[name](spark, SF_SMALL).collect()
            assert len(rows) == 1
            r = rows[0]
            flag_col = "within_tol"
            exact_col = [c for c in r.asDict() if c != flag_col][0]
            assert r[flag_col] == 1, (
                f"{name}: sketch left its accuracy bound at "
                f"shuffle.partitions={n_part}"
            )
            exact_vals[n_part] = _canon(r[exact_col])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert len(set(exact_vals.values())) == 1, (
        f"{name}: exact companion value depends on partitioning: {exact_vals}"
    )


@pytest.mark.parametrize(
    "name",
    ROTATED_IN + R8_NEW + R9_EXACT + R9_NEW + R10_NEW + R12_NEW + R13_NEW
    + R14_NEW + R15_NEW,
)
def test_partition_invariant(spark, name):
    from clinical_data_lake_spark.operators.caching import release_persisted

    orig = spark.conf.get("spark.sql.shuffle.partitions")
    hashes = {}
    try:
        for n_part in PARTITIONINGS:
            spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
            hashes[n_part] = _result_hash(QUERIES[name](spark, SF_SMALL))
            # operators that track_persist intermediates would otherwise
            # accumulate cached RDDs across the whole parameterized
            # matrix — enough to flake late entries under full-suite load
            release_persisted()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert len(set(hashes.values())) == 1, (
        f"{name}: output depends on shuffle partitioning: "
        + ", ".join(f"p={k} -> {v[:12]}" for k, v in hashes.items())
    )
