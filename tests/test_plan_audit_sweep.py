"""Registry-wide scale-hygiene sweep: run ``plans.audit.audit_plan``
over every registered driver query at sf0.001 and assert zero
unwaived WARN findings — the 27 hand-picked plan locks generalized to
systematic coverage of all 182 query plans.

Waivers are explicit and name the bounded side-table that makes each
global window safe; a NEW unpartitioned window, row-UDF, or cartesian
product anywhere in the registry fails this test.
"""

from __future__ import annotations

from clinical_data_lake_spark.driver_queries import QUERIES
from clinical_data_lake_spark.operators.caching import release_persisted
from clinical_data_lake_spark.plans.audit import audit_plan

from conftest import SF_SMALL

# rule -> {query: bounded table justifying the waiver}. Every waived
# single-partition window runs over a table bounded by something far
# below data scale (bucket count, label vocabulary, period count,
# event-time cardinality) — never over fact-table rows.
WAIVERS = {
    "single-partition-window": {
        # (r12: semantic_dedup's waiver removed — centroid selection is
        # now a bounded TakeOrdered collect + vectorized UDF, no window)
        "pareto": "label-cardinality rollup (cumulative share ranks)",
        "period_growth": "period table (one row per calendar period)",
        "dedup_sorted_ngh": "per-prefix-bucket count table (global rank offsets)",
        "negative_samples": "256-bucket md5-ring offset table",
        "survival_logrank": "per-event-time exit table (distinct durations)",
        "auc_exact": "per-distinct-score rank table (Mann-Whitney)",
        "rrf_search": "per-query top-k candidate ranks (k-bounded)",
        "gini": "label-cardinality share table (Lorenz ranks)",
        "quantile_norm": "per-distinct-rank reference table",
        "feature_drift": "quantile-bin edge table (n_bins rows)",
        "budget_select": "256-bucket offset table (distributed prefix sum)",
        "cohort_case_control": "bounded cohort label table",
        "ks_separation": "256-bucket offset table (distributed CDF prefix sum)",
        "lift_gain": "n_bins-row decile table (cumulative gains walk)",
        "pr_curve": "n_bins-row decile table (rides lift_gain's walk)",
        "benford": "9-row digit table (total-count window)",
        "seq_gaps": "256-row bucket boundary table (last/first handoff)",
        "cumulative_distinct": "per-day first-seen table (one row per calendar day)",
        "psm_match": "n_buckets-row boundary table (cross-bucket nearest handoff)",
        "lorenz_curve": "bucket-count offset + n_points-row segment tables",
        "srm_check": "design-arm table (one row per experiment variant)",
        "cum_crossover": "calendar-day rollup table (one row per day)",
        "wasserstein": "n_bins-row zero-filled bin grid (CDF walk + totals)",
        "watermark_lateness": "256-row arrival-slice table, bounded by"
        " construction (prior-slice watermark maxes)",
        "shard_plan": "num_buckets-row id-range bucket table (distributed"
        " prefix-sum offsets — budget_select's shape)",
        "ann_ivf_admit": "n_cells-row occupancy table (corpus-share"
        " totals over the per-cell aggregate, bounded by construction)",
        "ingest_drift": "n_bins-row PSI bin tables (x2) + the"
        " lang-vocabulary-bounded category table (smoothing totals)",
        "ingest_drift_sampled": "same bounded PSI bin/category tables"
        " as ingest_drift (the hash sample shrinks the scan side only)",
        "ann_refit_policy": "n_cells-row occupancy table inherited from"
        " ivf_admission_audit (corpus-share totals, bounded by"
        " construction)",
        "admission_trend": "slice-count-bounded rate aggregate (the lag"
        " differences one row per arrival slice — config-bounded,"
        " never data-sized)",
        "maintenance_pipeline": "the same slice-count-bounded trend lag"
        " (admission_trend's tail stage)",
    },
}


def test_registry_plans_have_no_unwaived_warnings(spark):
    violations = []
    unused = {rule: set(names) for rule, names in WAIVERS.items()}
    for name, fn in QUERIES.items():
        try:
            findings = audit_plan(fn(spark, SF_SMALL))
        finally:
            release_persisted()
        for f in findings:
            if f.severity != "warn":
                continue
            if name in WAIVERS.get(f.rule, {}):
                unused[f.rule].discard(name)
                continue
            violations.append(f"{name}: [{f.rule}] {f.detail[:140]}")
    assert not violations, "unwaived plan warnings:\n" + "\n".join(violations)
    stale = {r: sorted(n) for r, n in unused.items() if n}
    assert not stale, f"waivers no longer needed (remove them): {stale}"
