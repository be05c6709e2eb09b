"""Scale-cliff bench (r10 verdict #4): run the heaviest registry
queries at sf0.1 and at the generated sf1 replica
(scripts/make_scale_data.py), in the SAME session shape, and write
``BENCH_SCALE.json`` with per-query times and the measured scaling
exponent  alpha = log(t_sf1 / t_sf0.1) / log(10)  — alpha ~ 1 is
linear, ~2 quadratic. Both scales run in one process so JIT/codegen
warmup cancels out of the ratio.

Warmup protocol (measured, not guessed): sf0.001 compiles each
query's codegen classes, but the JVM's C2 JIT only optimizes the hot
decimal/md5/when-chain loops after enough row iterations — a cold
sf0.1 `poisson_bootstrap` measured 11.8s/29s/253s across harness
variants vs a 4.7s steady state (reps 1-3 of the same query in one
session; BENCH_r10 recorded 5.97s from the 184-query marathon where
everything is C2-warm). So this bench runs ONE unmeasured sf0.1 pass
after the sf0.001 class-compile pass, then measures sf0.1 and sf1
back-to-back — both passes equally warm, so alpha reflects data
scaling, not JIT state.

Run on an idle host:  python scripts/scale_bench.py
"""

from __future__ import annotations

import json
import math
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# driver-memory must be fixed BEFORE the JVM launches — builder
# `.config("spark.driver.memory", ...)` is silently ignored in local
# mode because the gateway JVM reads only PYSPARK_SUBMIT_ARGS (the
# bench.py lesson; the first run of this script thrashed a 1g heap and
# reported 38x-inflated times for the explode-heavy queries). 16g
# matches bench.py exactly — a 48g heap measured WORSE (graph_hits
# 24s vs 9s, likely G1 region-size/locality effects), so bigger is
# not safer here.
# fixed compiler-thread pool: see bench.py — JDK's dynamic
# compiler-thread scaling silently loses C2 threads in long
# codegen-heavy runs, stranding hot loops at C1 tier (5-40x); LARGE
# pool here because this bench's query mix is the 30 heaviest codegen
# producers in the registry and floods the C2 queue harder than the
# full 184-query bench (see run_at). r12: MERGED into any preset
# PYSPARK_SUBMIT_ARGS instead of setdefault (which silently yields).
from clinical_data_lake_spark.jvm_opts import (  # noqa: E402
    COMPILER_POOL_FLAG,
    ensure_submit_args,
)

ensure_submit_args(
    java_options=(COMPILER_POOL_FLAG, "-XX:CICompilerCount=18"),
    driver_memory="16g",
)

from pyspark.sql import SparkSession

from clinical_data_lake_spark.driver_queries import (
    QUERIES,
    q_dedup_clusters_lsh_pure,
)
from clinical_data_lake_spark.operators.caching import release_persisted

# bench-only entries (not in QUERIES/ORACLES — see bench.py
# EXTRA_BENCH): measurable here so their scale records stay current
EXTRA = {"dedup_clusters_lsh_pure": q_dedup_clusters_lsh_pure}


def _fn(name: str):
    return QUERIES[name] if name in QUERIES else EXTRA[name]

# the r10 verdict's 12 named heaviest, extended to the top 30 of
# BENCH_r10 by cost — the queries whose plans carry the 100 TB claims
HEAVY = [
    "poisson_bootstrap", "semantic_dedup", "dedup_prefix_filter",
    "soft_dedup", "link_predict", "permutation_test", "khop",
    "graph_lpa", "graph_modularity", "graph_hits", "bpe_encode",
    "theil_sen",
    # extension tier (r11): next-heaviest 18
    "graph_pagerank", "dedup_sorted_ngh", "pretraining_pipeline",
    "winnow_pairs", "er_pipeline", "dedup_containment", "bpe_merges",
    "dedup_simhash", "silhouette", "ann_pq_topk", "dedup_pair_metrics",
    "corr_matrix", "graph_assort", "item_cf", "span_dedup",
    "dedup_minhash_lsh", "ann_recall", "fd_check",
]
# Scope the measured set without editing the file (single-query scale
# probes, e.g. SPARK_GRAFT_SCALE_QUERIES="er_pipeline"); scoped runs
# write BENCH_SCALE_SCOPED.json so the recorded full-set artifact is
# never clobbered by a probe.
_env_scale = os.environ.get("SPARK_GRAFT_SCALE_QUERIES")
if _env_scale:
    HEAVY = [q.strip() for q in _env_scale.split(",") if q.strip()]
OUT_FILE = os.environ.get("SPARK_GRAFT_SCALE_OUT") or (
    "BENCH_SCALE_SCOPED.json" if _env_scale else "BENCH_SCALE.json"
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# Both decade endpoints are env-overridable so the SAME harness
# measures any 10x pair — e.g. the sf1->sf10 second decade
# (SPARK_GRAFT_SCALE_SMALL=.scale/sf1 SPARK_GRAFT_SCALE_BIG=.scale/sf10).
SF01 = os.environ.get("SPARK_GRAFT_SCALE_SMALL", "/root/testdata/sf0.1")
SF1 = os.environ.get(
    "SPARK_GRAFT_SCALE_BIG", os.path.join(_REPO, ".scale", "sf1")
)
WARM = "/root/testdata/sf0.001"


def _sf_label(d: str) -> float:
    m = re.search(r"sf([0-9.]+)", d)
    return float(m.group(1)) if m else -1.0


def run_at(spark, sf_dir: str, passes: int = 1) -> dict[str, float]:
    """Per-query MIN over ``passes`` full sweeps. One-shot timings in
    codegen-heavy marathons are unreliable even with a fixed compiler
    pool: a flooded C2 queue leaves a query's hot loop at C1 tier for
    one run and compiled for the next (measured: same-session
    poisson_bootstrap 62.7s then 16.7s then ~5s steady). The minimum
    is the steady-state execution cost — the quantity that scales."""
    out: dict[str, float] = {}
    for p in range(passes):
        for name in HEAVY:
            t0 = time.perf_counter()
            _fn(name)(spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            t = round(time.perf_counter() - t0, 3)
            release_persisted()
            out[name] = min(out.get(name, t), t)
            print(f"  [{p}] {name}: {t:.2f}s", file=sys.stderr, flush=True)
    return out


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # r13: shuffle partitions overridable so the RECORDED protocol can
    # be the cluster-sized one (recommended_cluster_conf's 3x-cores
    # rule = 96 here). The r12 rows for dedup_prefix_filter/soft_dedup
    # carried misleading 32-partition alphas: 32 partitions at sf10
    # (100x sf0.1 data) under-parallelizes the shingle shuffles, and
    # the exponent then measures partition starvation, not the plan.
    parts = os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus if cpus.isdigit() else "32"
    )
    spark = (
        SparkSession.builder.appName("cdl-scale-bench")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print("warmup (sf0.001: codegen class compile)", file=sys.stderr)
    for name in HEAVY:
        try:
            _fn(name)(spark, WARM).write.format("noop").mode(
                "overwrite").save()
        except Exception as ex:
            print(f"warmup {name} failed: {ex}", file=sys.stderr)
        release_persisted()
    # unmeasured sf0.1 pass: C2-JIT the hot loops at real row counts
    # (see module docstring — steady state is ~2-6x faster than cold)
    print("warmup (sf0.1: JIT steady-state)", file=sys.stderr)
    run_at(spark, SF01)
    print("sf0.1 pass (min of 2)", file=sys.stderr)
    t01 = run_at(spark, SF01, passes=2)
    print("sf1 pass (min of 2)", file=sys.stderr)
    t1 = run_at(spark, SF1, passes=2)
    # key labels derive from the ACTUAL endpoints so env-overridden
    # decades (sf1 -> sf10) record truthful per-query keys
    lo, hi = _sf_label(SF01), _sf_label(SF1)
    klo, khi = f"t_sf{lo:g}", f"t_sf{hi:g}"
    result = {
        "sf_small": lo,
        "sf_big": hi,
        "queries": {
            q: {
                klo: t01[q],
                khi: t1[q],
                "ratio": round(t1[q] / t01[q], 2),
                "alpha": round(math.log(t1[q] / t01[q]) / math.log(hi / lo), 2),
            }
            for q in HEAVY
        },
        f"total_sf{lo:g}": round(sum(t01.values()), 1),
        f"total_sf{hi:g}": round(sum(t1.values()), 1),
    }
    with open(OUT_FILE, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
