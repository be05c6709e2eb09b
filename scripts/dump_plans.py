"""Dump .explain("formatted") for a set of declared queries to
plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence the
judge checks plan claims against.

Usage:
    python scripts/dump_plans.py <suffix> <query1,query2,...> [tag]

suffix is e.g. "before" or "after"; tag defaults to r15. Data dir from
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1). Plans are built
(not executed) under the bench session config, so the dumped plan is
the one the bench times (initial AQE plan, isFinalPlan=false).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clinical_data_lake_spark.jvm_opts import ensure_submit_args

ensure_submit_args(driver_memory="16g")

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = [q.strip() for q in sys.argv[2].split(",") if q.strip()]
    tag = sys.argv[3] if len(sys.argv) > 3 else "r15"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from clinical_data_lake_spark.driver_queries import QUERIES
    from clinical_data_lake_spark.operators.caching import release_persisted

    import bench

    spark = (
        SparkSession.builder.appName("cdl-dump-plans")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus if cpus.isdigit() else "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn = QUERIES[name] if name in QUERIES else bench.EXTRA_BENCH[name]
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        n_py = plan.count("EvalPython") + plan.count("MapInArrow") + plan.count(
            "MapInPandas"
        )
        print(
            f"{name}: wrote {path} ({len(plan)} chars, "
            f"Exchange x{n_ex}, python-nodes x{n_py})",
            file=sys.stderr,
        )
        release_persisted()
    spark.stop()


if __name__ == "__main__":
    main()
