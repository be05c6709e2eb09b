"""Per-stage profile of declared queries — the guide-§1 empirical loop
without a live UI: run each query under its own job group (noop sink),
then pull /api/v1 jobs+stages from the local UI and aggregate per
query: job count, stage count, task time, shuffle bytes, and the top
stages by duration (stage names encode the operator + callsite).

Usage:
    python scripts/profile_query.py <query1,query2,...> [reps]

Data dir from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1); the
session matches bench.py. Each query runs a sf0.001 warmup first so
codegen/JIT isn't billed to the profiled run. Output to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clinical_data_lake_spark.jvm_opts import ensure_submit_args

ensure_submit_args(driver_memory="16g")

from pyspark.sql import SparkSession  # noqa: E402


_SEEN_EXECS: set = set()


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.load(r)


def main() -> None:
    names = [q.strip() for q in sys.argv[1].split(",") if q.strip()]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from clinical_data_lake_spark.driver_queries import QUERIES
    from clinical_data_lake_spark.operators.caching import release_persisted

    import bench

    spark = (
        SparkSession.builder.appName("cdl-profile")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus if cpus.isdigit() else "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.ui.retainedJobs", "10000")
        .config("spark.ui.retainedStages", "10000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    warm = "/root/testdata/sf0.001"

    def fn(name):
        return QUERIES[name] if name in QUERIES else bench.EXTRA_BENCH[name]

    for name in names:
        # warmup (codegen/JIT) at sf0.001
        try:
            fn(name)(spark, warm).write.format("noop").mode("overwrite").save()
        except Exception as ex:
            print(f"warmup {name} failed: {ex}", file=sys.stderr)
        release_persisted()
        # mark warmup executions as seen so rep metrics are clean
        try:
            for ex_ in _api(base, "/sql?details=false&length=10000"):
                _SEEN_EXECS.add(ex_.get("id"))
        except Exception:
            pass
        for rep in range(reps):
            group = f"prof:{name}:{rep}"
            spark.sparkContext.setJobGroup(group, group)
            t0 = time.perf_counter()
            df = fn(name)(spark, sf_dir)
            t_build = time.perf_counter() - t0
            df.write.format("noop").mode("overwrite").save()
            t_total = time.perf_counter() - t0
            release_persisted()
            spark.sparkContext.setJobGroup(None, None)

            jobs = _api(base, "/jobs?status=succeeded")
            myjobs = [j for j in jobs if j.get("jobGroup") == group]
            stage_ids = sorted(
                {s for j in myjobs for s in j.get("stageIds", [])}
            )
            stages = []
            for sid in stage_ids:
                try:
                    for att in _api(base, f"/stages/{sid}"):
                        if att.get("status") == "COMPLETE":
                            stages.append(att)
                except Exception:
                    pass
            tot_task_ms = sum(s.get("executorRunTime", 0) for s in stages)
            sh_read = sum(s.get("shuffleReadBytes", 0) for s in stages)
            sh_write = sum(s.get("shuffleWriteBytes", 0) for s in stages)
            n_tasks = sum(s.get("numCompleteTasks", 0) for s in stages)
            print(
                f"\n=== {name} rep{rep}: wall {t_total:.2f}s "
                f"(build {t_build:.2f}s) | {len(myjobs)} jobs, "
                f"{len(stages)} stages, {n_tasks} tasks | "
                f"task-time {tot_task_ms/1000.0:.1f}s | "
                f"shuffle R/W {sh_read/1e6:.1f}/{sh_write/1e6:.1f} MB",
                file=sys.stderr,
            )
            # wall-clock per stage: completionTime - firstTaskLaunchedTime
            def _wall(s):
                try:
                    from datetime import datetime

                    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                    t1 = datetime.strptime(s["completionTime"], fmt)
                    t0s = datetime.strptime(s["firstTaskLaunchedTime"], fmt)
                    return (t1 - t0s).total_seconds()
                except Exception:
                    return -1.0
            by_cost = sorted(stages, key=lambda s: -_wall(s))[:14]
            for s in by_cost:
                nm = s.get("name", "?").split("\n")[0][:110]
                print(
                    f"  stage {s['stageId']:>5} wall {_wall(s):6.2f}s "
                    f"run {s.get('executorRunTime',0)/1000.0:6.2f}s "
                    f"tasks {s.get('numCompleteTasks',0):>3} "
                    f"shR {s.get('shuffleReadBytes',0)/1e6:7.2f}MB  {nm}",
                    file=sys.stderr,
                )
            # SQL-node metrics: aggregate time-like metrics by node name
            # across every SQL execution this query triggered
            try:
                sqls = _api(base, "/sql?details=true&planDescription=false&length=10000")
            except Exception:
                sqls = []
            import re as _re

            def _ms(v: str) -> float:
                # values like "1.2 s", "345 ms", "total (min, med, max...)\n1.2 s (...)"
                first = v.split("\n")[-1] if "\n" in v else v
                m = _re.match(r"([\d.,]+)\s*(ms|s|m|h)?", first.strip())
                if not m:
                    return 0.0
                x = float(m.group(1).replace(",", ""))
                unit = m.group(2) or "ms"
                return x * {"ms": 1.0, "s": 1000.0, "m": 60000.0, "h": 3600000.0}[unit]

            agg: dict[str, float] = {}
            n_execs = 0
            for ex in sqls:
                if ex.get("status") != "COMPLETED":
                    continue
                if ex.get("id") in _SEEN_EXECS:
                    continue
                _SEEN_EXECS.add(ex.get("id"))
                n_execs += 1
                for node in ex.get("nodes", []):
                    for met in node.get("metrics", []):
                        mn = met.get("name", "")
                        if "time" in mn or "duration" in mn:
                            key = f"{node.get('nodeName','?')}: {mn}"
                            agg[key] = agg.get(key, 0.0) + _ms(met.get("value", "0"))
            print(f"  -- SQL node time metrics (sum over {n_execs} executions, top 18):",
                  file=sys.stderr)
            for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:18]:
                print(f"    {v/1000.0:8.1f}s  {k[:120]}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
