"""Pre-launch JVM option plumbing for local-mode harnesses.

In local mode the gateway JVM reads ONLY ``PYSPARK_SUBMIT_ARGS`` —
builder ``.config("spark.driver.memory", ...)`` / extraJavaOptions are
silently ignored once the JVM exists. The r11 harnesses pinned the
root-caused C2-compiler-starvation fix
(``-XX:-UseDynamicNumberOfCompilerThreads``, see bench.py) via
``os.environ.setdefault`` — a silent no-op whenever the CALLING harness
presets the variable (as any harness that sets driver memory does).
BENCH_r11 demonstrably ran without the flag and paid the 3-24x
positional cliff again.

:func:`ensure_submit_args` fixes the class of bug: it MERGES the
required ``--driver-java-options`` flags (and, when absent, the driver
heap) into any preset ``PYSPARK_SUBMIT_ARGS`` instead of yielding, so
the flags provably reach the JVM regardless of caller environment.
Pure string/env manipulation — safe to import before pyspark.
"""

from __future__ import annotations

import os
import shlex
import sys
from collections.abc import MutableMapping
from typing import Iterable, Optional

# JDK 11+ stops idle compiler threads and restarts them on demand; in
# long codegen-heavy marathons the restart silently fails and C2
# compilation stops process-wide, stranding hot generated loops at C1
# tier (5-40x inflation, measured and root-caused in round 11 — see
# bench.py's header comment for the forensics).
COMPILER_POOL_FLAG = "-XX:-UseDynamicNumberOfCompilerThreads"

_PRIMARY_RESOURCE = "pyspark-shell"


def _quote(tok: str) -> str:
    return shlex.quote(tok) if (" " in tok or '"' in tok or "'" in tok) else tok


def ensure_submit_args(
    java_options: Iterable[str] = (COMPILER_POOL_FLAG,),
    driver_memory: Optional[str] = None,
    env: MutableMapping[str, str] = os.environ,
) -> str:
    """Guarantee ``PYSPARK_SUBMIT_ARGS`` carries the given JVM flags.

    - Unset/empty variable: build it from scratch (options + optional
      ``--driver-memory`` + ``pyspark-shell``), exactly what the old
      ``setdefault`` blocks wrote.
    - Preset variable: parse it, append any MISSING flags to the
      existing ``--driver-java-options`` value (adding the option if
      absent), and insert ``--driver-memory`` only when the caller did
      not set one — an explicit caller heap is respected (noted on
      stderr), required flags are not negotiable.

    Returns the final value (also written back to ``env``). Idempotent:
    flags already present are never duplicated. Must run BEFORE the
    first SparkSession/JVM launch to have any effect; see
    tests/test_jvm_opts.py for the live-JVM assertion.
    """
    wanted = [f for f in java_options if f]
    existing = env.get("PYSPARK_SUBMIT_ARGS", "").strip()

    if not existing:
        parts: list[str] = []
        if driver_memory:
            parts += ["--driver-memory", driver_memory]
        if wanted:
            parts += ["--driver-java-options", " ".join(wanted)]
        parts.append(_PRIMARY_RESOURCE)
        value = " ".join(_quote(p) for p in parts)
        env["PYSPARK_SUBMIT_ARGS"] = value
        return value

    toks = shlex.split(existing)

    # --- merge java options -------------------------------------------------
    opt_idx = None  # index of the VALUE token for --driver-java-options
    i = 0
    while i < len(toks):
        t = toks[i]
        if t == "--driver-java-options" and i + 1 < len(toks):
            opt_idx = i + 1
            break
        if t.startswith("--driver-java-options="):
            # normalize the = form into the two-token form
            toks[i : i + 1] = ["--driver-java-options", t.split("=", 1)[1]]
            opt_idx = i + 1
            break
        i += 1

    if wanted:
        if opt_idx is not None:
            present = toks[opt_idx].split()
            missing = [f for f in wanted if f not in present]
            if missing:
                toks[opt_idx] = " ".join(present + missing)
        else:
            insert_at = (
                toks.index(_PRIMARY_RESOURCE)
                if _PRIMARY_RESOURCE in toks
                else len(toks)
            )
            toks[insert_at:insert_at] = [
                "--driver-java-options",
                " ".join(wanted),
            ]

    # --- driver memory: add only if the caller set none ----------------------
    if driver_memory:
        has_mem = any(
            t == "--driver-memory" or t.startswith("--driver-memory=")
            for t in toks
        )
        if not has_mem:
            toks[0:0] = ["--driver-memory", driver_memory]
        else:
            print(
                "jvm_opts: caller preset --driver-memory in "
                "PYSPARK_SUBMIT_ARGS; respecting it (wanted "
                f"{driver_memory})",
                file=sys.stderr,
            )

    if _PRIMARY_RESOURCE not in toks:
        toks.append(_PRIMARY_RESOURCE)

    value = " ".join(_quote(t) for t in toks)
    env["PYSPARK_SUBMIT_ARGS"] = value
    return value


def jvm_input_arguments(spark) -> list[str]:
    """The live JVM's actual input arguments (RuntimeMXBean) — the
    ground truth for asserting a flag really reached the process."""
    mx = (
        spark.sparkContext._jvm.java.lang.management.ManagementFactory
        .getRuntimeMXBean()
    )
    return list(mx.getInputArguments())
