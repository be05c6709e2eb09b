"""jvm_opts.ensure_submit_args: the r12 fix for the r11 bench wound.

The r11 harnesses applied -XX:-UseDynamicNumberOfCompilerThreads via
os.environ.setdefault — a silent no-op when the calling harness presets
PYSPARK_SUBMIT_ARGS (it did), so BENCH_r11 ran without the fix and paid
the root-caused C2-starvation cliff. These tests pin the merge logic on
plain dicts, then assert the flag ACTUALLY reached the live test JVM.
"""

from __future__ import annotations

import shlex

from clinical_data_lake_spark.jvm_opts import (
    COMPILER_POOL_FLAG,
    ensure_submit_args,
    jvm_input_arguments,
)


def test_unset_builds_from_scratch():
    env: dict[str, str] = {}
    v = ensure_submit_args(driver_memory="16g", env=env)
    toks = shlex.split(v)
    assert env["PYSPARK_SUBMIT_ARGS"] == v
    assert toks[-1] == "pyspark-shell"
    i = toks.index("--driver-memory")
    assert toks[i + 1] == "16g"
    j = toks.index("--driver-java-options")
    assert COMPILER_POOL_FLAG in toks[j + 1].split()


def test_preset_without_flag_gets_flag_injected():
    # the exact shape that defeated setdefault in r11: a harness that
    # presets driver memory (and nothing else)
    env = {"PYSPARK_SUBMIT_ARGS": "--driver-memory 8g pyspark-shell"}
    v = ensure_submit_args(driver_memory="16g", env=env)
    toks = shlex.split(v)
    j = toks.index("--driver-java-options")
    assert COMPILER_POOL_FLAG in toks[j + 1].split()
    # caller's explicit heap is respected, not overridden
    i = toks.index("--driver-memory")
    assert toks[i + 1] == "8g"
    assert toks[-1] == "pyspark-shell"


def test_preset_with_existing_java_options_merges_not_clobbers():
    env = {
        "PYSPARK_SUBMIT_ARGS": (
            '--driver-java-options "-Xss4m -Dfoo=bar" pyspark-shell'
        )
    }
    v = ensure_submit_args(env=env)
    toks = shlex.split(v)
    opts = toks[toks.index("--driver-java-options") + 1].split()
    assert "-Xss4m" in opts and "-Dfoo=bar" in opts
    assert COMPILER_POOL_FLAG in opts


def test_equals_form_normalized_and_merged():
    env = {
        "PYSPARK_SUBMIT_ARGS": "--driver-java-options=-Xss4m pyspark-shell"
    }
    v = ensure_submit_args(env=env)
    toks = shlex.split(v)
    opts = toks[toks.index("--driver-java-options") + 1].split()
    assert "-Xss4m" in opts and COMPILER_POOL_FLAG in opts


def test_idempotent():
    env: dict[str, str] = {}
    v1 = ensure_submit_args(driver_memory="16g", env=env)
    v2 = ensure_submit_args(driver_memory="16g", env=env)
    assert v1 == v2
    assert shlex.split(v2).count("--driver-java-options") == 1
    opts = shlex.split(v2)
    assert opts[opts.index("--driver-java-options") + 1].split().count(
        COMPILER_POOL_FLAG
    ) == 1


def test_memory_added_when_absent():
    env = {"PYSPARK_SUBMIT_ARGS": f"--driver-java-options {COMPILER_POOL_FLAG} pyspark-shell"}
    v = ensure_submit_args(driver_memory="16g", env=env)
    toks = shlex.split(v)
    i = toks.index("--driver-memory")
    assert toks[i + 1] == "16g"


def test_missing_primary_resource_appended():
    env = {"PYSPARK_SUBMIT_ARGS": "--driver-memory 4g"}
    v = ensure_submit_args(env=env)
    assert shlex.split(v)[-1] == "pyspark-shell"


def test_extra_flags_appended_once():
    env: dict[str, str] = {}
    ensure_submit_args(
        java_options=(COMPILER_POOL_FLAG, "-XX:CICompilerCount=18"), env=env
    )
    v = ensure_submit_args(
        java_options=(COMPILER_POOL_FLAG, "-XX:CICompilerCount=18"), env=env
    )
    toks = shlex.split(v)
    opts = toks[toks.index("--driver-java-options") + 1].split()
    assert opts.count("-XX:CICompilerCount=18") == 1
    assert opts.count(COMPILER_POOL_FLAG) == 1


def test_flag_reached_live_jvm(spark):
    """Ground truth: conftest ran ensure_submit_args before the session
    JVM launched, so the fixed-compiler-pool flag must appear in the
    JVM's actual input arguments — the assertion the r11 setdefault
    path could never have passed under a preset harness env."""
    args = jvm_input_arguments(spark)
    assert COMPILER_POOL_FLAG in args, (
        "compiler-pool flag did not reach the test JVM; "
        f"input args = {args}"
    )
