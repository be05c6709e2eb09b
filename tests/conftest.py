from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# fixed JIT compiler-thread pool for the test JVM: the full suite is a
# 30+-minute codegen-heavy marathon, exactly the profile where JDK's
# dynamic compiler-thread scaling can silently stop C2 compilation
# (root-caused on the bench marathon — see bench.py); heap unchanged.
# r12: merged into any preset PYSPARK_SUBMIT_ARGS (setdefault silently
# yields when the caller presets the variable — the BENCH_r11 lesson).
from clinical_data_lake_spark.jvm_opts import ensure_submit_args  # noqa: E402

ensure_submit_args()

from clinical_data_lake_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="cdl-tests", shuffle_partitions=8)
    yield s
