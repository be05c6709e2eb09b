"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query; ``queries``/``oracle_sql`` register
every implemented operator from SURVEY.md §2 (plus the LLM-pipeline
extensions) for the DuckDB-differential correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_ROOT)

from clinical_data_lake_spark.flagship import flagship  # noqa: E402

_PKG_SHIPPED: set[int] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make the package importable on executor Python workers.

    mapInPandas/pandas_udf closures are self-contained by convention
    here, but any stray module reference in a pickled closure would
    need the package on the worker's sys.path — which only happens by
    accident when the driver's cwd is the repo root. Shipping a zip via
    addPyFile removes the dependency on cwd entirely."""
    key = id(spark.sparkContext)
    if key in _PKG_SHIPPED:
        return
    try:
        import shutil
        import tempfile

        base = os.path.join(tempfile.mkdtemp(prefix="cdl_pkg_"), "clinical_data_lake_spark")
        zip_path = shutil.make_archive(
            base, "zip", root_dir=_REPO_ROOT, base_dir="clinical_data_lake_spark"
        )
        spark.sparkContext.addPyFile(zip_path)
    except Exception:
        pass  # local[*] with repo cwd still works without it
    _PKG_SHIPPED.add(key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ship_package(spark)
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from clinical_data_lake_spark.driver_queries import QUERIES

    def bind(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship_package(spark)
            return fn(spark, sf_dir)

        run.__doc__ = fn.__doc__
        return run

    return {name: bind(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    from clinical_data_lake_spark.driver_queries import ORACLES

    return dict(ORACLES)
