"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query (SURVEY.md §7.5 slice) on
sf0.001; `queries()` / `oracle_sql()` expose the full registry
(faxe_spark/registry.py) for the DuckDB correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

from faxe_spark.registry import QUERIES  # noqa: E402


def _ensure_shipped(spark: SparkSession) -> None:
    """Executor Python workers inherit the DRIVER's cwd at session
    creation — if that isn't the repo root, `import faxe_spark` fails
    inside any Pandas UDF. Ship the package once per session via
    addPyFile so queries work regardless of where the harness ran."""
    if getattr(spark, "_faxe_spark_shipped", False):
        return
    import shutil
    import tempfile

    z = os.path.join(tempfile.gettempdir(), "faxe_spark_pkg")
    shutil.make_archive(z, "zip", root_dir=_REPO, base_dir="faxe_spark")
    spark.sparkContext.addPyFile(z + ".zip")
    spark._faxe_spark_shipped = True


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_shipped(spark)
    return QUERIES["win_time_agg"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark, sf_dir, _fn=fn):
            _ensure_shipped(spark)
            return _fn(spark, sf_dir)
        return run
    return {name: wrap(q.fn) for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.sql for name, q in QUERIES.items() if q.sql is not None}
