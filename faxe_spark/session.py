"""SparkSession construction tuned for this engine.

Scale notes (100 TB target):
- AQE on: runtime coalescing + skew-join splitting replace hand-tuned
  shuffle partition counts at large SF.
- Arrow on: every Pandas-UDF operator (as-of join exact mode, stateful
  ops) moves data in columnar batches, not pickled rows.
- shuffle.partitions defaults to the core count locally; on a real
  cluster this is overridden by AQE's coalescing from a high initial
  value (set spark.sql.adaptive.coalescePartitions.initialPartitionNum).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs we also apply to externally-owned sessions
# (the verify driver constructs its own SparkSession).
_RUNTIME_CONFS = {
    # the driver testdata stores events.ts as parquet TIMESTAMP(NANOS),
    # which Spark only reads as a long when this legacy flag is on; the
    # loader (tables.py) converts ns -> TimestampType.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
}


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an existing session (driver-owned)."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf may be static in some envs
            pass
    return spark


def get_spark(app_name: str = "faxe-spark", cpus: int | None = None) -> SparkSession:
    """Build (or get) a SparkSession for local dev/test/bench.

    Honors SPARK_GRAFT_CPUS; defaults shuffle partitions to core count —
    correct for local[N]; a cluster deployment would instead rely on AQE
    coalescing from a larger initial partition number.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    return configure_session(builder.getOrCreate())
