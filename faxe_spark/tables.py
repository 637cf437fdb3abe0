"""Loading the driver testdata tables (TESTDATA.md).

`events.ts` is stored as parquet TIMESTAMP(NANOS); Spark reads it only
as a long (nanoseconds) under spark.sql.legacy.parquet.nanosAsLong.
We truncate ns -> us (exactly what DuckDB's TIMESTAMP cast does) so the
DuckDB oracle and Spark agree to the microsecond.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from faxe_spark.session import configure_session

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """spark.read.parquet with the footer-inference skipped on repeat
    reads: plain `read.parquet(path)` re-infers the schema from file
    footers on EVERY call (~150-250 ms driver-side per call measured
    on the 16-file staged tables — bench.py re-builds each query 3x,
    so this is a per-query tax, and at 100 TB footer inference over
    thousands of files is a driver stall, guide §7.3). We cache the
    inferred StructType per (path, dir-mtime) on the session object
    and hand it to `read.schema(...)`, which skips inference but still
    re-lists files — so an in-session overwrite is picked up via the
    mtime key (a Spark overwrite replaces the directory contents),
    and data is always re-read from parquet (nothing is persisted)."""
    key = path
    try:  # local paths: key on the directory mtime so rewrites miss
        key = (path, os.stat(path).st_mtime_ns)
    except OSError:  # remote scheme / missing: fall back to plain read
        return spark.read.parquet(path)
    cache = getattr(spark, "_faxe_schema_cache", None)
    if cache is None:
        cache = spark._faxe_schema_cache = {}
    schema = cache.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        cache[key] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table; normalizes events.ts to TimestampType."""
    configure_session(spark)
    df = _read_parquet(spark, f"{sf_dir}/{name}.parquet")
    ts_type = dict(df.dtypes).get("ts")
    if name == "events" and ts_type == "bigint":
        # ns -> us truncation via integer division (double division would
        # lose precision: ns epoch ~1.7e18 exceeds double's 2^53 mantissa)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif name == "events" and ts_type == "timestamp_ntz":
        # parquet timestamp[us] without UTC adjustment reads as
        # TIMESTAMP_NTZ; the engine (and unix_millis/unix_micros) works
        # on TIMESTAMP. Session TZ is pinned to UTC, so this cast keeps
        # the epoch value bit-identical to DuckDB's naive-TIMESTAMP read.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def stage_bucketed(spark: SparkSession, df: DataFrame, table: str, *,
                   bucket_by: str, buckets: int = 32,
                   sort_by: str | None = None) -> DataFrame:
    """Persist `df` as a BUCKETED managed table and return it.

    The 100 TB co-location lever: two tables bucketed on the same key
    with the same bucket count join WITHOUT any shuffle — the exchange
    disappears from the plan entirely (proven by
    tests/test_plans.py::test_bucketed_join_has_no_exchange). The same
    applies to groupBy on the bucket key. This is how a production
    deployment lays out fact tables that are repeatedly joined or
    re-aggregated on one key (events by user_id, lineitem by orderkey):
    pay the shuffle once at ingest, never again per query."""
    writer = df.write.mode("overwrite").format("parquet") \
        .bucketBy(buckets, bucket_by)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table)
    return spark.table(table)
