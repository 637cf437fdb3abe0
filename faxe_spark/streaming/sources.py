"""Streaming sources.

The reference's ingest nodes (mqtt_subscribe, amqp_consume, http_listen,
tcp_recv, value_emitter — SURVEY.md §2.1) map to Structured Streaming
sources: Kafka for the broker nodes (config passthrough in
faxe_spark.sources.kafka), file streams for blobstream, and the rate
source for value_emitter-style synthetic load. Flow-ack / dtag
at-least-once semantics are subsumed by checkpointing (exactly-once).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from faxe_spark.session import configure_session


def stream_parquet(spark: SparkSession, path: str, *, ts_is_nanos_long: bool | None = None) -> DataFrame:
    """File-stream a parquet directory/file (schema inferred from the
    existing files, as readStream requires). Normalizes a nanos-long `ts`
    to TimestampType exactly like tables.load_table."""
    import os

    configure_session(spark)
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if os.path.isfile(path):
        # the file-stream source only accepts directories
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    df = reader.parquet(path)
    names = {f.name: f.dataType.simpleString() for f in schema.fields}
    if (ts_is_nanos_long if ts_is_nanos_long is not None else names.get("ts") == "bigint"):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif names.get("ts") == "timestamp_ntz":
        # parquet timestamp[us] w/o UTC flag reads NTZ; watermarks/windows
        # need TIMESTAMP. Session TZ pinned UTC => epoch-identical cast
        # (same normalization as tables.load_table).
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def rate_source(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """`value_emitter` analog (esp_value_emitter.erl:26): synthetic
    timestamped rows; add fields with eval/set operators downstream."""
    return (spark.readStream.format("rate")
            .option("rowsPerSecond", rows_per_second).load()
            .withColumnRenamed("timestamp", "ts"))
