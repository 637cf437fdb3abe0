"""Batch/stream source connectors (SURVEY.md §2.1 mapping).

Reference ingest nodes -> Spark sources:

| faxe node            | here                                   |
|----------------------|----------------------------------------|
| mqtt_subscribe,      | `kafka_source` (broker ingestion; an   |
| amqp_consume         | MQTT/AMQP->Kafka bridge owns protocol) |
| http_get, *_query    | `jdbc_source` / `http_poll_source`     |
| blobstream           | `file_source` (csv/json/parquet, batch |
|                      | or readStream — native cloud FS URIs)  |
| tcp_recv(_line)      | `socket_source` (line-framed push edge)|
| value_emitter        | streaming.rate_source                  |
| json_emitter         | `json_rows_source` (literal rows)      |

Connector jars (Kafka, JDBC drivers) may be absent in a dev container:
constructors only *declare* options; failures surface at stream start
with a clear message.
"""

from __future__ import annotations

import json as _json

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def file_source(spark: SparkSession, path: str, *, format: str = "parquet",
                schema=None, streaming: bool = False, **options) -> DataFrame:
    """blobstream analog (esp_blobstream.erl:68): line/row-wise file
    ingest; any Hadoop-compatible URI (abfss://, s3a://, file:)."""
    if streaming:
        reader = spark.readStream
        if schema is None:
            schema = spark.read.format(format).options(**options).load(path).schema
        reader = reader.schema(schema)
    else:
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
    return reader.format(format).options(**options).load(path)


def kafka_source(spark: SparkSession, *, brokers: str, topic: str,
                 streaming: bool = True, starting_offsets: str = "latest",
                 value_schema=None, dt_field: str = "ts") -> DataFrame:
    """mqtt_subscribe/amqp_consume analog (esp_mqtt_subscribe.erl:47,
    esp_amqp_consume.erl:68): JSON payload decode + event-time column.
    Flow-ack/dtag semantics are subsumed by checkpointed offsets."""
    reader = (spark.readStream if streaming else spark.read).format("kafka") \
        .option("kafka.bootstrap.servers", brokers) \
        .option("subscribe", topic) \
        .option("startingOffsets", starting_offsets)
    raw = reader.load()
    out = raw.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("payload"),
        F.col("timestamp").alias("_arrival_ts"),
    )
    if value_schema is not None:
        out = out.withColumn("data", F.from_json("payload", value_schema))
        if dt_field:
            out = out.withColumn("ts", F.col(f"data.{dt_field}"))
    return out


def jdbc_source(spark: SparkSession, *, url: str, query: str, user: str = "",
                password: str = "", partition_column: str | None = None,
                num_partitions: int = 8, lower_bound=None, upper_bound=None,
                **options) -> DataFrame:
    """crate_query/postgre_statement/oracle_query analog
    (esp_crate_query.erl:45): the reference's time-bucket SQL rewrite
    (:170-194) becomes a pushed-down dbtable subquery; partitioned reads
    replace its periodic pagination."""
    reader = (spark.read.format("jdbc")
              .option("url", url)
              .option("query", query)
              .option("user", user)
              .option("password", password))
    if partition_column is not None:
        reader = (reader.option("partitionColumn", partition_column)
                  .option("numPartitions", str(num_partitions))
                  .option("lowerBound", str(lower_bound))
                  .option("upperBound", str(upper_bound)))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def socket_source(spark: SparkSession, *, host: str, port: int,
                  json_schema: str | None = None,
                  min_length: int = 0) -> DataFrame:
    """tcp_recv / tcp_recv_line analog (esp_tcp_recv_line.erl:40
    `{packet, line}`, :57 min_length filter): line-framed push ingest
    via Spark's built-in socket stream source. Each line is one item;
    `json_schema` parses lines into typed columns (the `parser` option),
    otherwise the raw `value` string column streams through.

    Scale note: the socket source is single-connection by design (like
    the reference node); production push ingest at 100 TB goes through
    the broker path (`kafka_source`) — this is the edge-adapter."""
    df = (spark.readStream.format("socket")
          .option("host", host).option("port", port).load())
    if min_length > 0:
        df = df.filter(F.length("value") >= min_length)
    if json_schema is not None:
        df = df.select(F.from_json("value", json_schema).alias("_j")).select("_j.*")
    return df


def json_rows_source(spark: SparkSession, rows: list[dict] | list[str],
                     ts_field: str = "ts") -> DataFrame:
    """json_emitter analog (esp_json_emitter.erl:37): literal JSON rows
    as a DataFrame (the test-emitter of the reference's dfs corpus)."""
    dicts = [_json.loads(r) if isinstance(r, str) else r for r in rows]
    df = spark.createDataFrame(dicts)
    if ts_field in df.columns and dict(df.dtypes)[ts_field] == "bigint":
        df = df.withColumn(ts_field, F.timestamp_millis(F.col(ts_field)))
    return df
