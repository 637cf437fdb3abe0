"""Streaming state-store recovery across query RESTARTS.

The production claim behind every stateful streaming operator here is
that state lives in Spark's checkpointed state store — so a stopped
flow resumes where it left off (faxe's equivalent: mnesia-persisted
node state + flow-ack replay). A memory-sink test never proves that;
this one stops a query, starts a NEW query object on the same
checkpoint, and requires cross-restart state to hold.
"""

import datetime


def _t(m, s):
    return datetime.datetime(2024, 1, 1, 10, m, s)


def test_dedup_stream_state_survives_restart(spark, tmp_path):
    from faxe_spark.streaming.stateful import dedup_exact_stream

    src = tmp_path / "src"
    out = tmp_path / "out"
    ck = tmp_path / "ck"
    schema = "doc_id long, text string, ts timestamp"

    def run_once():
        read_schema = spark.read.parquet(str(src) + "/b1").schema
        stream = (spark.readStream.schema(read_schema)
                  .option("maxFilesPerTrigger", 1).parquet(str(src) + "/*"))
        q = (dedup_exact_stream(stream, watermark="1 hour")
             .writeStream.format("parquet")
             .option("path", str(out))
             .option("checkpointLocation", str(ck))
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)

    spark.createDataFrame(
        [(1, "alpha beta", _t(0, 0)), (2, "gamma delta", _t(0, 10))],
        schema).coalesce(1).write.parquet(str(src) + "/b1")
    run_once()

    spark.createDataFrame(
        [(3, "ALPHA  beta", _t(5, 0)),   # replay from BEFORE the restart
         (4, "epsilon zeta", _t(5, 10))],
        schema).coalesce(1).write.parquet(str(src) + "/b2")
    run_once()                            # new query object, same checkpoint

    got = {r.doc_id for r in spark.read.parquet(str(out)).collect()}
    assert got == {1, 2, 4}, got          # 3 suppressed ACROSS the restart


def test_change_detect_state_survives_restart(spark, tmp_path):
    """applyInPandasWithState state (the custom FSM lane) must reload
    from the checkpointed state store: the first value after restart
    equals the pre-restart last value, so it must NOT re-emit."""
    from faxe_spark.streaming import change_detect_stream

    src = tmp_path / "src"
    out = tmp_path / "out"
    ck = tmp_path / "ck"
    schema = "key bigint, ts timestamp, v double"

    def run_once():
        read_schema = spark.read.parquet(str(src) + "/b1").schema
        stream = (spark.readStream.schema(read_schema)
                  .option("maxFilesPerTrigger", 1).parquet(str(src) + "/*"))
        q = (change_detect_stream(stream, key_col="key", value_col="v")
             .writeStream.format("parquet")
             .option("path", str(out))
             .option("checkpointLocation", str(ck))
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)

    spark.createDataFrame([(1, _t(0, 0), 10.0), (1, _t(0, 1), 12.0)],
                          schema).coalesce(1).write.parquet(str(src) + "/b1")
    run_once()

    spark.createDataFrame([(1, _t(0, 2), 12.0),   # == pre-restart last
                           (1, _t(0, 3), 13.0)],
                          schema).coalesce(1).write.parquet(str(src) + "/b2")
    run_once()

    vals = sorted((r.ts_ms, r.value)
                  for r in spark.read.parquet(str(out)).collect())
    assert [v for _, v in vals] == ["10.0", "12.0", "13.0"]  # no re-emit of 12
