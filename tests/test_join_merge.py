"""join merge_field mode (esp_join.erl:205-216, merge/2 :228-236):
type-dispatched field merging — maps deep-merge, lists merge, numbers
add, strings concatenate — and the streaming buffer's missing_timeout
partial-row emit (:146-156)."""

from __future__ import annotations

import datetime
import time

import pyspark.sql.functions as F
import pytest

from faxe_spark.operators import join as join_ops


def _ts(sec):
    return datetime.datetime(2024, 1, 1, 0, 0, sec)


def _two_streams(spark, schema, a_val, b_val):
    a = spark.createDataFrame([(1, _ts(0), a_val)], schema)
    b = spark.createDataFrame([(1, _ts(1), b_val)], schema)
    return a, b


def _merged(spark, schema, a_val, b_val):
    a, b = _two_streams(spark, schema, a_val, b_val)
    out = join_ops.merge_join([a, b], ["k"], ts_col="ts", merge_field="v",
                              tolerance="10s", how="left")
    return out.collect()[0]["v"]


def test_merge_numbers_add(spark):
    assert _merged(spark, "k int, ts timestamp, v double", 2.5, 4.0) == 6.5


def test_merge_strings_concat(spark):
    assert _merged(spark, "k int, ts timestamp, v string", "foo", "bar") == "foobar"


def test_merge_arrays_sorted_merge(spark):
    got = _merged(spark, "k int, ts timestamp, v array<long>", [3, 1], [2, 1])
    assert got == [1, 1, 2, 3]


def test_merge_maps_right_wins_scalars(spark):
    got = _merged(spark, "k int, ts timestamp, v map<string,long>",
                  {"x": 1, "y": 2}, {"y": 9, "z": 3})
    assert got == {"x": 1, "y": 9, "z": 3}


def test_merge_maps_deep_recursion(spark):
    got = _merged(spark, "k int, ts timestamp, v map<string,map<string,long>>",
                  {"a": {"x": 1, "y": 2}}, {"a": {"y": 9}, "b": {"z": 3}})
    assert got == {"a": {"x": 1, "y": 9}, "b": {"z": 3}}


def test_merge_unmatched_row_keeps_value(spark):
    a = spark.createDataFrame([(1, _ts(0), 5.0)], "k int, ts timestamp, v double")
    b = spark.createDataFrame([(2, _ts(0), 7.0)], "k int, ts timestamp, v double")
    out = join_ops.merge_join([a, b], ["k"], ts_col="ts", merge_field="v",
                              tolerance="10s", how="left")
    assert [(r.k, r.v) for r in out.collect()] == [(1, 5.0)]
    inner = join_ops.merge_join([a, b], ["k"], ts_col="ts", merge_field="v",
                                tolerance="10s", how="inner")
    assert inner.count() == 0


def test_merge_three_streams_folds(spark):
    rows = [(1, _ts(0), 1.0)], [(1, _ts(1), 2.0)], [(1, _ts(2), 4.0)]
    dfs = [spark.createDataFrame(r, "k int, ts timestamp, v double") for r in rows]
    out = join_ops.merge_join(dfs, ["k"], ts_col="ts", merge_field="v",
                              tolerance="10s", how="left")
    assert out.collect()[0]["v"] == 7.0


def test_merge_rejects_unmergeable_type(spark):
    with pytest.raises(TypeError, match="cannot merge"):
        _merged(spark, "k int, ts timestamp, v boolean", True, False)


def test_join_stream_pairs_and_missing_timeout(spark, tmp_path):
    """Two sources land within tolerance -> complete pair emits; an
    orphan row flushes as a partial after missing_timeout of processing
    time (full=false, esp_join.erl:146-156)."""
    from faxe_spark.streaming import stream_parquet
    from faxe_spark.streaming.stateful import join_stream

    src = str(tmp_path / "js")
    rows = [
        (1, _ts(0), "a", 1.0), (1, _ts(1), "b", 2.0),  # pair (within 2s)
        (2, _ts(0), "a", 9.0),                          # orphan -> partial
    ]
    spark.createDataFrame(
        rows, "key bigint, ts timestamp, src string, value double"
    ).repartition(1).write.parquet(src)

    s = stream_parquet(spark, src)
    out = join_stream(s, key_col="key", src_col="src", value_col="value",
                      tolerance="2s", missing_timeout="2s", full=False)
    q = (out.writeStream.format("memory").queryName("join_stream")
         .outputMode("append").trigger(processingTime="1 second").start())
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) c FROM join_stream").collect()[0].c
            if n >= 2:
                break
            time.sleep(1)
        got = {(r.key, r.complete): (r.a_value, r.b_value)
               for r in spark.sql("SELECT * FROM join_stream").collect()}
        assert got[(1, True)] == (1.0, 2.0)
        assert got[(2, False)] == (9.0, None)
    finally:
        q.stop()
