"""Per-key stateful streaming operators on applyInPandasWithState.

These are the operators Spark's declarative surface can't express —
faxe's FSM nodes (SURVEY.md §2.10). State lives in Spark's state store
(RocksDB on a real cluster: per-key state scales horizontally with the
shuffle partitioning of the group keys; nothing here is per-executor
global state).

Reference semantics:
- state_change_stream: esp_state_change.erl:45 + lib/state_change.erl:20-80
  (emit on enter/leave with run metadata)
- deadman_stream: esp_deadman.erl:43 (heartbeat watchdog, emit synthetic
  row when a key is silent for an interval) — processing-time timeout
- collect_stream: esp_collect.erl:63 (keyed upsert table, emit current
  state on change, max_age eviction)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (BooleanType, DoubleType, LongType, StringType,
                               StructField, StructType)


def state_change_stream(df: DataFrame, *, key_col: str, state_col: str,
                        ts_col: str = "ts") -> DataFrame:
    """Emit one row per state transition of a precomputed boolean
    `state_col`, per key: (key, ts_ms, in_state, run_id, n_in_prev_run).

    The boolean is computed upstream with ordinary expressions (the
    `lambda` of the reference); this operator only owns the cross-batch
    transition memory.
    """
    out_schema = StructType([
        StructField("key", LongType()),
        StructField("ts_ms", LongType()),
        StructField("in_state", BooleanType()),
        StructField("run_id", LongType()),
        StructField("n_in_prev_run", LongType()),
    ])
    state_schema = StructType([
        StructField("last_state", BooleanType()),
        StructField("run_id", LongType()),
        StructField("run_count", LongType()),
    ])

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        last_state, run_id, run_count = state.get if state.exists else (None, 0, 0)
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for ts, st in zip(pdf[ts_col], pdf[state_col]):
                st = bool(st)
                if last_state is None or st != last_state:
                    run_id += 1
                    rows.append((key[0], int(ts.value // 1_000_000), st, run_id, run_count))
                    run_count = 1
                    last_state = st
                else:
                    run_count += 1
        state.update((last_state, run_id, run_count))
        yield pd.DataFrame(rows, columns=["key", "ts_ms", "in_state", "run_id", "n_in_prev_run"])

    return (df.groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def deadman_stream(df: DataFrame, *, key_col: str, timeout: str,
                   ts_col: str = "ts") -> DataFrame:
    """faxe deadman (esp_deadman.erl:43): when a key receives no rows for
    `timeout` of processing time, emit a synthetic row
    (key, last_seen_ms, n_seen, alive=false); every data batch (re)arms
    the timer and emits a heartbeat row (alive=true)."""
    from faxe_spark.durations import parse_duration_ms

    timeout_ms = parse_duration_ms(timeout)
    out_schema = StructType([
        StructField("key", LongType()),
        StructField("last_seen_ms", LongType()),
        StructField("n_seen", LongType()),
        StructField("alive", BooleanType()),
    ])
    state_schema = StructType([
        StructField("last_seen_ms", LongType()),
        StructField("n_seen", LongType()),
    ])

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            last_seen, n_seen = state.get
            yield pd.DataFrame([(key[0], last_seen, n_seen, False)],
                               columns=["key", "last_seen_ms", "n_seen", "alive"])
            state.remove()
            return
        last_seen, n_seen = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            if len(pdf):
                n_seen += len(pdf)
                last_seen = max(last_seen, int(pdf[ts_col].max().value // 1_000_000))
        state.update((last_seen, n_seen))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame([(key[0], last_seen, n_seen, True)],
                           columns=["key", "last_seen_ms", "n_seen", "alive"])

    return (df.groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "update", GroupStateTimeout.ProcessingTimeTimeout))


def collect_stream(df: DataFrame, *, key_col: str, value_col: str,
                   remove_value: str | None = None, ts_col: str = "ts") -> DataFrame:
    """faxe collect (esp_collect.erl:63) keyed upsert table: emit the
    key's current row whenever its value changes; a row whose value
    equals `remove_value` deletes the key (the `remove` lambda analog).

    Emits (key, ts_ms, value, action) with action in add/update/remove —
    mirroring the reference's added/updated/removed tagging."""
    out_schema = StructType([
        StructField("key", LongType()),
        StructField("ts_ms", LongType()),
        StructField("value", StringType()),
        StructField("action", StringType()),
    ])
    state_schema = StructType([StructField("value", StringType())])

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        current = state.get[0] if state.exists else None
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for ts, v in zip(pdf[ts_col], pdf[value_col]):
                v = None if v is None else str(v)
                ts_ms = int(ts.value // 1_000_000)
                if remove_value is not None and v == remove_value:
                    if current is not None:
                        rows.append((key[0], ts_ms, current, "remove"))
                        current = None
                elif current is None:
                    current = v
                    rows.append((key[0], ts_ms, v, "add"))
                elif v != current:
                    current = v
                    rows.append((key[0], ts_ms, v, "update"))
        if current is None:
            state.remove()
        else:
            state.update((current,))
        yield pd.DataFrame(rows, columns=["key", "ts_ms", "value", "action"])

    return (df.groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.ProcessingTimeTimeout))


def triggered_timeout_stream(df: DataFrame, *, key_col: str, trigger_col: str,
                             cancel_col: str, timeout: str,
                             ts_col: str = "ts") -> DataFrame:
    """faxe `triggered_timeout` (esp_triggered_timeout.erl:46): a trigger
    row arms a per-key processing-time timer; a qualifying (cancel) row
    disarms it; if the timer fires first, emit a synthetic timeout row.

    trigger_col / cancel_col are precomputed booleans (the reference's
    lambdas). Output: (key, armed_ts_ms, fired) — fired=false rows are
    cancellation acks, fired=true rows are the synthetic timeout points.
    """
    from faxe_spark.durations import parse_duration_ms

    timeout_ms = parse_duration_ms(timeout)
    out_schema = StructType([
        StructField("key", LongType()),
        StructField("armed_ts_ms", LongType()),
        StructField("fired", BooleanType()),
    ])
    state_schema = StructType([StructField("armed_ts_ms", LongType())])

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            (armed,) = state.get
            state.remove()
            yield pd.DataFrame([(key[0], armed, True)],
                               columns=["key", "armed_ts_ms", "fired"])
            return
        armed = state.get[0] if state.exists else None
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for ts, trig, cancel in zip(pdf[ts_col], pdf[trigger_col], pdf[cancel_col]):
                ts_ms = int(ts.value // 1_000_000)
                if armed is not None and bool(cancel):
                    rows.append((key[0], armed, False))
                    armed = None
                elif armed is None and bool(trig):
                    armed = ts_ms
        if armed is None:
            state.remove()
        else:
            state.update((armed,))
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(rows, columns=["key", "armed_ts_ms", "fired"])

    return (df.groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.ProcessingTimeTimeout))


def time_elapsed_stream(df: DataFrame, *, key_col: str, ts_col: str = "ts") -> DataFrame:
    """faxe `time_elapsed` (esp_time_elapsed.erl:31): milliseconds of
    *arrival time* (processing time, not event time) between consecutive
    items per key.

    Each micro-batch is stamped with the wall clock when the state
    function processes it; the per-key state carries the previous
    arrival stamp across batches. Rows arriving in the same micro-batch
    report the intra-batch elapsed of ~0 — same as the reference when a
    burst lands in one mailbox drain. elapsed_ms = -1 for a key's first
    row (no predecessor), mirroring the reference's default.
    """
    import time

    out_schema = StructType([
        StructField("key", LongType()),
        StructField("ts_ms", LongType()),
        StructField("elapsed_ms", LongType()),
    ])
    state_schema = StructType([StructField("last_arrival_ms", LongType())])

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        last = state.get[0] if state.exists else None
        rows = []
        for pdf in pdfs:
            now_ms = int(time.time() * 1000)
            pdf = pdf.sort_values(ts_col)
            for ts in pdf[ts_col]:
                elapsed = -1 if last is None else now_ms - last
                rows.append((key[0], int(ts.value // 1_000_000), elapsed))
                last = now_ms
        if last is not None:
            state.update((last,))
        yield pd.DataFrame(rows, columns=["key", "ts_ms", "elapsed_ms"])

    return (df.groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))
