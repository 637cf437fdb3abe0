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

STATE-SCHEMA COMPATIBILITY (ADVICE r10): applyInPandasWithState
persists each lane's `state_schema` inside the streaming checkpoint,
and Spark neither migrates nor validates it on resume — restarting a
query from an old checkpoint after a lane's state schema changed
(r10 widened collect_full_stream 4->5 fields and
triggered_timeout_stream 1->2) fails or silently misreads per-key
state. Upgrading a deployed build across such a change requires a
FRESH checkpoint directory (drain the old query first; for the
crawl-fold pipelines the compacted state tables carry the progress,
so a fresh checkpoint replays only the uncommitted epoch). Lanes in
this module follow that contract instead of versioning state rows —
schema changes are called out in the per-lane docstrings.
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

    Late-data policy (documented, golden-pinned): rows are processed in
    (ts) order WITHIN a micro-batch, but ACROSS batches in arrival
    order — a transition row arriving one batch late folds into the
    run that is current at arrival (last-write-wins; it never rewrites
    an already-emitted transition retroactively, and it DOES count into
    the current run's n_in_prev_run). Bound disorder upstream with a
    watermark when cross-batch order matters.
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
                # NULL is its own state, not coerced (review find:
                # bool(None)=False / bool(NaN)=True fabricated phantom
                # transitions from one absent field) — matches the
                # batch lane's eqNullSafe treatment; run_id==0 marks
                # "never seen", so a NULL run survives restarts too
                st = None if (st is None or st != st) else bool(st)
                if run_id == 0 or st != last_state:
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
    mirroring the reference's added/updated/removed tagging. A row
    whose value is NULL is a NO-OP (review find: NULL previously
    compared as "not the stored value" and churned add/update rows per
    NULL arrival — an absent field on a flowdata point carries no
    update, and NULL-as-stored-value is indistinguishable from
    no-state in the one-slot schema)."""
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
                if v is None or v != v:
                    # absent field: no-op (docstring) — numeric-column
                    # NULLs arrive as NaN, not None (review find: the
                    # None-only check stored/emitted the string 'nan')
                    continue
                v = str(v)
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
            if state.exists:
                state.remove()
        else:
            state.update((current,))
        yield pd.DataFrame(rows, columns=["key", "ts_ms", "value", "action"])

    # NoTimeout (review find): this op registered ProcessingTimeTimeout
    # but never armed a timer — aging lives in collect_full_stream
    return (df.groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def change_detect_stream(df: DataFrame, *, key_col: str, value_col: str,
                         ts_col: str = "ts",
                         emit_first: bool = True) -> DataFrame:
    """faxe change_detect on a stream (esp_change_detect.erl:41): emit a
    row only when the monitored value differs from the key's last seen
    value — per-key last-value state, one string slot per key."""
    out_schema = StructType([
        StructField("key", LongType()),
        StructField("ts_ms", LongType()),
        StructField("value", StringType()),
    ])
    state_schema = StructType([StructField("last", StringType())])

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        last = state.get[0] if state.exists else None
        seen_any = state.exists
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for ts, v in zip(pdf[ts_col], pdf[value_col]):
                # NULL (incl. numeric NaN) is a comparable value, kept
                # as None — the batch lane's eqNullSafe semantics
                # (review find: str(NaN)='nan' emitted spurious change
                # rows around every numeric NULL)
                v = None if (v is None or v != v) else str(v)
                changed = (v != last) if seen_any else emit_first
                if changed:
                    rows.append((key[0], int(ts.value // 1_000_000), v))
                last, seen_any = v, True
        state.update((last,))
        yield pd.DataFrame(rows, columns=["key", "ts_ms", "value"])

    return (df.groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def value_diff_stream(df: DataFrame, *, key_col: str, value_col: str,
                      ts_col: str = "ts", mode: str = "c-p") -> DataFrame:
    """faxe value_diff on a stream (esp_value_diff.erl): per-key delta
    against the previous row, surviving micro-batch boundaries through
    one numeric slot of state. mode 'c-p' (current minus previous) or
    'p-c'."""
    out_schema = StructType([
        StructField("key", LongType()),
        StructField("ts_ms", LongType()),
        StructField("value", DoubleType()),
        StructField("value_diff", DoubleType()),
    ])
    state_schema = StructType([StructField("prev", DoubleType())])

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        prev = state.get[0] if state.exists else None
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for ts, v in zip(pdf[ts_col], pdf[value_col]):
                # numeric NULL arrives as NaN (review find: it passed
                # the None check, emitted a NaN diff AND poisoned the
                # next real row's diff via prev=NaN)
                v = None if (v is None or v != v) else float(v)
                diff = None
                if prev is not None and v is not None:
                    diff = (v - prev) if mode == "c-p" else (prev - v)
                rows.append((key[0], int(ts.value // 1_000_000), v, diff))
                if v is not None:
                    prev = v
        state.update((prev,))
        yield pd.DataFrame(rows, columns=["key", "ts_ms", "value", "value_diff"])

    return (df.groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def sample_stream(df: DataFrame, *, key_col: str, n: int,
                  ts_col: str = "ts") -> DataFrame:
    """faxe sample every-Nth on a stream (esp_sample.erl): per-key row
    counter in the state store; every n-th row passes."""
    if n < 1:
        raise ValueError(f"sample_stream needs n >= 1, got {n} — n=0 "
                         "would ZeroDivisionError inside the running "
                         "query (review find)")
    out_schema = StructType([
        StructField("key", LongType()),
        StructField("ts_ms", LongType()),
    ])
    state_schema = StructType([StructField("count", LongType())])

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        count = state.get[0] if state.exists else 0
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for ts in pdf[ts_col]:
                count += 1
                if count % n == 0:
                    rows.append((key[0], int(ts.value // 1_000_000)))
        state.update((count,))
        yield pd.DataFrame(rows, columns=["key", "ts_ms"])

    return (df.groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def collect_full_stream(df: DataFrame, *, key_col: str,
                        payload_cols: list[str],
                        add_when=None, remove_when=None, update_when=False,
                        update_mode: str = "replace",
                        max_age: str | None = None,
                        max_ts_age: str | None = None,
                        emit_every: str | None = None,
                        include_removed: bool = False,
                        ts_col: str = "ts") -> DataFrame:
    """faxe `collect` full option surface (esp_collect.erl:63-120):
    keyed buffer with add/remove/update LAMBDAS, update modes, aging and
    periodic emit. Emits (key, ts_ms, payload JSON, action).

    - add_when(new, None) -> bool gates inserts (default: always add).
    - update_when: True = always replace/merge; False = never update
      (the DEFAULT — esp_collect's init leaves UpdateFun = false when
      the update option is undefined, so a script with only a remove
      lambda must still get its remove_when evaluated); or a callable
      (new, state) -> bool — `state` is the buffered point's fields,
      the reference's `__state` root (:253-261).
    - remove_when(new, state) -> bool deletes the key (:243-251);
      include_removed keeps emitting it tagged 'remove' (:265-269).
      Evaluated only when update_when did NOT fire — the reference's
      do_process (:186-192) calls maybe_update_state first and
      maybe_remove only on ChangedBool=false, so update_when=True
      makes remove unreachable by design (definition order :243-261
      is NOT dispatch order — ADVICE r8 high).
    - update_mode: 'replace' | 'merge' ({**old, **new}, new wins —
      flowdata:merge_points) | 'merge_reverse' ({**new, **old}).
    - max_age: PROCESSING-time since the key was added; enforced by the
      per-key state timeout (armed to the ABSOLUTE added+max_age
      deadline, so re-arms can't postpone it) AND a data-path sweep for
      keys whose steady traffic keeps resetting the timer (age_cleanup
      :340-352) — eviction is silent, like the reference's timer sweep.
    - max_ts_age: EVENT-time age against the newest ts seen on the key;
      checked on every batch (emit_buffer_cleanup :300-317).
    - emit_every: re-emit the current state row (action='emit') every
      interval even when unchanged (emit_timeout :160-162); shares the
      state-timeout timer with max_age (the shorter wins, both checked).

    State is one buffered point per key in the state store — the
    reference's whole-node orddict becomes per-key distributed state,
    so the buffer scales with the shuffle partitioning instead of one
    process's heap."""
    import json
    import time as _time

    from faxe_spark.durations import parse_duration_ms

    max_age_ms = parse_duration_ms(max_age) if max_age else None
    max_ts_age_ms = parse_duration_ms(max_ts_age) if max_ts_age else None
    emit_ms = parse_duration_ms(emit_every) if emit_every else None
    if update_mode not in ("replace", "merge", "merge_reverse"):
        raise ValueError(f"update_mode must be replace/merge/merge_reverse, "
                         f"got {update_mode!r}")

    out_schema = StructType([
        StructField("key", StringType()),
        StructField("ts_ms", LongType()),
        StructField("payload", StringType()),
        StructField("action", StringType()),
    ])
    state_schema = StructType([
        StructField("payload", StringType()),
        StructField("ts_ms", LongType()),
        StructField("added_ms", LongType()),
        StructField("removed", BooleanType()),
        StructField("last_emit_ms", LongType()),
    ])
    state_fields = ("payload", "ts_ms", "added_ms", "removed",
                    "last_emit_ms")

    def arm(state, added_ms, last_emit_ms, now_ms):
        # timer to the EARLIER of the key's absolute age deadline
        # (added_ms + max_age) and the absolute next-emit deadline
        # (last_emit_ms + emit_every). BOTH are deadlines, not flat
        # intervals (review find, twice: a flat duration re-armed by
        # every data batch means steady traffic postpones the sweep /
        # the periodic emit forever — the reference's emit_timeout is
        # a free-running timer).
        cands = []
        if max_age_ms is not None:
            cands.append(added_ms + max_age_ms - now_ms)
        if emit_ms is not None:
            cands.append(last_emit_ms + emit_ms - now_ms)
        if cands:
            state.setTimeoutDuration(max(1, min(cands)))

    def _py(v):
        # numpy scalar -> python scalar (review find: json.dumps hits
        # default=str on np.int64/np.bool_, silently stringifying
        # ints/bools in payloads AND in the state dict handed to the
        # user's update_when/remove_when lambdas, while np.float64 —
        # a float subclass — stayed numeric; .item() unifies them)
        return v.item() if hasattr(v, "item") else v

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        cols = ["key", "ts_ms", "payload", "action"]
        now_ms = int(_time.time() * 1000)
        kstr = str(key[0])
        if state.hasTimedOut:
            payload, ts_ms, added_ms, removed, last_emit = state.get
            rows = []
            if max_age_ms is not None and now_ms - added_ms >= max_age_ms:
                state.remove()  # silent age sweep, like the reference
            else:
                if emit_ms is not None and now_ms - last_emit >= emit_ms:
                    # tombstones emit tagged 'remove' ONCE and are then
                    # deleted — esp_collect's emit_buffer_cleanup
                    # buffer_deletes a removed-tagged point after
                    # including it in ONE emission (ADVICE r10 medium:
                    # update+re-arm here meant unbounded duplicate
                    # 'remove' rows and a state-store leak)
                    rows.append((kstr, ts_ms, payload,
                                 "remove" if removed else "emit"))
                    if removed:
                        state.remove()
                        yield pd.DataFrame(rows, columns=cols)
                        return
                    last_emit = now_ms
                state.update((payload, ts_ms, added_ms, removed,
                              last_emit))
                arm(state, added_ms, last_emit, now_ms)
            yield pd.DataFrame(rows, columns=cols)
            return

        cur = dict(zip(state_fields, state.get)) \
            if state.exists else None
        # age sweep on the DATA path too (review find: the timeout
        # never fires for a key that keeps receiving rows — each batch
        # re-arms the timer — so an active key was never age-evicted;
        # the reference's age_cleanup sweeps at added+max_age
        # regardless of activity). Arriving rows then re-add fresh.
        if (cur is not None and max_age_ms is not None
                and now_ms - cur["added_ms"] >= max_age_ms):
            cur = None
        rows = []
        newest = cur["ts_ms"] if cur else 0
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for rec in pdf.to_dict("records"):
                ts_ms = int(rec[ts_col].value // 1_000_000)
                newest = max(newest, ts_ms)
                # a null column is an ABSENT field on the incoming point
                # (flowdata maps carry no undefined entries) — critical
                # for merge modes, where absent must not overwrite.
                new_fields = {c: _py(rec[c]) for c in payload_cols
                              if rec[c] is not None and rec[c] == rec[c]}
                st_fields = json.loads(cur["payload"]) if cur and not cur["removed"] else None
                if st_fields is None:
                    if cur is not None and cur["removed"]:
                        cur = None  # tombstone: key can be re-added
                    if add_when is None or add_when(new_fields, None):
                        cur = {"payload": json.dumps(new_fields, default=str),
                               "ts_ms": ts_ms, "added_ms": now_ms,
                               "removed": False, "last_emit_ms": now_ms}
                        rows.append((kstr, ts_ms, cur["payload"], "add"))
                    continue
                do_update = update_when if isinstance(update_when, bool) \
                    else update_when(new_fields, st_fields)
                if do_update:
                    if update_mode == "merge":
                        merged = {**st_fields, **new_fields}
                    elif update_mode == "merge_reverse":
                        merged = {**new_fields, **st_fields}
                    else:
                        merged = new_fields
                    cur = {"payload": json.dumps(merged, default=str),
                           "ts_ms": ts_ms, "added_ms": cur["added_ms"],
                           "removed": False,
                           "last_emit_ms": cur["last_emit_ms"]}
                    rows.append((kstr, ts_ms, cur["payload"], "update"))
                    continue
                if remove_when is not None and remove_when(new_fields,
                                                           st_fields):
                    rows.append((kstr, ts_ms, cur["payload"], "remove"))
                    # a tombstone exists ONLY to ride the next periodic
                    # emission (then deleted, see the timer path); with
                    # no emit_every no such emission ever comes and no
                    # timer may be armed — keeping it would be a pure
                    # state leak (ADVICE r10 medium, second form)
                    cur = ({**cur, "removed": True}
                           if include_removed and emit_ms is not None
                           else None)
        if cur is not None and max_ts_age_ms is not None \
                and newest - cur["ts_ms"] > max_ts_age_ms:
            if include_removed:
                rows.append((kstr, cur["ts_ms"], cur["payload"], "remove"))
            cur = None
        if cur is None:
            if state.exists:
                state.remove()
        else:
            state.update((cur["payload"], cur["ts_ms"], cur["added_ms"],
                          cur["removed"], cur["last_emit_ms"]))
            arm(state, cur["added_ms"], cur["last_emit_ms"], now_ms)
        yield pd.DataFrame(rows, columns=cols)

    return (df.groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.ProcessingTimeTimeout))


def join_stream(df: DataFrame, *, key_col: str, src_col: str, value_col: str,
                tolerance: str = "2s", missing_timeout: str = "30s",
                full: bool = True, ts_col: str = "ts") -> DataFrame:
    """faxe join's streaming buffer with missing_timeout
    (esp_join.erl:85-156): rows from two sources (src_col in 'a'/'b')
    buffered per key; when both sources land within `tolerance` of each
    other, the pair emits immediately (complete=true, nearest-ts match
    :197-207). A row whose partner never arrives is flushed when the
    key's `missing_timeout` of PROCESSING time expires — emitted as a
    partial row when full=false (the fill path :146-156), silently
    dropped when full=true (inner semantics, maybe_emit :146-149).

    Emits (key, ts_ms, a_value, b_value, complete). Per-key state is
    the pending-row buffer; every pending row carries its own ARRIVAL
    (processing-time) stamp, rows older than the timeout flush on
    every invocation, and the timer re-arms to the OLDEST pending
    row's remaining time — review find: the old form re-armed a flat
    timeout whenever anything was pending, so a key with continuous
    one-sided traffic never timed out (state grew without bound and
    full=false partials never flushed). State is therefore bounded at
    ~timeout's worth of unmatched rows per key, in Spark's state
    store (RocksDB at scale)."""
    import time as _time

    from faxe_spark.durations import parse_duration_ms

    tol_ms = parse_duration_ms(tolerance)
    timeout_ms = parse_duration_ms(missing_timeout)
    out_schema = StructType([
        StructField("key", LongType()),
        StructField("ts_ms", LongType()),
        StructField("a_value", DoubleType()),
        StructField("b_value", DoubleType()),
        StructField("complete", BooleanType()),
    ])
    from pyspark.sql.types import ArrayType
    state_schema = StructType([
        StructField("ts", ArrayType(LongType())),
        StructField("src", ArrayType(StringType())),
        StructField("val", ArrayType(DoubleType())),
        StructField("arr", ArrayType(LongType())),
    ])

    def emit_row(key, ts_ms, src, val, partner_val=None, complete=False):
        a = val if src == "a" else partner_val
        b = val if src == "b" else partner_val
        return (key, ts_ms, a, b, complete)

    def park(state, key, kept, flushed, now_ms):
        """Persist `kept`, flush `flushed` (partial rows unless full),
        timer to the oldest kept row's remaining time."""
        rows = [] if full else [
            emit_row(key, t, s, v) for t, s, v, _arr in flushed]
        if kept:
            state.update((tuple(x[0] for x in kept),
                          tuple(x[1] for x in kept),
                          tuple(x[2] for x in kept),
                          tuple(x[3] for x in kept)))
            oldest = min(x[3] for x in kept)
            state.setTimeoutDuration(max(1, oldest + timeout_ms - now_ms))
        elif state.exists:
            state.remove()
        return rows

    def split_expired(pend, now_ms):
        kept = [p for p in pend if now_ms - p[3] < timeout_ms]
        return kept, [p for p in pend if now_ms - p[3] >= timeout_ms]

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        cols = ["key", "ts_ms", "a_value", "b_value", "complete"]
        now_ms = int(_time.time() * 1000)
        if state.hasTimedOut:
            pend = list(zip(*state.get))
            kept, flushed = split_expired(pend, now_ms)
            rows = park(state, key[0], kept, flushed, now_ms)
            yield pd.DataFrame(rows, columns=cols)
            return
        pend = list(zip(*state.get)) if state.exists else []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for ts, s, v in zip(pdf[ts_col], pdf[src_col], pdf[value_col]):
                if s is None or s != s or v is None or v != v:
                    # absent src/value: no-op (review find: str(None)
                    # buffered an unmatchable 'None'-source row that
                    # full=false later flushed as an all-NULL partial,
                    # and float(None) killed the query)
                    continue
                pend.append((int(ts.value // 1_000_000), str(s), float(v),
                             now_ms))
        pend.sort()
        rows, remaining = [], []
        used = [False] * len(pend)
        for i, (t, s, v, _arr) in enumerate(pend):
            if used[i]:
                continue
            # nearest unused opposite-source row within tolerance
            best, best_d = None, None
            for j in range(len(pend)):
                if j == i or used[j] or pend[j][1] == s:
                    continue
                d = abs(pend[j][0] - t)
                if d <= tol_ms and (best_d is None or d < best_d):
                    best, best_d = j, d
            if best is not None:
                used[i] = used[best] = True
                rows.append(emit_row(key[0], t, s, v,
                                     partner_val=pend[best][2], complete=True))
            else:
                remaining.append((t, s, v, _arr))
        # lazy expiry on the data path: matching ran first (a partner
        # arriving in the same batch still pairs), then anything past
        # the timeout flushes even though fresh one-sided traffic
        # keeps this key's invocations coming
        kept, flushed = split_expired(remaining, now_ms)
        rows += park(state, key[0], kept, flushed, now_ms)
        yield pd.DataFrame(rows, columns=cols)

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

    The state carries the arming's absolute processing-time DEADLINE,
    and every re-arm sets the REMAINING time (review find: re-arming
    the flat `timeout_ms` on each data batch meant steady unrelated
    traffic on an armed key postponed the synthetic timeout forever —
    the same deadline device collect_full_stream's age sweep and
    join_stream's pending buffer use)."""
    import time as _time

    from faxe_spark.durations import parse_duration_ms

    timeout_ms = parse_duration_ms(timeout)
    out_schema = StructType([
        StructField("key", LongType()),
        StructField("armed_ts_ms", LongType()),
        StructField("fired", BooleanType()),
    ])
    state_schema = StructType([StructField("armed_ts_ms", LongType()),
                               StructField("deadline_ms", LongType())])

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        now_ms = int(_time.time() * 1000)
        if state.hasTimedOut:
            armed, _deadline = state.get
            state.remove()
            yield pd.DataFrame([(key[0], armed, True)],
                               columns=["key", "armed_ts_ms", "fired"])
            return
        armed, deadline = state.get if state.exists else (None, None)
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for ts, trig, cancel in zip(pdf[ts_col], pdf[trigger_col], pdf[cancel_col]):
                ts_ms = int(ts.value // 1_000_000)
                # null lambda results are False, not phantom actions
                cancel = (cancel is not None and cancel == cancel
                          and bool(cancel))
                trig = trig is not None and trig == trig and bool(trig)
                if armed is not None and cancel:
                    rows.append((key[0], armed, False))
                    armed, deadline = None, None
                elif armed is None and trig:
                    armed = ts_ms
                    deadline = now_ms + timeout_ms
        if armed is None:
            if state.exists:
                state.remove()
        else:
            state.update((armed, deadline))
            state.setTimeoutDuration(max(1, deadline - now_ms))
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


def state_sequence_stream(df: DataFrame, *, key_col: str,
                          step_cols: list[str], within: list[str | int],
                          strict: bool = False,
                          wallclock_cleanup: bool = True,
                          ts_col: str = "ts") -> DataFrame:
    """faxe `state_sequence` (esp_state_sequence.erl:47): a per-key CEP
    matcher over ordered states. Each point is evaluated against the
    CURRENT step's precomputed boolean column (the reference's lambdas);
    a match advances the FSM, and each transition i->i+1 must complete
    within `within[i]` or the sequence resets to step 0 (the reference's
    state_timeout, :73-75). On the final step's match the COMPLETING
    point is emitted (the reference's `output=last`, :21) and the FSM
    resets. `strict` resets on any non-matching point (:95-97);
    non-strict ignores interlopers (:98-99) — but the within clock keeps
    running through them, exactly like the reference's real-time timer.

    Faithfulness notes (golden-pinned):
    - The within check uses EVENT time between the previous matched
      point and the candidate — the micro-batch analog of the
      reference's arrival-time timer (arrival==event for live streams;
      the batch lane `operators.state.state_sequence` pins the same
      event-time gaps, so the lanes agree on ordered data).
    - A point arriving after the deadline sees the reset FIRST and is
      then evaluated against step 0 — in the reference the timer fires
      before the late point's arrival, so it meets current_index=1.
    - A strict-mode non-match consumes the point WITHOUT re-evaluating
      it against step 0 (eval_false just resets, :95-97).
    - Cross-batch silence: a processing-time timer with the REMAINING
      time to the absolute deadline (the r10 deadline device — steady
      unrelated traffic cannot postpone it) frees mid-sequence state
      for keys that never return; the timer path REMOVES state
      (tombstone discipline), emitting nothing, like the reference's
      silent reset.
    - `wallclock_cleanup=False` drops the timer (NoTimeout): pure
      event-time semantics for REPLAYS/backfills, where a wall-clock
      reset mid-replay would be wrong (arrival time >> event time);
      the gap check still resets stale sequences on next arrival, and
      mid-sequence state for never-returning keys lives until the
      checkpoint is retired. Also the availableNow-friendly mode —
      ProcessingTimeTimeout queries do not terminate under
      trigger(availableNow=True) on Spark 4.1 (verified; same reason
      the deadman/triggered_timeout goldens poll a processingTime
      trigger instead).

    Output: (key, ts_ms, start_ts_ms) — the completing point's event
    time and the matched sequence's first-step event time.
    """
    import time as _time

    from faxe_spark.durations import parse_duration_ms

    n = len(step_cols)
    if n == 0:
        raise ValueError("state_sequence_stream: need at least one step")
    if len(within) != n - 1:
        raise ValueError(
            f"state_sequence_stream: {n} states need exactly {n - 1} "
            f"'within' durations (got {len(within)}) — timeouts start "
            "after the first state matches (esp_state_sequence.erl:14)")
    within_ms = [w if isinstance(w, int) else parse_duration_ms(w)
                 for w in within]
    out_schema = StructType([
        StructField("key", LongType()),
        StructField("ts_ms", LongType()),
        StructField("start_ts_ms", LongType()),
    ])
    state_schema = StructType([
        StructField("idx", LongType()),
        StructField("start_ts_ms", LongType()),
        StructField("prev_ts_ms", LongType()),
        StructField("deadline_ms", LongType()),
    ])

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        now_ms = int(_time.time() * 1000)
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame([], columns=["key", "ts_ms", "start_ts_ms"])
            return
        idx, start, prev, deadline = (state.get if state.exists
                                      else (0, None, None, None))
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            matches = [pdf[c] for c in step_cols]
            for j, ts in enumerate(pdf[ts_col]):
                ts_ms = int(ts.value // 1_000_000)
                if idx > 0 and ts_ms - prev > within_ms[idx - 1]:
                    # the reference's timer fired before this arrival
                    idx, start, prev = 0, None, None
                m = matches[idx].iloc[j]
                # null lambda results are False, not phantom matches
                m = m is not None and m == m and bool(m)
                if m:
                    if idx == n - 1:
                        rows.append((key[0], ts_ms,
                                     start if start is not None else ts_ms))
                        idx, start, prev, deadline = 0, None, None, None
                    else:
                        if idx == 0:
                            start = ts_ms
                        idx, prev = idx + 1, ts_ms
                        # absolute deadline armed AT the advance (r10
                        # device: re-arming from `now` each batch would
                        # let steady non-matching traffic postpone the
                        # cleanup timer forever)
                        deadline = now_ms + within_ms[idx - 1]
                elif strict:
                    idx, start, prev, deadline = 0, None, None, None
        if idx == 0:
            if state.exists:
                state.remove()
        else:
            state.update((idx, start, prev, deadline))
            if wallclock_cleanup:
                state.setTimeoutDuration(max(1, deadline - now_ms))
        yield pd.DataFrame(rows, columns=["key", "ts_ms", "start_ts_ms"])

    timeout_mode = (GroupStateTimeout.ProcessingTimeTimeout
                    if wallclock_cleanup else GroupStateTimeout.NoTimeout)
    return (df.groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", timeout_mode))


def _round_half_up(x: float, digits: int) -> float:
    """Round like Spark's F.round on a double: HALF_UP over the
    SHORTEST-ROUNDTRIP decimal repr of the double (Spark calls
    `BigDecimal.valueOf(double)` = `Double.toString`, and Python's
    `repr(float)` is the same shortest-roundtrip algorithm) — NOT
    Python's round (banker's) and NOT Decimal(x) (the exact binary
    expansion: ADVICE r7 verified F.round(1.5e-10, 10) == 2e-10 on
    PySpark 4.1.2 while the exact-binary form returns 1e-10, because
    the binary double nearest 1.5e-10 sits just below the halfway
    point). Pinned against a live F.round in
    tests/test_streaming.py::test_round_half_up_matches_f_round."""
    import decimal

    return float(decimal.Decimal(repr(x)).quantize(
        decimal.Decimal(1).scaleb(-digits),
        rounding=decimal.ROUND_HALF_UP))


def subsequence_match_stream(df: DataFrame, pattern, *, key_col: str,
                             ts_col: str = "ts",
                             value_col: str = "value",
                             max_dist: float = 0.5) -> DataFrame:
    """Streaming shape alerting — the streaming lane of
    operators.timeseries.subsequence_topk: emit (key, end_ts_ms, dist)
    whenever the last m readings of a key match the query pattern
    within `max_dist` under z-normalized Euclidean distance
    (scale/offset invariant, shifted-fold stable like the batch op).

    State per key is EXACTLY the last m-1 (ts, value) readings — the
    partial window a shape straddling a micro-batch boundary needs;
    each batch's rows are appended in (ts) order and every window
    ending at a new row is scored (numpy sliding view, Arrow-batched).
    Late rows older than the carried tail are appended as they arrive
    (the documented policy: bound disorder upstream with a watermark,
    as the win_time/session lanes do)."""
    import numpy as np
    from pyspark.sql.types import ArrayType

    from faxe_spark.operators.timeseries import znorm_query

    m = len(pattern)
    if m < 2:
        raise ValueError("pattern needs at least 2 points")
    q = np.asarray(znorm_query(pattern))

    out_schema = StructType([
        StructField("key", StringType()),
        StructField("end_ts_ms", LongType()),
        StructField("dist", DoubleType()),
    ])
    state_schema = StructType([
        StructField("ts_tail", ArrayType(LongType())),
        StructField("val_tail", ArrayType(DoubleType())),
    ])

    def fn(key, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        ts_tail, val_tail = state.get if state.exists else ([], [])
        ts_tail, val_tail = list(ts_tail), list(val_tail)
        rows = []
        # materialize ALL Arrow chunks first (review find): a large
        # group spans several pdfs delivered in arbitrary order, so
        # per-chunk sorting + tail trimming would score windows over
        # jumbled values; one concat + one sort restores batch order
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(ts_col)
            new_ts = [int(t.value // 1_000_000) for t in pdf[ts_col]]
            carried = len(val_tail)
            ts_all = ts_tail + new_ts
            vals = np.asarray(
                val_tail + [float(v) for v in pdf[value_col]],
                dtype=np.float64)
            if len(vals) >= m:
                # one vectorized pass over every window (the sliding
                # view is a stride trick — no copy), shifted-fold
                # z-norm exactly like the batch op
                W = np.lib.stride_tricks.sliding_window_view(vals, m)
                Y = W - W[:, :1]
                mu = Y.mean(axis=1)
                var = (Y * Y).mean(axis=1) - mu * mu
                std = np.sqrt(np.maximum(var, 0.0))
                ok = std > 1e-12
                Z = np.zeros_like(Y)
                Z[ok] = ((Y[ok] - mu[ok, None]) / std[ok, None])
                D = np.sqrt(((Z - q[None, :]) ** 2).sum(axis=1))
                for end in range(max(carried, m - 1), len(vals)):
                    d = float(D[end - m + 1])
                    if d <= max_dist:
                        rows.append((str(key[0]), ts_all[end],
                                     _round_half_up(d, 10)))
            # plain-Python floats: numpy scalars don't survive the
            # state-store pickle
            ts_tail = ts_all[max(0, len(ts_all) - (m - 1)):]
            val_tail = [float(v)
                        for v in vals[max(0, len(vals) - (m - 1)):]]
        state.update((ts_tail, val_tail))
        yield pd.DataFrame(rows, columns=["key", "end_ts_ms", "dist"])

    return (df.groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def dedup_exact_stream(df: DataFrame, *, text_col: str = "text",
                       ts_col: str = "ts",
                       watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: keep the first arrival of each content
    fingerprint, drop replays that arrive within the watermark horizon.

    The streaming analog of operators.dedup.dedup_exact (and of the
    reference sources' bounded `dedup_size` replay rings —
    mqtt/amqp options in SURVEY §2.1): Spark's
    dropDuplicatesWithinWatermark keys the state store by the md5
    fingerprint and expires entries once the watermark passes, so
    state stays bounded by the duplicate horizon instead of growing
    with the corpus — the only tenable shape for an unbounded stream.
    Exactly-once-per-fingerprint WITHIN the horizon; a duplicate
    arriving later than the horizon is a fresh document by design."""
    import pyspark.sql.functions as F

    # the SAME fingerprint as the batch dedup_incremental (NULL text
    # coalesced to '' so NULL-text docs dedup with empty docs instead
    # of carrying a NULL state key; normalize + md5) — a normalization
    # change there must carry over here or the streaming lane silently
    # diverges from its batch analog. The working column is name-salted
    # so a caller's own '_fp' column passes through untouched (r4
    # advice: the old form overwrote then dropped it).
    from faxe_spark.operators.text import fingerprint

    fp_col = "_fp"
    while fp_col in df.columns:
        fp_col = "_" + fp_col
    fp = fingerprint(F.coalesce(F.col(text_col).cast("string"), F.lit("")))
    return (df.withColumn(fp_col, fp)
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark([fp_col])
            .drop(fp_col))


def dedup_incremental_stream(df: DataFrame, seen_fps: DataFrame | None, *,
                             text_col: str = "text", ts_col: str = "ts",
                             watermark: str = "1 hour",
                             fp_out: str = "fingerprint") -> DataFrame:
    """Streaming lane of operators.dedup.dedup_incremental: drop
    documents whose fingerprint appears in the COMPACTED seen-set table
    (the long-tail history, months of crawl), then
    dropDuplicatesWithinWatermark for replays inside the recent horizon
    (arrivals newer than the last compaction).

    The two layers split the work by age, which is the only shape that
    stays bounded on an unbounded stream:
    - `seen_fps` (a 1-column 'fingerprint' frame, normally the bucketed
      table compact_seen_fps writes) handles duplicates OLDER than the
      watermark horizon via a stream-static anti-join. Structured
      Streaming re-evaluates the static side per micro-batch, and a
      bucketed table scan is constant-depth — plan depth does NOT grow
      with crawl age. Pass None to run horizon-only (== the
      dedup_exact_stream behavior, with the fingerprint exposed).
    - the state store handles duplicates YOUNGER than the horizon —
      exactly the window the table can't know about yet.

    The output carries the fingerprint in `fp_out` so a foreachBatch
    sink can append fresh fingerprints for the next compaction
    (incremental_dedup_pipeline below does this). Raises if `fp_out`
    already exists — the caller must pick a free name; silently
    overwriting it is the r4-advice hazard dedup_exact_stream fixed.

    A static-side refresh requires a stream restart (Spark pins the
    static file index at query start), so the operational loop is:
    run -> stop -> compact_pending_fps -> restart from the SAME
    checkpoint. The stateful-operator layout is unchanged across that
    restart (the anti-join is stateless), so the state store resumes
    cleanly — proven by tests/test_recovery.py."""
    import pyspark.sql.functions as F

    from faxe_spark.operators.text import fingerprint

    if fp_out in df.columns:
        raise ValueError(
            f"fp_out column {fp_out!r} already exists on the input; "
            "pass a free name")
    fp = fingerprint(F.coalesce(F.col(text_col).cast("string"), F.lit("")))
    out = df.withColumn(fp_out, fp)
    if seen_fps is not None:
        out = out.join(
            seen_fps.select(F.col("fingerprint").alias(fp_out)),
            fp_out, "left_anti")
    return (out.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark([fp_out]))


def incremental_dedup_pipeline(df: DataFrame, *, seen_fps: DataFrame | None,
                               out_dir: str, pending_dir: str,
                               checkpoint_dir: str,
                               text_col: str = "text", ts_col: str = "ts",
                               watermark: str = "1 hour",
                               available_now: bool = True):
    """Start the continuous-crawl dedup stream: fresh documents land in
    `out_dir`, their fingerprints in `pending_dir` (both parquet,
    epoch-partitioned). Returns the StreamingQuery.

    foreachBatch is at-least-once, so each epoch overwrites its OWN
    partition (`epoch=<id>/`) — a replayed epoch rewrites identical
    data instead of appending duplicates; readers take
    spark.read.parquet(dir) and drop the epoch column. Between runs,
    compact_pending_fps(spark, pending_dir, table) folds the pending
    fingerprints into the bucketed seen table; restart then picks the
    refreshed table up (see dedup_incremental_stream)."""
    import pyspark.sql.functions as F

    fp_out = "_pending_fp"
    deduped = dedup_incremental_stream(
        df, seen_fps, text_col=text_col, ts_col=ts_col,
        watermark=watermark, fp_out=fp_out)

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.persist()
        try:
            (batch_df.drop(fp_out).write.mode("overwrite")
             .parquet(f"{out_dir}/epoch={epoch_id}"))
            (batch_df.select(F.col(fp_out).alias("fingerprint"))
             .write.mode("overwrite")
             .parquet(f"{pending_dir}/epoch={epoch_id}"))
        finally:
            batch_df.unpersist()

    writer = (deduped.writeStream.foreachBatch(write_epoch)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def minhash_dedup_pipeline(df: DataFrame, *, bucket_table: str | None,
                           out_dir: str, pending_dir: str,
                           checkpoint_dir: str,
                           text_col: str = "text",
                           id_col: str = "doc_id",
                           num_hashes: int = 16, bands: int = 4,
                           shingle_n: int = 3,
                           available_now: bool = True):
    """Streaming NEAR-dup crawl dedup (the MinHash-LSH sibling of
    incremental_dedup_pipeline): each micro-batch runs the full batch
    kernel (operators.dedup dedup_minhash_incremental semantics)
    inside foreachBatch against the union of

    - the COMPACTED bucket table (`bucket_table`, refreshed at restart
      via compact_pending_fps — the band fingerprints share the exact
      1-column table contract of the exact-dedup loop), and
    - the pending epochs this run already landed in `pending_dir` —
      which is what makes a near-dup arriving two micro-batches after
      its original get caught WITHIN a run. The exact pipeline gets
      that from dropDuplicatesWithinWatermark's state store; LSH
      bucket membership has no built-in streaming operator, so the
      pending directory IS the in-run state (at-least-once safe: each
      epoch overwrites its own partition).

    Semantics are the batch kernel's greedy first-arrival rule: a doc
    is dropped iff any band bucket was occupied by an earlier arrival;
    dropped docs' buckets still enter the set. Fresh docs land in
    `out_dir`, the new bucket fingerprints in `pending_dir`, both
    epoch-partitioned. Operational loop: run -> stop ->
    compact_pending_fps(spark, pending_dir, bucket_table) -> clear
    pending -> restart."""
    from faxe_spark.operators.dedup import _minhash_incr_core

    def kernel(batch_df, seen):
        return _minhash_incr_core(
            batch_df, seen, text_col=text_col, id_col=id_col,
            num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
            checkpoint=True)

    return _bucket_dedup_pipeline(
        df, kernel=kernel, cols=("fingerprint",),
        bucket_table=bucket_table, out_dir=out_dir,
        pending_dir=pending_dir, checkpoint_dir=checkpoint_dir,
        available_now=available_now)


def simhash_dedup_pipeline(df: DataFrame, *, bucket_table: str | None,
                           out_dir: str, pending_dir: str,
                           checkpoint_dir: str,
                           text_col: str = "text",
                           id_col: str = "doc_id",
                           bits: int = 32, shingle_n: int = 3,
                           hamming_max: int = 3,
                           available_now: bool = True):
    """Streaming near-dup crawl dedup on SIMHASH hamming distance —
    same loop as minhash_dedup_pipeline (compacted bucket table +
    pending epochs as in-run state), but the seen rows carry
    (fingerprint, simhash) so candidates from the hamming-band buckets
    are verified by bit_count: the semantic is exact, not
    probabilistic. Compact with compact_pending_fps(..., cols=
    ("fingerprint", "simhash"))."""
    from faxe_spark.operators.dedup import _simhash_incr_core

    def kernel(batch_df, seen):
        return _simhash_incr_core(
            batch_df, seen, text_col=text_col, id_col=id_col,
            bits=bits, shingle_n=shingle_n, hamming_max=hamming_max,
            checkpoint=True)

    return _bucket_dedup_pipeline(
        df, kernel=kernel, cols=("fingerprint", "simhash"),
        bucket_table=bucket_table, out_dir=out_dir,
        pending_dir=pending_dir, checkpoint_dir=checkpoint_dir,
        available_now=available_now)


def host_cap_pipeline(df: DataFrame, *, bucket_table: str | None,
                      out_dir: str, pending_dir: str,
                      checkpoint_dir: str, cap: int,
                      host_col: str = "host", id_col: str = "doc_id",
                      salt: int | None = None,
                      available_now: bool = True):
    """Streaming per-host crawl cap — the count-based member of the
    bucket-table crawl loop: a document is kept iff fewer than `cap`
    docs of its host were kept before it (earlier run via the
    compacted `bucket_table`, earlier epoch via the pending directory,
    smaller id in-batch). State rows are fingerprint =
    host || '|' || md5(id), ONE PER KEPT DOC — bounded at `cap` rows
    per host forever, the tightest state bound in the family — and
    share the exact loop's 1-column contract, so
    compact_pending_fps(spark, pending_dir, bucket_table) folds them
    unchanged. Operational loop: run -> stop -> compact -> clear
    pending -> restart from the SAME checkpoint."""
    from faxe_spark.operators.trainprep import _host_cap_incr_core

    def kernel(batch_df, seen):
        return _host_cap_incr_core(
            batch_df, seen, cap=cap, host_col=host_col, id_col=id_col,
            salt=salt, checkpoint=True)

    return _bucket_dedup_pipeline(
        df, kernel=kernel, cols=("fingerprint",),
        bucket_table=bucket_table, out_dir=out_dir,
        pending_dir=pending_dir, checkpoint_dir=checkpoint_dir,
        available_now=available_now)


def shard_append_pipeline(df: DataFrame, *, bucket_table: str | None,
                          out_dir: str, pending_dir: str,
                          checkpoint_dir: str, n_shards: int,
                          id_col: str = "doc_id", seed: str = "shuffle",
                          available_now: bool = True):
    """Streaming append-stable shard layout — trainprep.shard_append's
    place in the bucket-table crawl loop (epoch = micro-batch): each
    arriving doc gets its deterministic md5-prefix shard and a
    shard_pos that APPENDS after every position already assigned — by
    a prior run (the compacted `bucket_table` of per-shard counts), an
    earlier pending epoch, or its md5-order rank within this epoch.
    Existing positions never change, so the training reader's offsets
    stay valid across crawl epochs and restarts.

    State rows are (shard, _cnt) per epoch — n_shards rows per epoch
    in pending, folded to n_shards rows FOREVER by
    compact_pending_counts (SUM semantics, not the fingerprint loops'
    set union). Replay safety differs from the set-union loops in BOTH
    directions (review find): within a run a replayed epoch recomputes
    identically and overwrites its own epoch dir; ACROSS the compact
    boundary an epoch the checkpoint never committed would be summed
    at compaction and then recomputed after restart — double-counted —
    so the counts table carries an `_absorbed_through` epoch watermark
    (same atomic rename as the counts themselves) and a replayed
    epoch == the watermark is a NO-OP here (its first attempt's
    out_dir rows and counts already stand; SUM cannot dedup, so the
    guard must refuse, where the fingerprint loops' anti-join merely
    absorbs — and an epoch BELOW the watermark raises, see
    _check_epoch_lineage: on the same checkpoint only the first
    uncommitted epoch can replay, so a lower epoch proves a foreign
    checkpoint lineage that would silently drop data). Seen-state assembly is watermark-aware for the same
    reason (review find): pending epochs <= the watermark are already
    summed into the counts table, so _seen_state's raw
    table ∪ all-earlier-pending union would count them TWICE — the
    seen read here filters pending to `_absorbed_through < epoch <
    epoch_id`, which makes clearing pending after a compaction
    genuinely advisory (a crash between compact and clear no longer
    corrupts new epochs' positions). Operational loop: run -> stop ->
    compact_pending_counts -> clear pending (advisory: stale epochs
    <= the watermark are excluded from both the replay guard and the
    seen assembly) -> restart from the SAME checkpoint."""
    from faxe_spark.operators.trainprep import _shard_append_core

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        absorbed = _absorbed_through(spark, bucket_table)
        lineage = _checkpoint_identity(spark, checkpoint_dir)
        _check_epoch_lineage(absorbed, epoch_id, bucket_table,
                             expected=lineage,
                             actual=_table_lineage(spark, bucket_table))
        if (lineage is not None
                and _table_lineage(spark, bucket_table) is None):
            # adopt: the counts table is written by the OFFLINE
            # compactor, which may not know the checkpoint — after the
            # watermark guard passes, stamp the running checkpoint's
            # identity so the next run's guard works by identity
            _stamp_lineage(spark, bucket_table, lineage)
        if absorbed is not None and epoch_id == absorbed:
            return  # replay of the one legitimately-uncommitted epoch
        # watermark-aware seen assembly: SUM state cannot tolerate the
        # set-union loops' harmless double-read of absorbed pending
        seen = _seen_state(spark, bucket_table, pending_dir, epoch_id,
                           ["shard", "_cnt"], above_epoch=absorbed)
        appended, delta = _shard_append_core(
            batch_df, seen, n_shards=n_shards, id_col=id_col,
            seed=seed, checkpoint=True)
        (appended.write.mode("overwrite")
         .parquet(f"{out_dir}/epoch={epoch_id}"))
        (delta.write.mode("overwrite")
         .parquet(f"{pending_dir}/epoch={epoch_id}"))

    writer = (df.writeStream.foreachBatch(process)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


_LINEAGE_PROP = "faxe.lineage"


def _checkpoint_identity(spark, checkpoint_dir: str) -> str | None:
    """The streaming checkpoint's own identity: Structured Streaming
    writes `<checkpoint>/metadata` = {"id": "<uuid>"} at query start
    (before batch 0 commits), the uuid is stable across restarts of
    the SAME checkpoint and fresh for a new one — exactly the lineage
    token the epoch guard needs. Read through the Hadoop FS API
    (spark.read.text) so cluster paths work; unreadable/absent means
    "unknown" (None) — the guard then falls back to the watermark
    heuristic instead of failing a healthy run."""
    import json as _json

    try:
        lines = spark.read.text(f"{checkpoint_dir.rstrip('/')}/metadata")
        payload = "".join(r.value for r in lines.collect())
        ident = _json.loads(payload).get("id")
        return str(ident) if ident else None
    except Exception:
        return None


def _table_lineage(spark, table: str | None) -> str | None:
    """The state table's stamped lineage (TBLPROPERTIES), None when the
    table is missing or was written by a pre-lineage build."""
    if table is None or not spark.catalog.tableExists(table):
        return None
    try:
        rows = spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    except Exception:
        return None
    for r in rows:
        if r.key == _LINEAGE_PROP:
            return r.value
    return None


def _stamp_lineage(spark, table: str | None, lineage: str | None) -> None:
    """Stamp the checkpoint identity into the state table's
    TBLPROPERTIES (VERDICT r10 #4: a lineage id does not need a row
    column — the property survives the staged RENAME and leaves the
    row contract untouched)."""
    if table is None or lineage is None:
        return
    if not spark.catalog.tableExists(table):
        return
    spark.sql(f"ALTER TABLE {table} SET TBLPROPERTIES "
              f"('{_LINEAGE_PROP}'='{lineage}')")


def _check_epoch_lineage(absorbed, epoch_id: int, table: str, *,
                         expected: str | None = None,
                         actual: str | None = None) -> None:
    """Loud guard for the watermark-carrying pipelines (shard_append /
    dsir_select — the two whose folds are NOT idempotent): on the
    documented same-checkpoint loop, epochs commit sequentially, so a
    replayed epoch can only be the FIRST uncommitted one — at most
    equal to the watermark (compaction can absorb nothing later than
    the epoch that failed to commit). `epoch_id < watermark` therefore
    PROVES the state table belongs to a different (older) checkpoint
    lineage — a fresh checkpoint restarted epoch numbering at 0 — and
    silently no-opping would DROP the new run's early epochs. Refuse
    instead: resume from the same checkpoint, or drop/rename the
    state table to start a new crawl.

    The watermark heuristic alone had a blind spot (r10 review find):
    a foreign table whose watermark is EXACTLY 0 (the old run
    compacted a single epoch) is indistinguishable from a legitimate
    replay of uncommitted epoch 0. Closed in r11 by IDENTITY, not
    arithmetic: the pipelines stamp their checkpoint's metadata uuid
    into the state table's TBLPROPERTIES (`faxe.lineage`), and when
    both the running checkpoint's identity (`expected`) and the
    table's stamp (`actual`) are known, a mismatch raises regardless
    of the watermark. Residual: a table written by a pre-lineage
    build (no stamp) falls back to the watermark heuristic until its
    next compaction/epoch stamps it — the single-epoch blind spot
    survives only for that legacy window."""
    if expected is not None and actual is not None and expected != actual:
        raise ValueError(
            f"state table '{table}' is stamped with checkpoint "
            f"lineage {actual} but this run's checkpoint identity is "
            f"{expected}: the table belongs to a DIFFERENT crawl run "
            "(a fresh checkpoint restarts epoch numbering, and "
            "replay-guard no-ops would silently drop this run's "
            "early epochs — data loss). Resume from the original "
            "checkpoint, or drop/rename the state table to start a "
            "new crawl run")
    if absorbed is not None and epoch_id < absorbed:
        raise ValueError(
            f"state table '{table}' is absorbed through epoch "
            f"{absorbed} but this run delivered epoch {epoch_id}: the "
            "table belongs to a different (older) checkpoint lineage "
            "(a fresh checkpoint restarts epoch numbering, and epochs "
            "<= the watermark would silently no-op — data loss). "
            "Resume from the SAME checkpoint, or drop/rename the "
            "state table to start a new crawl run")


def _absorbed_through(spark, table: str | None):
    """The counts table's epoch watermark: the highest pending epoch a
    compaction has summed (rides every row — empty/missing table means
    nothing absorbed). A MISSING table is first checked for an
    orphaned `__stage` twin (review find: a crash between the staged
    rewrite's DROP and RENAME leaves the state's only copy under the
    stage name; treating that as 'no state' would silently reset the
    fold AND let the next rewrite destroy the orphan)."""
    if table is None:
        return None
    if not spark.catalog.tableExists(table):
        from faxe_spark.operators.common import orphan_stage_guard
        orphan_stage_guard(spark, table)
        return None
    cols = spark.table(table).columns
    if "_absorbed_through" not in cols:
        return None
    row = spark.table(table).selectExpr(
        "max(_absorbed_through) AS m").collect()[0]
    return row.m


def compact_pending_counts(spark, pending_dir: str,
                           table: str = "shard_counts",
                           checkpoint_dir: str | None = None) -> DataFrame:
    """Fold a shard_append_pipeline run's pending per-shard count rows
    into the counts table — the between-runs step of the append-stable
    layout's crawl loop. SUM semantics (the one crawl-loop state that
    aggregates instead of unioning), so unlike the fingerprint
    compactors a re-delivered row CANNOT be absorbed idempotently —
    replay safety is an epoch watermark instead (review find): only
    pending epochs STRICTLY ABOVE the table's `_absorbed_through` are
    summed, and the new watermark rides every row of the rewritten
    table, so watermark and counts land in ONE atomic rename (a crash
    between them cannot split the two). Double-compaction, a crash
    before clearing pending, and a restart that replays an absorbed
    epoch (the pipeline's no-op guard reads the same watermark) are
    all safe. The merged table is n_shards rows forever; a run that
    produced zero epochs is a no-op (existing table returned, or
    created empty). Staged-rename like compact_seen_fps: a crash
    between DROP and RENAME leaves the staged table intact."""
    import pyspark.sql.functions as F
    from pyspark.errors import AnalysisException

    schema = "shard long, _cnt long, _absorbed_through long"
    # pass the run's checkpoint_dir so the FIRST compaction stamps the
    # table's lineage (r11: without it a single-epoch run's table has
    # watermark 0 and no stamp — the one shape the arithmetic guard
    # cannot tell from a legitimate epoch-0 replay); None preserves an
    # existing stamp
    lineage = (_checkpoint_identity(spark, checkpoint_dir)
               if checkpoint_dir else None)

    def _write(dframe):
        return _staged_replace(spark, table, dframe, lineage=lineage)

    absorbed = _absorbed_through(spark, table)
    try:
        raw = spark.read.parquet(pending_dir)  # epoch= partition col
    except AnalysisException as e:
        # ONLY missing input (path absent, or present-but-empty after
        # a pending clear) means "nothing to absorb" (review find,
        # mirrors _pending_rows): swallowing every AnalysisException
        # made a mistyped/unreadable pending dir a silent no-op, and
        # the documented compact->clear loop would then delete the
        # REAL pending rows — counts lost permanently.
        from faxe_spark.operators.common import is_missing_input
        if not is_missing_input(e):
            raise
        raw = None
    if raw is not None:
        if absorbed is not None:
            raw = raw.filter(F.col("epoch") > F.lit(absorbed))
        new_mark = raw.agg(F.max("epoch").alias("m")).collect()[0].m
        pending = raw.groupBy("shard").agg(F.sum("_cnt").alias("_cnt"))
    else:
        new_mark = None
        pending = None
    if pending is None or new_mark is None:
        # nothing new to absorb: keep the table (and its watermark),
        # but still adopt the lineage stamp when the caller knows it
        if spark.catalog.tableExists(table):
            if _table_lineage(spark, table) is None:
                _stamp_lineage(spark, table, lineage)
            return spark.table(table)
        return _write(spark.createDataFrame([], schema))
    if spark.catalog.tableExists(table):
        merged = (spark.table(table).select("shard", "_cnt")
                  .unionByName(pending)
                  .groupBy("shard").agg(F.sum("_cnt").alias("_cnt")))
    else:
        merged = pending
    mark = new_mark if absorbed is None else max(absorbed, new_mark)
    # the input plan may read the destination table; materialize the
    # merge before the staged rewrite drops it
    rows = [(r.shard, r._cnt, mark) for r in merged.collect()]
    return _write(spark.createDataFrame(rows, schema) if rows else
                  spark.createDataFrame([], schema))


def _staged_replace(spark, table: str, dframe: DataFrame,
                    lineage: str | None = None) -> DataFrame:
    """Atomically replace `table` with `dframe` via the staged-rename
    device (compact_seen_fps's crash contract): write the stage table,
    DROP the old, RENAME — a crash between DROP and RENAME leaves the
    staged table intact for manual recovery, and readers never see a
    half-written table. `dframe` must NOT read `table` in its plan
    (materialize first — see the collect() at every call site).

    `lineage`: the checkpoint identity to stamp on the rewritten
    table (r11 guard); None PRESERVES the old table's stamp across
    the rewrite (the offline compactors must not strip it)."""
    if lineage is None:
        lineage = _table_lineage(spark, table)
    stage = f"{table}__stage"
    dframe.write.mode("overwrite").saveAsTable(stage)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"ALTER TABLE {stage} RENAME TO {table}")
    _stamp_lineage(spark, table, lineage)
    return spark.table(table)


def dsir_select_pipeline(df: DataFrame, *, best_table: str,
                         checkpoint_dir: str, weights: dict[int, int],
                         k: int, text_col: str = "text",
                         id_col: str = "doc_id", buckets: int = 256,
                         seed: str = "dsir", scale: int = 1_000_000,
                         salt: int | None = None,
                         available_now: bool = True):
    """Streaming frozen-weight DSIR selection — dsir_select_
    incremental's place in the crawl loop (epoch = micro-batch): each
    arriving epoch is scored against the ONCE-fit weight table
    (save_dsir_weights / load_dsir_weights) and folded into the
    running top-k; because ties break on the id, the fold equals the
    global top-k over everything seen (the library op's contract).

    State = `best_table` ITSELF — exactly k rows + an
    `_absorbed_through` epoch watermark riding every row, folded
    FORWARD atomically each epoch (staged saveAsTable + RENAME, the
    compact_pending_counts device). The only crawl-loop member with
    NO pending directory and NO between-runs compaction step: its
    state is k rows by construction, so rewriting the table per epoch
    costs less than a pending-delta fold, and the operational loop
    collapses to run -> stop -> restart from the SAME checkpoint.

    Replay safety: a top-k fold is NOT idempotent under replay (the
    pool would carry a replayed epoch's rows twice, and a duplicated
    id could hold two of the k slots), so — like shard_append's SUM —
    a replayed epoch == the watermark is a no-op; watermark and state
    land in ONE atomic rename, so a crash between the rename and the
    checkpoint commit replays the epoch into the guard, not into the
    fold. An epoch BELOW the watermark raises
    (_check_epoch_lineage): it proves a foreign checkpoint lineage
    whose early epochs would otherwise silently no-op."""
    from faxe_spark.operators.trainprep import dsir_select_incremental

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        import pyspark.sql.functions as F

        spark = batch_df.sparkSession
        absorbed = _absorbed_through(spark, best_table)
        lineage = _checkpoint_identity(spark, checkpoint_dir)
        _check_epoch_lineage(absorbed, epoch_id, best_table,
                             expected=lineage,
                             actual=_table_lineage(spark, best_table))
        if absorbed is not None and epoch_id == absorbed:
            return  # replay of the one legitimately-uncommitted epoch
        best = None
        if spark.catalog.tableExists(best_table):
            best = spark.table(best_table).drop("_absorbed_through")
        new_best = dsir_select_incremental(
            batch_df, best, weights=weights, k=k, text_col=text_col,
            id_col=id_col, buckets=buckets, seed=seed, scale=scale,
            salt=salt, checkpoint=False)
        marked = new_best.withColumn(
            "_absorbed_through", F.lit(int(epoch_id)).cast("long"))
        # k rows: materialize before the staged rewrite drops the
        # table the fold's plan reads (the compact_pending_counts
        # hazard, same fix)
        rows = marked.collect()
        _staged_replace(spark, best_table,
                        spark.createDataFrame(rows, marked.schema),
                        lineage=lineage)

    writer = (df.writeStream.foreachBatch(process)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def substring_scrub_pipeline(df: DataFrame, *, bucket_table: str | None,
                             out_dir: str, pending_dir: str,
                             checkpoint_dir: str,
                             text_col: str = "text",
                             id_col: str = "doc_id",
                             span_words: int = 10,
                             available_now: bool = True):
    """Streaming crawl-time span scrubbing — exact_substring_dedup's
    place in the bucket-table loop: spans whose gram an EARLIER batch
    (compacted table or earlier pending epoch) or an earlier in-batch
    (doc, pos) already produced are cut from arriving documents; the
    batch's grams land as pending fingerprints. out_dir receives
    SCRUBBED docs ((id, n_tokens, n_removed, clean_text)) — nothing
    drops wholesale; a fully duplicated doc leaves with clean_text ''.
    Same 1-column fingerprint table as the exact/MinHash loops:
    compact with compact_pending_fps unchanged."""
    from faxe_spark.operators.text import _substring_scrub_core

    def kernel(batch_df, seen):
        return _substring_scrub_core(
            batch_df, seen, text_col=text_col, id_col=id_col,
            span_words=span_words)

    return _bucket_dedup_pipeline(
        df, kernel=kernel, cols=("fingerprint",),
        bucket_table=bucket_table, out_dir=out_dir,
        pending_dir=pending_dir, checkpoint_dir=checkpoint_dir,
        available_now=available_now)


def embedding_dedup_pipeline(df: DataFrame, *, index_name: str,
                             out_dir: str, pending_dir: str,
                             checkpoint_dir: str, threshold: float,
                             nprobe: int | None = None,
                             vec_col: str = "embedding",
                             block_size: int = 1024,
                             available_now: bool = True):
    """Streaming crawl dedup in EMBEDDING space — the vector member's
    streaming lane, same loop shape as the bucket-table pipelines but
    with the persisted IVF index as the compacted seen set: a vector
    drops iff an earlier arrival is within the cosine threshold
    (index lists ∪ STRICTLY earlier pending epochs via the range
    kernel, or a smaller id in this micro-batch via exact pairs); the
    batch's frozen-quantizer encodings land as the pending epoch. The
    index must exist (bootstrap: build_ivf_index on the initial
    corpus, or embedding_neardup_incremental's first batch); its
    quantizer is frozen for the run. Between runs
    compact_pending_vectors folds pending into the lists table —
    restart-after-compaction is the months-long-crawl story, same as
    every other loop. nprobe=None probes every list (the exact
    semantic); bounded nprobe is the recall/cost dial.

    The handle loads ONCE here (the run's frozen-quantizer contract
    made literal) — which also surfaces the IVFPQ refusal at pipeline
    construction instead of as an unresolved-column error inside the
    first micro-batch."""
    import pyspark.sql.functions as F

    from faxe_spark.operators import ann_index as annix
    from faxe_spark.operators import similarity as sim

    idx = annix.load_ann_index(df.sparkSession, index_name)
    if idx.kind != "ivf_flat":
        raise ValueError(
            "embedding_dedup_pipeline: the crawl loop needs exact "
            "stored vectors (ivf_flat); an IVFPQ ADC score is not a "
            "cosine")
    id_col = idx.id_col
    np_ = (idx.nlist if nprobe is None
           else max(1, min(nprobe, idx.nlist)))

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        q_type = batch_df.schema[id_col].dataType.simpleString()
        # three consumers (pids collect, kernel counts, tile rows):
        # materialize the Arrow probe pass once per micro-batch
        probers = (annix._probe_rows(batch_df, idx, np_,
                                     vec_col=vec_col)
                   .localCheckpoint(eager=False))
        pids = sorted(r["_pid"] for r in
                      probers.select("_pid").distinct().collect())
        members = (spark.read.parquet(
            annix._table_path(spark, idx.lists_table))
            .filter(F.col("_cid").isin([int(c) for c in pids]))
            .select(F.col("_cid").alias("_pid"),
                    F.col(id_col).alias("_mid"),
                    F.col("_cvs").alias("_mvs")))
        # STRICTLY earlier epochs via the shared reader (review find:
        # this lane previously forked the `epoch < epoch_id` filter
        # inline — the one filter _seen_state's docstring says must
        # not fork — and swallowed every AnalysisException)
        pend = _pending_rows(spark, pending_dir, epoch_id)
        if pend is not None:
            members = members.union(
                pend.select(F.col("_cid").alias("_pid"),
                            F.col(id_col).alias("_mid"),
                            F.col("_cvs").alias("_mvs")))
        # in-batch rule over the batch's own encoding (computed once —
        # it is also this epoch's pending write), smaller id wins;
        # no long cast anywhere, so string crawl ids work
        new_rows = (annix._ivf_flat_lists(
            batch_df, idx.centroids, quantize=idx.quantize,
            id_col=id_col, vec_col=vec_col)
            .select(id_col, "_cvs", "_cid")
            .localCheckpoint(eager=False))
        # ONE kernel call over seen ∪ in-batch members (the m_flag_col
        # device — one pass over the probers, one counts pair, one
        # Arrow stage): a seen member drops the prober on any hit, an
        # in-batch member only when its id is smaller (arrival order)
        members = (members.withColumn("_new", F.lit(False))
                   .unionByName(new_rows.select(
                       F.col("_cid").alias("_pid"),
                       F.col(id_col).alias("_mid"),
                       F.col("_cvs").alias("_mvs"),
                       F.lit(True).alias("_new"))))
        dropped = (sim._range_pairs(
            probers, members, threshold, block_size=block_size,
            id_col="_mid_", query_id_col="_qid_", q_type=q_type,
            m_flag_col="_new")
            .filter(~F.col("_new") | (F.col("_mid_") < F.col("_qid_")))
            .select(F.col("_qid_").alias(id_col)).distinct())
        fresh = batch_df.join(dropped, id_col, "left_anti")
        (fresh.write.mode("overwrite")
         .parquet(f"{out_dir}/epoch={epoch_id}"))
        (new_rows.write.mode("overwrite")
         .parquet(f"{pending_dir}/epoch={epoch_id}"))

    writer = (df.writeStream.foreachBatch(process)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def crawl_pipeline(df: DataFrame, *, cap: int,
                   tables: dict, out_dir: str, pending_root: str,
                   checkpoint_dir: str,
                   host_col: str = "host", id_col: str = "doc_id",
                   text_col: str = "text", span_words: int = 10,
                   salt: int | None = None,
                   available_now: bool = True):
    """The WHOLE crawl loop as one stream: per-host cap -> exact dedup
    -> duplicated-span scrubbing, three stages with three independent
    state families inside ONE foreachBatch (one checkpoint, one
    restart story). Stage order is deliberate: the politeness/budget
    cap counts FETCHES from a host (duplicates included), dedup then
    drops exact replays, and surviving docs leave SCRUBBED of any
    span an earlier document already carried.

    `tables` maps stage -> bucketed table name (or None before the
    first compaction): {"cap": ..., "fps": ..., "grams": ...}. Pending
    deltas land epoch-idempotently under
    `pending_root`/{cap,fps,grams}/epoch=N; between runs compact each
    with compact_pending_fps(spark, f"{pending_root}/<stage>",
    tables[<stage>]) — all three families share the 1-column
    fingerprint-table contract, so the compaction helper applies
    unchanged to each. Docs land in `out_dir` with the original
    columns minus `text`, plus host_rank / n_tokens / n_removed /
    clean_text."""
    from faxe_spark.operators.dedup import _dedup_incr_core
    from faxe_spark.operators.text import _substring_scrub_core
    from faxe_spark.operators.trainprep import _host_cap_incr_core

    # ADVICE r6: tables.get(stage) turned a typoed/missing key into
    # seen=None, silently resetting that stage's cross-run state
    # (quota/dedup/scrub) on every restart — fail loudly instead.
    if set(tables) != {"cap", "fps", "grams"}:
        raise ValueError(
            "crawl_pipeline: `tables` keys must be exactly "
            "{'cap','fps','grams'} (value None before the first "
            f"compaction); got {sorted(tables)}")

    def _seen(spark, stage, epoch_id):
        return _seen_state(spark, tables[stage],
                           f"{pending_root}/{stage}", epoch_id,
                           ["fingerprint"])

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        capped, cap_rows = _host_cap_incr_core(
            batch_df, _seen(spark, "cap", epoch_id), cap=cap,
            host_col=host_col, id_col=id_col, salt=salt, checkpoint=True)
        fresh, fps_delta = _dedup_incr_core(
            capped, _seen(spark, "fps", epoch_id),
            text_col=text_col, id_col=id_col, checkpoint=True)
        scrubbed, gram_rows = _substring_scrub_core(
            fresh, _seen(spark, "grams", epoch_id),
            text_col=text_col, id_col=id_col, span_words=span_words)
        out = fresh.drop(text_col).join(scrubbed, id_col)
        (out.write.mode("overwrite")
         .parquet(f"{out_dir}/epoch={epoch_id}"))
        for stage, rows in (("cap", cap_rows), ("fps", fps_delta),
                            ("grams", gram_rows)):
            (rows.write.mode("overwrite")
             .parquet(f"{pending_root}/{stage}/epoch={epoch_id}"))

    writer = (df.writeStream.foreachBatch(process)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _pending_rows(spark, pending_dir: str, epoch_id: int):
    """STRICTLY-earlier pending epochs (`epoch < epoch_id` — the
    at-least-once-critical filter, see _seen_state), or None when the
    pending directory does not exist yet or is empty. ONLY the
    missing-input cases are swallowed (common.is_missing_input —
    review find: catching every AnalysisException turned a mistyped
    or unreadable pending path into a SILENT crawl-state reset — the
    dedup/quota/scrub stages re-admitted duplicates; a broken path
    must be a loud error, not an empty seen-set)."""
    import pyspark.sql.functions as F
    from pyspark.errors import AnalysisException

    from faxe_spark.operators.common import is_missing_input

    try:
        pend = spark.read.parquet(pending_dir)
    except AnalysisException as e:
        if is_missing_input(e):
            return None                # no pending epochs yet
        raise
    return pend.filter(F.col("epoch") < F.lit(int(epoch_id)))


def _seen_state(spark, bucket_table: str | None, pending_dir: str,
                epoch_id: int, cols: list,
                above_epoch: int | None = None):
    """seen = compacted table ∪ STRICTLY earlier pending epochs — the
    one definition of crawl-loop state assembly (shared by
    _bucket_dedup_pipeline, crawl_pipeline, shard_append_pipeline and
    the embedding lane's pending read via _pending_rows; the
    at-least-once-critical `epoch < epoch_id` filter must not fork).
    STRICTLY earlier: a replayed epoch must not see its own failed
    attempt's rows, or every doc in the batch would collide with
    itself and be dropped (data loss on the at-least-once path).

    `above_epoch` additionally EXCLUDES pending epochs <= that value
    (ADVICE r9 high): SUM-semantics state (shard_append's counts) is
    already summed into the compacted table up to its
    `_absorbed_through` watermark, so re-reading those pending epochs
    would double-count — where the set-union loops' anti-join merely
    absorbs the duplicate rows. Set-union callers leave it None.
    Both filters are partition pruning on the epoch= layout."""
    import pyspark.sql.functions as F

    seen = None
    if bucket_table is not None:
        if spark.catalog.tableExists(bucket_table):
            seen = spark.table(bucket_table).select(*cols)
        else:
            # missing-but-staged means a crashed compaction, not a
            # fresh crawl — starting with seen=None would re-admit
            # duplicates and the next compaction would overwrite the
            # orphan (review find)
            from faxe_spark.operators.common import orphan_stage_guard
            orphan_stage_guard(spark, bucket_table)
    pend = _pending_rows(spark, pending_dir, epoch_id)
    if pend is not None:
        if above_epoch is not None:
            pend = pend.filter(F.col("epoch") > F.lit(int(above_epoch)))
        pend = pend.select(*cols)
        seen = pend if seen is None else seen.union(pend)
    return seen


def _bucket_dedup_pipeline(df: DataFrame, *, kernel, cols: tuple,
                           bucket_table: str | None, out_dir: str,
                           pending_dir: str, checkpoint_dir: str,
                           available_now: bool):
    """Shared foreachBatch loop for the bucket-set crawl dedups:
    seen = compacted table ∪ STRICTLY earlier pending epochs (see
    _seen_state), kernel returns (fresh, new_rows), both land
    epoch-idempotently. `cols` are the bucket-row columns the kernel
    expects on the seen side."""
    cols = list(cols)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        seen = _seen_state(spark, bucket_table, pending_dir, epoch_id,
                           cols)
        fresh, new_rows = kernel(batch_df, seen)
        (fresh.write.mode("overwrite")
         .parquet(f"{out_dir}/epoch={epoch_id}"))
        (new_rows.write.mode("overwrite")
         .parquet(f"{pending_dir}/epoch={epoch_id}"))

    writer = (df.writeStream.foreachBatch(process)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
