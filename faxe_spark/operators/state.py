"""State-machine operators — batch analogs (SURVEY.md §2.10).

faxe's state nodes track a lambda-defined boolean state per stream and
emit on transitions (esp_state_change.erl:45, core FSM lib
state_change.erl:20-80), count/duration in state (esp_state_count.erl:33,
esp_state_duration.erl:39), and ordered sequences (esp_state_sequence.erl:47).

Batch formulation (oracle-checkable): the classic gaps-and-islands
pattern — `changed = state != lag(state)`, `run_id = sum(changed) over
(key, ts)`. One shuffle on the key; everything stays in whole-stage
codegen. Streaming variants live in faxe_spark.streaming (state store).
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.window import Window


def _ord(ts_col: str, tiebreak: str | None):
    return [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])


def state_runs(df: DataFrame, condition: str | Column, *, by: Iterable[str] = (),
               ts_col: str = "ts", tiebreak: str | None = None,
               state_col: str = "in_state", run_col: str = "run_id") -> DataFrame:
    """Annotate each row with its boolean state and run id (consecutive
    same-state rows share a run id, numbered from 1 per key)."""
    cond = F.expr(condition) if isinstance(condition, str) else condition
    keys = [F.col(c) for c in by]
    w = Window.partitionBy(*keys).orderBy(*_ord(ts_col, tiebreak))
    marked = df.withColumn(state_col, cond.cast("boolean"))
    changed = (~F.col(state_col).eqNullSafe(F.lag(F.col(state_col)).over(w))).cast("int")
    marked = marked.withColumn("_new_run", F.coalesce(changed, F.lit(1)))
    return marked.withColumn(
        run_col,
        F.sum("_new_run").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("_new_run")


def state_change(df: DataFrame, condition: str | Column, *, by: Iterable[str] = (),
                 ts_col: str = "ts", tiebreak: str | None = None) -> DataFrame:
    """faxe `state_change`: one row per state transition (the run's first
    row), annotated with `in_state` and `run_id`."""
    runs = state_runs(df, condition, by=by, ts_col=ts_col, tiebreak=tiebreak)
    keys = [F.col(c) for c in by]
    w = Window.partitionBy(*keys, F.col("run_id")).orderBy(*_ord(ts_col, tiebreak))
    return runs.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def state_count(df: DataFrame, condition: str | Column, *, by: Iterable[str] = (),
                ts_col: str = "ts", tiebreak: str | None = None,
                alias: str = "state_count") -> DataFrame:
    """faxe `state_count` (esp_state_count.erl:33): consecutive rows in
    state (1,2,3,…) and -1 when out of state."""
    runs = state_runs(df, condition, by=by, ts_col=ts_col, tiebreak=tiebreak)
    keys = [F.col(c) for c in by]
    w = Window.partitionBy(*keys, F.col("run_id")).orderBy(*_ord(ts_col, tiebreak))
    return runs.withColumn(
        alias,
        F.when(F.col("in_state"), F.row_number().over(w)).otherwise(F.lit(-1)),
    )


def state_duration(df: DataFrame, condition: str | Column, *, by: Iterable[str] = (),
                   ts_col: str = "ts", tiebreak: str | None = None, unit_ms: int = 1,
                   alias: str = "state_duration") -> DataFrame:
    """faxe `state_duration` (esp_state_duration.erl:39): accumulated
    event-time in state since the run began (unit-scaled), -1 out of state."""
    runs = state_runs(df, condition, by=by, ts_col=ts_col, tiebreak=tiebreak)
    keys = [F.col(c) for c in by]
    w = (Window.partitionBy(*keys, F.col("run_id"))
         .orderBy(*_ord(ts_col, tiebreak))
         .rowsBetween(Window.unboundedPreceding, 0))
    elapsed = (F.unix_millis(F.col(ts_col)) - F.min(F.unix_millis(F.col(ts_col))).over(w))
    return runs.withColumn(
        alias, F.when(F.col("in_state"), (elapsed / F.lit(unit_ms)).cast("long")).otherwise(F.lit(-1))
    )


def state_count_duration(df: DataFrame, condition: str | Column, *,
                         by: Iterable[str] = (), ts_col: str = "ts",
                         tiebreak: str | None = None, unit_ms: int = 1,
                         count_alias: str = "state_count",
                         duration_alias: str = "state_duration",
                         salt: int | None = None) -> DataFrame:
    """Fused `state_count` + `state_duration`: one `state_runs` annotate
    pass feeds both outputs (esp_state_count.erl:33 + esp_state_duration.erl:39).

    Both outputs are windows over the same (by, run_id) partition and
    (ts, tiebreak) order, so Catalyst plans a single WindowExec for the
    pair, and — because hashpartitioning(by) satisfies the clustered
    distribution on (by, run_id) — the whole chain is ONE shuffle with
    no second exchange. Computing the two nodes separately re-derives
    the identical run annotation twice (2x the window work).

    `salt=S` switches to the SKEW-PROOF two-phase lane (exact, tested
    pair-for-pair identical): a key whose rows all hash to one window
    partition is the 100 TB hazard AQE cannot split — windows require
    the whole key in one task. See `_state_count_duration_salted`.
    """
    if salt is not None and salt > 1:
        return _state_count_duration_salted(
            df, condition, by=by, ts_col=ts_col, tiebreak=tiebreak,
            unit_ms=unit_ms, count_alias=count_alias,
            duration_alias=duration_alias, salt=salt)
    runs = state_runs(df, condition, by=by, ts_col=ts_col, tiebreak=tiebreak)
    keys = [F.col(c) for c in by]
    w = Window.partitionBy(*keys, F.col("run_id")).orderBy(*_ord(ts_col, tiebreak))
    wf = w.rowsBetween(Window.unboundedPreceding, 0)
    elapsed = (F.unix_millis(F.col(ts_col)) - F.min(F.unix_millis(F.col(ts_col))).over(wf))
    return runs.withColumns({
        count_alias: F.when(F.col("in_state"), F.row_number().over(w)).otherwise(F.lit(-1)),
        duration_alias: F.when(F.col("in_state"),
                               (elapsed / F.lit(unit_ms)).cast("long")).otherwise(F.lit(-1)),
    })


def _state_count_duration_salted(df: DataFrame, condition: str | Column, *,
                                 by: Iterable[str], ts_col: str,
                                 tiebreak: str | None, unit_ms: int,
                                 count_alias: str, duration_alias: str,
                                 salt: int) -> DataFrame:
    """Skew-proof gaps-and-islands: the distributed prefix-scan
    formulation of the fused state_count/state_duration pair.

    A hot key (one device/user = 10% of a 100 TB stream) defeats the
    plain formulation: window semantics force every row of the key into
    ONE task, and neither AQE skew handling nor salting-by-hash applies
    (order matters). The classic fix is a two-phase scan:

    1. Split each key's timeline into `salt` TIME-RANGE buckets (per-key
       min/max ts via a small agg, broadcast back — range, not hash, so
       bucket order == time order). Phase A runs the run annotation
       inside each (key, bucket) — parallelism is keys x salt.
    2. A boundary table with ONE row per (key, bucket) — first/last
       state, local run count, last-run length and start — is stitched
       with windows over the bucket index (|keys| x salt rows, tiny),
       producing per-bucket corrections: run-id offset, row-count
       carry, and run-start carry for runs that cross bucket
       boundaries (carries chain through consecutive single-run
       continuing buckets — the segment-sum trick makes the linear
       recurrence expressible as one windowed sum).
    3. Broadcast-join corrections back on (key, bucket); only rows of a
       bucket's FIRST local run are corrected.

    Cost: one big shuffle on (key, bucket) — same bytes as the plain
    lane's shuffle on (key) — plus a negligible boundary shuffle. Output
    is pair-for-pair identical to the plain lane
    (tests/test_plans.py::test_state_salted_lane_equivalence)."""
    cond = F.expr(condition) if isinstance(condition, str) else condition
    keys = list(by)
    ordc = F.struct(*_ord(ts_col, tiebreak))
    ts_ms = F.unix_millis(F.col(ts_col))

    marked = df.withColumn("in_state", cond.cast("boolean"))
    rng = marked.groupBy(*[F.col(c) for c in keys]).agg(
        F.min(ts_ms).alias("_tmin"), F.max(ts_ms).alias("_tmax"))
    if keys:
        marked = marked.join(F.broadcast(rng), keys)
    else:
        marked = marked.crossJoin(F.broadcast(rng))
    span = F.col("_tmax") - F.col("_tmin") + 1
    # NULL ts rows go to bucket 0: the plain lane's orderBy sorts nulls
    # FIRST. Coalesce INSIDE the least — Spark's least() skips nulls,
    # so a null floor would otherwise come out as salt-1 (last bucket).
    marked = marked.withColumn(
        "_b", F.least(F.lit(salt - 1),
                      F.coalesce(
                          F.floor((ts_ms - F.col("_tmin")) * salt / span),
                          F.lit(0)))
    ).drop("_tmin", "_tmax")

    # phase A: local run annotation within (key, bucket) — all four
    # windows share the (key, _b) prefix, one exchange
    kb = [F.col(c) for c in keys] + [F.col("_b")]
    wb = Window.partitionBy(*kb).orderBy(*_ord(ts_col, tiebreak))
    changed = (~F.col("in_state").eqNullSafe(F.lag("in_state").over(wb))).cast("int")
    # the bucket head always opens run 1 — eqNullSafe(NULL state,
    # NULL lag-at-head) is true, so `changed` alone would give the
    # head row _new=0 whenever its state is NULL
    head = F.lag(F.lit(1)).over(wb).isNull()
    a = marked.withColumn("_new", F.when(head, F.lit(1)).otherwise(changed))
    a = a.withColumn("_lrun", F.sum("_new").over(
        wb.rowsBetween(Window.unboundedPreceding, 0)))
    wr = Window.partitionBy(*kb, F.col("_lrun"))
    a = a.withColumn("_lcnt", F.row_number().over(
        wr.orderBy(*_ord(ts_col, tiebreak))))
    a = a.withColumn("_lstart", F.min(ts_ms).over(wr))

    # boundary table: one row per (key, bucket). States are encoded
    # null-safely to ints (NULL -> -1) BEFORE min_by/max_by — Spark's
    # min_by/max_by skip rows whose value is NULL, which would corrupt
    # the boundary state whenever a bucket starts/ends on a NULL
    # condition row
    bt = a.withColumn(
        "_enc_state", F.coalesce(F.col("in_state").cast("int"), F.lit(-1))
    ).groupBy(*kb).agg(
        F.min_by("_enc_state", ordc).alias("_first_state"),
        F.max_by("_enc_state", ordc).alias("_last_state"),
        F.max("_lrun").alias("_nruns"),
        F.max_by("_lcnt", ordc).alias("_last_len"),
        F.max_by("_lstart", ordc).alias("_last_start"),
    )
    wk = Window.partitionBy(*[F.col(c) for c in keys]).orderBy("_b")
    # NULL->NULL boundaries DO continue (the plain lane's run detector
    # is eqNullSafe; encoded -1 == -1 here); only a missing previous
    # bucket breaks the chain — the lag(lit(1)) probe below
    # distinguishes "no previous bucket" from "previous bucket ended
    # in a NULL state"
    cont = F.col("_first_state") == F.lag("_last_state").over(wk)
    cont = F.coalesce(
        F.when(F.lag(F.lit(1)).over(wk).isNull(), F.lit(False)).otherwise(cont),
        F.lit(False))
    bt = bt.withColumn("_cont", cont.cast("int"))
    bt = bt.withColumn("_cum_runs", F.sum(F.col("_nruns") - F.col("_cont")).over(
        wk.rowsBetween(Window.unboundedPreceding, 0)))
    bt = bt.withColumn("_offset", F.col("_cum_runs") - F.col("_nruns"))
    # carry chain: a run crosses bucket b's END into b+1 only through a
    # stretch of single-run continuing buckets — segment the chain and
    # the recurrence carry_out(b) = last_len(b) + [pass-through]carry_in
    # becomes a windowed sum within the segment
    h = ((F.col("_nruns") == 1) & (F.col("_cont") == 1)).cast("int")
    bt = bt.withColumn("_g", F.sum(1 - h).over(
        wk.rowsBetween(Window.unboundedPreceding, 0)))
    wg = (Window.partitionBy(*[F.col(c) for c in keys], F.col("_g"))
          .orderBy("_b").rowsBetween(Window.unboundedPreceding, 0))
    bt = bt.withColumn("_carry_out", F.sum("_last_len").over(wg))
    bt = bt.withColumn("_start_out", F.first("_last_start").over(wg))
    bt = bt.withColumn(
        "_carry_in",
        F.when(F.col("_cont") == 1,
               F.coalesce(F.lag("_carry_out").over(wk), F.lit(0)))
        .otherwise(F.lit(0)))
    bt = bt.withColumn(
        "_start_in",
        F.when(F.col("_cont") == 1, F.lag("_start_out").over(wk)))
    corrections = bt.select(*keys, "_b", "_offset", "_carry_in", "_start_in")

    out = a.join(F.broadcast(corrections), [*keys, "_b"])
    first_local = F.col("_lrun") == 1
    run_start = F.when(first_local & F.col("_start_in").isNotNull(),
                       F.col("_start_in")).otherwise(F.col("_lstart"))
    gcount = F.col("_lcnt") + F.when(first_local, F.col("_carry_in")).otherwise(F.lit(0))
    out = out.withColumns({
        "run_id": F.col("_lrun") + F.col("_offset"),
        count_alias: F.when(F.col("in_state"), gcount).otherwise(F.lit(-1)),
        duration_alias: F.when(
            F.col("in_state"),
            ((ts_ms - run_start) / F.lit(unit_ms)).cast("long")).otherwise(F.lit(-1)),
    })
    return out.drop("_b", "_new", "_lrun", "_lcnt", "_lstart",
                    "_offset", "_carry_in", "_start_in")


def state_sequence(df: DataFrame, steps: Sequence[str | Column],
                   timeouts_ms: Sequence[int], *, by: Iterable[str] = (),
                   ts_col: str = "ts", tiebreak: str | None = None,
                   flag_col: str = "seq_complete") -> DataFrame:
    """faxe `state_sequence` strict mode (esp_state_sequence.erl:47):
    detect an uninterrupted run of rows matching `steps[0..n-1]` in order,
    each consecutive pair within `timeouts_ms[i]`.

    Strict = consecutive rows per key (no interleaved non-matching rows),
    exactly the reference's `strict` option. Returns the input annotated
    with `seq_complete` on the *starting* row of each complete sequence
    => lead() pattern matching, one shuffle on the key (CEP-lite).
    """
    keys = [F.col(c) for c in by]
    w = Window.partitionBy(*keys).orderBy(*_ord(ts_col, tiebreak))
    out = df
    # evaluate each step predicate on every row, then shift with lead()
    for i, step in enumerate(steps):
        c = F.expr(step) if isinstance(step, str) else step
        out = out.withColumn(f"_m{i}", c.cast("boolean"))
    ok = F.col("_m0")
    for i in range(1, len(steps)):
        ok = ok & F.coalesce(F.lead(F.col(f"_m{i}"), i).over(w), F.lit(False))
    for i in range(len(steps) - 1):
        t_i = F.lead(F.unix_millis(F.col(ts_col)), i).over(w)
        t_n = F.lead(F.unix_millis(F.col(ts_col)), i + 1).over(w)
        ok = ok & ((t_n - t_i) <= F.lit(timeouts_ms[i]))
    out = out.withColumn(flag_col, F.coalesce(ok, F.lit(False)))
    return out.drop(*[f"_m{i}" for i in range(len(steps))])


def deadman_gaps(df: DataFrame, timeout_ms: int, *, by: Iterable[str] = (),
                 ts_col: str = "ts", tiebreak: str | None = None,
                 fields: dict | None = None, repeat_last: bool = False,
                 no_forward: bool = False,
                 repeat_per_interval: bool = False,
                 max_repeats: int = 1000) -> DataFrame:
    """Batch analog of faxe `deadman` (esp_deadman.erl:43): the
    processing-time watchdog becomes an EVENT-time gap detector — for
    every silence of more than `timeout_ms` between consecutive rows, a
    synthetic point is emitted at last_ts + timeout (repeat_per_interval
    emits one per elapsed interval, like the reference's restarting
    timer; bounded by max_repeats so a year-long gap can't explode).

    repeat_last copies the silent row's payload (the reference's
    repeat_last option); otherwise payload columns are nulled and
    `fields` constants are set. Rows forward unless no_forward (:75-80).
    The streaming variant (true wall-clock watchdog) is
    streaming.stateful.deadman_stream; this analog makes the node
    oracle-checkable and lets batch DFS scripts compile.

    One shuffle on the key; lead() + sequence-explode, no Python.
    """
    keys = [F.col(c) for c in by]
    w = Window.partitionBy(*keys).orderBy(*_ord(ts_col, tiebreak))
    gap = F.lead(F.unix_millis(F.col(ts_col))).over(w) - F.unix_millis(F.col(ts_col))
    silent = df.withColumn("_gap", gap).filter(F.col("_gap") > F.lit(timeout_ms))
    n_rep = F.least(((F.col("_gap") - 1) / F.lit(timeout_ms)).cast("long"),
                    F.lit(max_repeats)) if repeat_per_interval else F.lit(1)
    synth = silent.withColumn("_k", F.explode(F.sequence(F.lit(1), n_rep)))
    synth = synth.withColumn(
        ts_col, F.timestamp_millis(
            F.unix_millis(F.col(ts_col)) + F.col("_k") * F.lit(timeout_ms)))
    payload_cols = [c for c in df.columns
                    if c != ts_col and c not in set(by)]
    if not repeat_last:
        vals = fields or {}
        synth = synth.select(
            *[F.col(c) for c in [*by, ts_col]],
            *[F.lit(vals[c]).alias(c) if c in vals
              else F.lit(None).cast(df.schema[c].dataType).alias(c)
              for c in payload_cols])
        for k, v in vals.items():
            if k not in df.columns:
                synth = synth.withColumn(k, F.lit(v))
                df = df.withColumn(k, F.lit(None).cast(synth.schema[k].dataType))
    else:
        synth = synth.drop("_gap", "_k")
    synth = synth.withColumn("_deadman", F.lit(True))
    if no_forward:
        return synth
    return df.withColumn("_deadman", F.lit(False)) \
             .unionByName(synth, allowMissingColumns=True)


def triggered_timeout_gaps(df: DataFrame, trigger: Column, timeout_ms: int, *,
                           by: Iterable[str] = (), ts_col: str = "ts",
                           tiebreak: str | None = None,
                           fields: dict | None = None) -> DataFrame:
    """Batch analog of faxe `triggered_timeout` (esp_triggered_timeout.erl:46):
    a trigger row arms a timer; if NO message follows within `timeout_ms`
    the timeout fires. In event time: trigger rows whose gap to the next
    row exceeds the timeout (or that are last) emit a synthetic point at
    trigger_ts + timeout carrying the configured `fields`."""
    keys = [F.col(c) for c in by]
    w = Window.partitionBy(*keys).orderBy(*_ord(ts_col, tiebreak))
    nxt = F.lead(F.unix_millis(F.col(ts_col))).over(w)
    fired = (df.withColumn("_trig", trigger.cast("boolean"))
             .withColumn("_nxt", nxt)
             .filter(F.col("_trig") & (
                 F.col("_nxt").isNull()
                 | ((F.col("_nxt") - F.unix_millis(F.col(ts_col))) > F.lit(timeout_ms)))))
    out = fired.withColumn(
        ts_col, F.timestamp_millis(F.unix_millis(F.col(ts_col)) + F.lit(timeout_ms)))
    for k, v in (fields or {}).items():
        out = out.withColumn(k, F.lit(v))
    return out.drop("_trig", "_nxt")


def state_change_bulk(df: DataFrame, fields: Sequence[str], condition: Column, *,
                      by: Iterable[str] = (), ts_col: str = "ts",
                      tiebreak: str | None = None, key_col: str = "field",
                      value_col: str = "value") -> DataFrame:
    """faxe `state_change_bulk` (esp_state_change_bulk.erl:53): the
    state_change FSM applied to every listed field — the reference's
    `$field` lambda template, run per field of the object.

    => melt the fields to (field, value) rows with one `stack()` generate
    (no shuffle), then ordinary per-(key, field) state runs: `field`
    simply joins the partition key, so Catalyst plans ONE shuffle over
    (by, field) — same cost class as a single-field state_change at
    n_fields x rows. `condition` is a Column over `value_col`.
    """
    keep = list(dict.fromkeys([*by, ts_col] + ([tiebreak] if tiebreak else [])))
    stack_args = ", ".join(f"'{f}', CAST({f} AS DOUBLE)" for f in fields)
    melted = df.selectExpr(
        *keep, f"stack({len(fields)}, {stack_args}) AS ({key_col}, {value_col})")
    return state_change(melted, condition, by=[*by, key_col],
                        ts_col=ts_col, tiebreak=tiebreak)
