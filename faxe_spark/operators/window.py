"""Window / batching operators (SURVEY.md §2.5).

faxe's windows produce `#data_batch{}` values; here a "batch" is a group —
either a `window()`/`session_window()` struct column to group by, or an
explicit batch-id column. Downstream `aggregate` consumes the group keys.

Streaming: the same expressions work on streaming DataFrames with a
watermark (see faxe_spark.streaming) — Spark's late-data handling is a
strict superset of the reference (which has none, SURVEY §2.5).
"""

from __future__ import annotations

from collections.abc import Iterable

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.window import Window

from faxe_spark.durations import duration_to_interval, parse_duration_ms


def win_time(ts_col: str | Column, period: str, every: str | None = None) -> Column:
    """faxe `win_time` (esp_win_time.erl:28): event-time window, `period` =
    length, `every` = slide. Returns a window struct column for groupBy.

    => native `F.window` tumbling/sliding window; epoch-aligned starts.
    """
    if every is None or parse_duration_ms(every) == parse_duration_ms(period):
        return F.window(ts_col, duration_to_interval(period))
    return F.window(ts_col, duration_to_interval(period), duration_to_interval(every))


def win_session(ts_col: str | Column, timeout: str) -> Column:
    """faxe `win_session` (esp_win_session.erl:30): gap-based event-time
    session => native `F.session_window(ts, gap)` (works batch + stream)."""
    return F.session_window(ts_col, duration_to_interval(timeout))


def win_event(df: DataFrame, period: int, every: int = 1, *,
              by: Iterable[str] = (), ts_col: str = "ts",
              order_tiebreak: str | None = None,
              row_col: str = "_win_row", emit_col: str = "_emit") -> DataFrame:
    """faxe `win_event` (esp_win_event.erl:29): count window holding `period`
    rows, emitting every `every` rows.

    => row-frame window functions: adds `_win_row` (row number) and `_emit`
    (true on each every-th row). Callers aggregate with
    `Window.rowsBetween(-period+1, 0)` frames via `win_event_agg`.

    Scale: one shuffle on `by`; rows stay sorted within partitions. A
    global (un-keyed) count window degenerates to a single partition —
    keyed use is the scalable path, same as the reference's group_by.
    """
    order = [F.col(ts_col)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    if not by:
        from faxe_spark.operators.common import warn_global_order
        warn_global_order("win_event")
    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy(*order) if by else Window.orderBy(*order)
    out = df.withColumn(row_col, F.row_number().over(w))
    return out.withColumn(emit_col, (F.col(row_col) % every == 0) & (F.col(row_col) >= 1))


def win_event_agg(df: DataFrame, specs, period: int, every: int = 1, *,
                  by: Iterable[str] = (), ts_col: str = "ts",
                  order_tiebreak: str | None = None,
                  fill_period: bool = False,
                  round_to: int | None = None) -> DataFrame:
    """Count-window aggregation: rolling aggregates over the last `period`
    rows per key, emitted on every `every`-th row (fill_period => only once
    `period` rows have been seen, esp_win_event.erl `fill_period`)."""
    order = [F.col(ts_col)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    if not by:
        from faxe_spark.operators.common import warn_global_order
        warn_global_order("win_event_agg")
    part = Window.partitionBy(*[F.col(c) for c in by]) if by else Window.partitionBy()
    w = part.orderBy(*order).rowsBetween(-(period - 1), 0)
    wn = part.orderBy(*order)
    rolling_fns = {"sum": F.sum, "avg": F.avg, "mean": F.avg, "min": F.min,
                   "max": F.max, "count": F.count, "stddev": F.stddev_samp}
    out = df.withColumn("_win_row", F.row_number().over(wn))
    for field, fn, alias in specs:
        c = rolling_fns[fn](F.col(field)).over(w)
        if round_to is not None and fn not in ("count", "min", "max"):
            c = F.round(c, round_to)
        out = out.withColumn(alias, c)
    cond = F.col("_win_row") % every == 0
    if fill_period:
        cond = cond & (F.col("_win_row") >= period)
    return out.filter(cond).drop("_win_row")


def win_clock_agg(df: DataFrame, specs, *, every: str, period: str | None = None,
                  arrival_col: str, by: Iterable[str] = (),
                  fill_period: bool = False) -> DataFrame:
    """faxe `win_clock` batch analog (esp_win_clock.erl:33): the
    wall-clock window — period-long contents emitted every `every`,
    event timestamps IGNORED — becomes a sliding event-time window over
    a deterministic ARRIVAL-ts column (recorded ingest stamps on
    replay), the same move the deadman/triggered_timeout batch analogs
    make. The reference's `align` option is inherent (F.window snaps
    boundaries to the epoch `every` grid); period defaults to every
    (esp_win_clock.erl:52-56); fill_period suppresses the partial head
    windows (:10, fill_period_filter). The streaming variant with true
    wall-clock stamps is streaming.windows.win_clock_stream.

    One shuffle on (window, by) — the standard sliding-window plan."""
    from faxe_spark.operators.aggregate import agg_expr

    period = period or every
    w = win_time(arrival_col, period, every).alias("window")
    exprs = [agg_expr(fn, f, alias, ts_col=arrival_col)
             for f, fn, alias in specs]
    out = df.groupBy(w, *[F.col(c) for c in by]).agg(*exprs)
    if fill_period:
        out = fill_period_filter(out, df, ts_col=arrival_col)
    return out


def fill_period_filter(agg_df: DataFrame, source_df: DataFrame, *,
                       window_col: str = "window",
                       ts_col: str = "ts") -> DataFrame:
    """esp_win_clock.erl:10 `fill_period`: "the window will not emit
    before `period` time has elapsed for the first time" — i.e. the
    partial head window(s) that started before the stream's first event
    are suppressed. Batch form: keep only windows whose start >= the
    global min event time (1-row broadcast probe, no extra shuffle on
    the aggregated side)."""
    mn = source_df.agg(F.min(F.col(ts_col)).alias("_first_ts"))
    return (agg_df.crossJoin(F.broadcast(mn))
            .filter(F.col(f"{window_col}.start") >= F.col("_first_ts"))
            .drop("_first_ts"))


def batch_by_count(df: DataFrame, size: int, *, by: Iterable[str] = (),
                   ts_col: str = "ts", order_tiebreak: str | None = None,
                   batch_col: str = "batch_id") -> DataFrame:
    """faxe `batch` (esp_batch.erl:30): count-based batching. Adds a
    0-based `batch_id` per key (every `size` rows, ts-ordered); group by it
    to aggregate per batch. The wall-clock `timeout` flush has no batch
    analog (it's the micro-batch trigger in streaming)."""
    order = [F.col(ts_col)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    if not by:
        from faxe_spark.operators.common import warn_global_order
        warn_global_order("batch")
    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy(*order) if by else Window.orderBy(*order)
    return df.withColumn(batch_col, F.floor((F.row_number().over(w) - 1) / size).cast("long"))
