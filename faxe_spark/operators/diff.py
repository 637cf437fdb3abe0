"""Consecutive-row difference operators (SURVEY.md §2.6 lower half)."""

from __future__ import annotations

from collections.abc import Iterable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window


def _w(by: Iterable[str], ts_col: str, tiebreak: str | None) -> Window:
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    if by:
        return Window.partitionBy(*[F.col(c) for c in by]).orderBy(*order)
    from faxe_spark.operators.common import warn_global_order
    warn_global_order("value_diff/time_diff/count_change")
    return Window.orderBy(*order)


def value_diff(df: DataFrame, fields: Iterable[str], *, mode: str = "c-p",
               by: Iterable[str] = (), ts_col: str = "ts", tiebreak: str | None = None,
               suffix: str = "_diff", default: object = None) -> DataFrame:
    """faxe `value_diff` (esp_value_diff.erl:31, diff funs :89-91): per-field
    difference vs previous row; modes `abs` / `c-p` / `p-c`; `default` fills
    the first row => lag window function."""
    w = _w(by, ts_col, tiebreak)
    out = df
    for f in fields:
        prev = F.lag(F.col(f)).over(w)
        d = {"c-p": F.col(f) - prev, "p-c": prev - F.col(f), "abs": F.abs(F.col(f) - prev)}[mode]
        if default is not None:
            d = F.coalesce(d, F.lit(default))
        out = out.withColumn(f"{f}{suffix}", d)
    return out


def time_diff(df: DataFrame, *, by: Iterable[str] = (), ts_col: str = "ts",
              tiebreak: str | None = None, alias: str = "time_diff_ms",
              default: object = None) -> DataFrame:
    """faxe `time_diff` (esp_time_diff.erl:31): ms between consecutive rows."""
    w = _w(by, ts_col, tiebreak)
    d = F.unix_millis(F.col(ts_col)) - F.lag(F.unix_millis(F.col(ts_col))).over(w)
    if default is not None:
        d = F.coalesce(d, F.lit(default))
    return df.withColumn(alias, d)


def time_elapsed(df: DataFrame, *, arrival_col: str, by: Iterable[str] = (),
                 tiebreak: str | None = None, alias: str = "elapsed",
                 default: object = 0) -> DataFrame:
    """faxe `time_elapsed` (esp_time_elapsed.erl:31): milliseconds of
    ARRIVAL time between consecutive items; the first item per key gets
    `default` (reference options/0 default 0).

    The reference measures real wall clock; the streaming variant
    (streaming.stateful.time_elapsed_stream) does exactly that. This
    batch analog reads a deterministic arrival-ts column instead —
    callers that replay a log with recorded ingest stamps (the common
    batch case) get the reference semantics oracle-checkably; one lag
    window, same shape as time_diff but keyed on arrival order."""
    w = _w(by, arrival_col, tiebreak)
    a = F.unix_millis(F.col(arrival_col))
    d = a - F.lag(a).over(w)
    return df.withColumn(alias, F.coalesce(d, F.lit(default)))


def count_change(df: DataFrame, field: str, *, by: Iterable[str] = (), ts_col: str = "ts",
                 tiebreak: str | None = None, alias: str = "count_change",
                 running: bool = False) -> DataFrame:
    """faxe `count_change` (esp_count_change.erl:26): number of value changes
    of a field. `running=True` adds a running count column per row; else
    aggregates to one row per group => sum((v != lag(v))::int)."""
    w = _w(by, ts_col, tiebreak)
    prev = F.lag(F.col(field)).over(w)
    # first row (prev is null because there IS no previous row) is not a change
    changed = F.when(prev.isNull() & (F.lag(F.lit(1)).over(w)).isNull(), F.lit(0)) \
        .otherwise((~F.col(field).eqNullSafe(prev)).cast("int"))
    marked = df.withColumn("_chg", changed)
    if running:
        return marked.withColumn(alias, F.sum("_chg").over(_w(by, ts_col, tiebreak)
                                                           .rowsBetween(Window.unboundedPreceding, 0))).drop("_chg")
    if by:
        return marked.groupBy(*by).agg(F.sum("_chg").alias(alias))
    return marked.agg(F.sum("_chg").alias(alias))
