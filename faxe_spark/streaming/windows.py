"""Streaming windows (SURVEY.md §2.5) — same groupBy expressions as the
batch operators, plus watermarks for state cleanup / late data.

The reference evicts purely by newest-seen ts (esp_win_time.erl:81-85)
and drops late points (esp_stats.erl:52-74); a Spark watermark of 0
reproduces that, and any positive watermark is a superset (bounded
lateness tolerance faxe doesn't have).
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from faxe_spark.durations import duration_to_interval
from faxe_spark.operators.aggregate import agg_expr
from faxe_spark.operators.window import win_time, win_session


def win_time_stream(df: DataFrame, specs: Sequence[tuple[str, str, str]], *,
                    ts_col: str = "ts", period: str, every: str | None = None,
                    by: Iterable[str] = (), watermark: str = "0s") -> DataFrame:
    """faxe win_time (esp_win_time.erl:28) on a stream: watermarked
    sliding/tumbling window aggregation; emits on watermark advance."""
    wm = df.withWatermark(ts_col, duration_to_interval(watermark))
    w = win_time(ts_col, period, every).alias("window")
    exprs = [agg_expr(fn, f, alias, ts_col=ts_col) for f, fn, alias in specs]
    return wm.groupBy(w, *by).agg(*exprs)


def win_session_stream(df: DataFrame, specs: Sequence[tuple[str, str, str]], *,
                       ts_col: str = "ts", gap: str, by: Iterable[str] = (),
                       watermark: str = "0s") -> DataFrame:
    """faxe win_session (esp_win_session.erl:30) on a stream: native
    session_window + watermark (sessions close when the watermark passes
    last_event + gap)."""
    wm = df.withWatermark(ts_col, duration_to_interval(watermark))
    w = win_session(ts_col, gap).alias("session")
    exprs = [agg_expr(fn, f, alias, ts_col=ts_col) for f, fn, alias in specs]
    return wm.groupBy(w, *by).agg(*exprs)


def win_clock_stream(df: DataFrame, specs: Sequence[tuple[str, str, str]], *,
                     period: str, by: Iterable[str] = ()) -> DataFrame:
    """faxe win_clock (esp_win_clock.erl:33): processing-time window —
    window over the arrival timestamp (current_timestamp at ingest),
    emitted per micro-batch trigger. The `align` option is inherent
    (window() snaps to epoch-aligned boundaries)."""
    stamped = df.withColumn("_proc_ts", F.current_timestamp())
    wm = stamped.withWatermark("_proc_ts", "0 seconds")
    w = F.window("_proc_ts", duration_to_interval(period)).alias("window")
    exprs = [agg_expr(fn, f, alias, ts_col="_proc_ts") for f, fn, alias in specs]
    return wm.groupBy(w, *by).agg(*exprs)
