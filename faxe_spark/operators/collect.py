"""Collect-table operators (SURVEY.md §2.6 bottom): keyed upsert state.

faxe `collect` (esp_collect.erl:63) maintains a keyed in-memory table with
add/remove/update lambdas; `collect_unique` (esp_collect_unique.erl:51)
keeps the last row per key value; `collect_fields`
(esp_collect_fields.erl:33) carries the last seen value per field forward.

Batch analogs below (deterministic, oracle-checkable); streaming versions
use the state store (faxe_spark.streaming.stateful).
"""

from __future__ import annotations

from collections.abc import Iterable

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.window import Window


def collect_unique(df: DataFrame, key_field: str, *, ts_col: str = "ts",
                   tiebreak: str | None = None) -> DataFrame:
    """Last row per distinct `key_field` value (esp_collect_unique.erl:51)
    => row_number() over (key ORDER BY ts DESC) = 1. One shuffle on the key;
    at scale this beats max_by-struct because it prunes columns early."""
    order = [F.col(ts_col).desc()] + ([F.col(tiebreak).desc()] if tiebreak else [])
    w = Window.partitionBy(F.col(key_field)).orderBy(*order)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def collect_fields(df: DataFrame, fields: Iterable[str], *, by: Iterable[str] = (),
                   ts_col: str = "ts", tiebreak: str | None = None,
                   suffix: str = "_last") -> DataFrame:
    """Carry the last non-null value of each listed field forward
    (esp_collect_fields.erl:33) => last(col, ignorenulls) over an
    unbounded-preceding frame."""
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    if not by:
        from faxe_spark.operators.common import warn_global_order
        warn_global_order("collect_fields")
    base = (Window.partitionBy(*[F.col(c) for c in by]) if by else Window.partitionBy())
    w = base.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    out = df
    for f in fields:
        out = out.withColumn(f"{f}{suffix}", F.last(F.col(f), ignorenulls=True).over(w))
    return out


def collect_table(df: DataFrame, key_fields: Iterable[str], *,
                  remove_when: str | Column | None = None,
                  max_ts_age: str | None = None,
                  ts_col: str = "ts", tiebreak: str | None = None) -> DataFrame:
    """faxe `collect` batch analog: final state of the keyed upsert table —
    the last row per key, dropped if its final action matches `remove_when`
    (the `remove` lambda, esp_collect.erl:22-33). `max_ts_age` is the
    event-time eviction (emit_buffer_cleanup, esp_collect.erl:300-317):
    keys whose final row is older than (newest ts seen anywhere) - age
    are dropped. The newest-ts probe is a 1-row broadcast (scalar agg),
    not a global window."""
    from faxe_spark.durations import parse_duration_ms

    keys = list(key_fields)
    order = [F.col(ts_col).desc()] + ([F.col(tiebreak).desc()] if tiebreak else [])
    w = Window.partitionBy(*[F.col(c) for c in keys]).orderBy(*order)
    latest = df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    if remove_when is not None:
        cond = F.expr(remove_when) if isinstance(remove_when, str) else remove_when
        latest = latest.filter(~cond)
    if max_ts_age is not None:
        age_us = parse_duration_ms(max_ts_age) * 1000
        newest = df.agg(F.max(F.unix_micros(F.col(ts_col))).alias("_newest_us"))
        latest = (latest.crossJoin(F.broadcast(newest))
                  .filter(F.unix_micros(F.col(ts_col))
                          >= F.col("_newest_us") - F.lit(age_us))
                  .drop("_newest_us"))
    return latest
