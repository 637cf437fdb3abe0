"""Filter / sampling operators (SURVEY.md §2.4)."""

from __future__ import annotations

from collections.abc import Iterable

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.window import Window

from faxe_spark.durations import duration_to_interval


def where(df: DataFrame, predicate: str | Column) -> DataFrame:
    """faxe `where` (esp_where.erl:22): keep rows where the lambda is truthy.

    => `df.filter(...)` — fully Catalyst-visible, so the predicate pushes
    down to the parquet scan (check `.explain()` for PushedFilters).
    """
    return df.filter(F.expr(predicate) if isinstance(predicate, str) else predicate)


def _ordered_window(by: Iterable[str], ts_col: str, tiebreak: str | None) -> Window:
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    if by:
        return Window.partitionBy(*[F.col(c) for c in by]).orderBy(*order)
    from faxe_spark.operators.common import warn_global_order
    warn_global_order("sample/change_detect")
    return Window.orderBy(*order)


def sample_nth(df: DataFrame, n: int, *, by: Iterable[str] = (), ts_col: str = "ts",
               tiebreak: str | None = None) -> DataFrame:
    """faxe `sample(rate=N)` (esp_sample.erl:27): pass every Nth item."""
    if n < 1:
        # review find (via the stream twin): Spark's integral `% 0`
        # is NULL, so n=0 silently returned an EMPTY result instead
        # of erroring
        raise ValueError(f"sample_nth needs n >= 1, got {n}")
    w = _ordered_window(by, ts_col, tiebreak)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") % n == 0).drop("_rn")


def sample_per(df: DataFrame, every: str, *, by: Iterable[str] = (), ts_col: str = "ts",
               tiebreak: str | None = None) -> DataFrame:
    """faxe `sample(rate=duration)`: first item per time bucket."""
    bucket = F.window(F.col(ts_col), duration_to_interval(every))["start"]
    w = Window.partitionBy(*([F.col(c) for c in by] + [bucket])).orderBy(
        F.col(ts_col), *( [F.col(tiebreak)] if tiebreak else []))
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def change_detect(df: DataFrame, fields: Iterable[str], *, by: Iterable[str] = (),
                  ts_col: str = "ts", tiebreak: str | None = None,
                  emit_first: bool = True) -> DataFrame:
    """faxe `change_detect` (esp_change_detect.erl:41): emit only when the
    monitored field values differ from the previous row (strict equality).

    => lag() over (key, ts) + null-safe inequality filter. The streaming
    `reset_timeout` option maps to the stateful variant (faxe_spark.streaming).
    """
    w = _ordered_window(by, ts_col, tiebreak)
    changed = F.lit(False)
    for f in fields:
        prev = F.lag(F.col(f)).over(w)
        changed = changed | ~F.col(f).eqNullSafe(prev)
    if emit_first:
        first_marker = F.lag(F.lit(1)).over(w)  # null only on the first row
        changed = changed | first_marker.isNull()
    return df.withColumn("_chg", changed).filter(F.col("_chg")).drop("_chg")


def distinct_values(df: DataFrame, field: str, by: Iterable[str] = ()) -> DataFrame:
    """stats `distinct` (stats/esp_distinct.erl:11): distinct values of a
    field per group => dropDuplicates on (by, field)."""
    return df.select(*by, field).dropDuplicates([*by, field])


def sample_stratified(df: DataFrame, strata_col: str,
                      fractions: dict, *, seed: int = 42) -> DataFrame:
    """Stratified sampling for training-data mixes: per-stratum keep
    fractions (e.g. {"en": 1.0, "und": 0.1} to downweight unknown-
    language docs). Spark-native `sampleBy` — per-row Bernoulli with a
    seeded hash, fully distributed, no shuffle; deterministic for a
    fixed seed + partitioning (pin the layout before sampling when the
    mix must be reproducible)."""
    return df.sampleBy(strata_col, fractions, seed)
