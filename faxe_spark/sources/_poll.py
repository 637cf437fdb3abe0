"""Shared rate-source clock for the periodic pollers (http, pg,
mongo, modbus, s7 — one implementation of the `every`/`align` tick
semantics instead of five copies).

Sub-second and non-whole-second cadences are honored (the reference's
`every` is a millisecond duration): the rate source runs at
1000/gcd(every_ms, 1000) rows per second (capped at 100 — cadences
whose exact honoring would need >100 Hz are rounded to the nearest
10 ms) and ticks keep every `every_ms * rps / 1000`-th row. `align`
snaps to wall-clock multiples and therefore applies to whole-second
cadences only (the faxe_time:align semantics)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F


def poll_ticks(spark, every: str, align: bool = False):
    """One row per poll tick: the `timestamp` column is the tick time."""
    from faxe_spark.durations import parse_duration_ms

    every_ms = max(1, parse_duration_ms(every))
    rps = 1000 // math.gcd(every_ms, 1000)
    if rps > 100:
        every_ms = max(10, round(every_ms / 10) * 10)
        rps = 1000 // math.gcd(every_ms, 1000)
    step = max(1, every_ms * rps // 1000)
    rate = (spark.readStream.format("rate")
            .option("rowsPerSecond", rps).load())
    if align and every_ms % 1000 == 0:
        return rate.filter(
            F.unix_seconds("timestamp") % (every_ms // 1000) == 0)
    return rate.filter(F.col("value") % step == 0)
