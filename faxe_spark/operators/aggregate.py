"""Aggregation operators.

Mirrors faxe's `aggregate` node (reference: esp_aggregate.erl:46, function
whitelist :14-33, incremental accumulators :169-212) and the stats family
(components/stats/*.erl, alias table faxe_dfs.erl:568-589).

Spark-first: every function maps to a built-in JVM aggregate expression so
the whole thing runs as partial+final hash aggregation inside whole-stage
codegen — the reference's incremental accumulators come for free. No UDAFs.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _geometric_mean(c: Column) -> Column:
    # exp(mean(ln x)) — matches mathex usage in esp_aggregate.erl:233-254
    return F.exp(F.avg(F.log(c)))


def _range(c: Column) -> Column:
    return F.max(c) - F.min(c)


# name -> fn(Column) -> Column. Names follow the reference whitelist
# (esp_aggregate.erl:14-33) + stats aliases (faxe_dfs.erl:568-589).
AGG_FUNCTIONS = {
    "count": F.count,
    "count_distinct": F.count_distinct,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "avg": F.avg,
    "mean": F.avg,
    "stddev": F.stddev_samp,
    "variance": F.var_samp,
    "median": F.median,
    "range": _range,
    "skew": F.skewness,
    "kurtosis": F.kurtosis,
    "geometric_mean": _geometric_mean,
    "distinct": lambda c: F.array_sort(F.collect_set(c)),
}

# functions whose result is exact (no FP accumulation ordering effects);
# everything else gets optional rounding for oracle-stable output
_EXACT = {"count", "count_distinct", "min", "max"}


def agg_expr(func: str, field: str | Column, alias: str, *, ts_col: str = "ts",
             round_to: int | None = None) -> Column:
    """One aggregate expression by reference function name.

    Supports `percentile:P` (P in 0-100, exact linear interpolation —
    esp_percentile.erl:62-71) and ts-ordered `first`/`last`
    (stats/c_agg.erl:12-34 picks by timestamp).
    """
    c = F.col(field) if isinstance(field, str) else field
    if func.startswith("percentile"):
        _, _, at = func.partition(":")
        expr = F.percentile(c, float(at) / 100.0)
    elif func == "first":
        expr = F.min_by(c, F.col(ts_col))
    elif func == "last":
        expr = F.max_by(c, F.col(ts_col))
    elif func == "count_change":
        # number of ts-ordered value changes within the group — the
        # aggregate form of esp_count_change.erl:26 (dfs: aggregate
        # .functions('count_change')); ordered fold over the collected
        # (ts, value) pairs, element_at guarded for 1-row groups
        pairs = F.array_sort(F.collect_list(
            F.struct(F.col(ts_col).alias("t"), c.alias("v"))))
        vals = F.transform(pairs, lambda s: s["v"])
        n = F.size(vals)
        cnt = F.aggregate(
            F.sequence(F.lit(2), F.greatest(n, F.lit(2))), F.lit(0),
            lambda acc, i: acc + F.when(
                F.element_at(vals, i.cast("int"))
                != F.element_at(vals, (i - 1).cast("int")), 1).otherwise(0))
        expr = F.when(n < 2, F.lit(0)).otherwise(cnt)
    else:
        expr = AGG_FUNCTIONS[func](c)
    if round_to is not None and func not in _EXACT:
        expr = F.round(expr, round_to)
    return expr.alias(alias)


# buffer-based (TypedImperativeAggregate) functions: combining these with
# DISTINCT aggregates in one pass forces Spark into an expand +
# ObjectHashAggregate plan that serializes the buffers through the expand —
# measured 3x slower than two separate passes joined on the keys.
_IMPERATIVE = ("median", "percentile")
_DISTINCT = ("count_distinct", "distinct")


def aggregate(
    df: DataFrame,
    specs: Sequence[tuple[str, str, str]],
    by: Iterable[str | Column] = (),
    *,
    ts_col: str = "ts",
    round_to: int | None = None,
) -> DataFrame:
    """faxe `aggregate`: N (field, function, as) triples -> one row per group.

    Reference: esp_aggregate.erl:46 (N-triple API), :215-257 (final agg).
    The reference's `keep`/`keep_tail` carry-over is expressed by adding
    the kept fields to `by` or joining the result back.

    Scale: pure groupBy().agg() — shuffles once on the group keys with
    map-side partial aggregation. When the spec mixes DISTINCT aggregates
    with buffer-based ones (median/percentile), the two families are
    computed in separate passes and joined on the group keys: Catalyst's
    single-pass plan for that mix (expand + ObjectHashAggregate) moves
    every median buffer through the distinct expand — measured 3x slower.
    The extra pass reads the (columnar, pruned) source twice but each
    pass stays in fast hash aggregation.
    """
    keys = list(by)

    def run(sub: Sequence[tuple[str, str, str]]) -> DataFrame:
        exprs = [agg_expr(fn, f, alias, ts_col=ts_col, round_to=round_to)
                 for f, fn, alias in sub]
        return df.groupBy(*keys).agg(*exprs) if keys else df.agg(*exprs)

    has_imp = any(fn.startswith(_IMPERATIVE) for _, fn, _ in specs)
    has_dist = any(fn in _DISTINCT for _, fn, _ in specs)
    if not (has_imp and has_dist) or not all(isinstance(k, str) for k in keys):
        return run(specs)

    imp = [s for s in specs if s[1].startswith(_IMPERATIVE)]
    rest = [s for s in specs if not s[1].startswith(_IMPERATIVE)]
    left, right = run(rest), run(imp)
    if not keys:
        return left.crossJoin(right)
    out = left.join(right, on=keys, how="inner")
    # preserve the caller's column order
    ordered = [*keys, *[alias for _, _, alias in specs]]
    return out.select(*ordered)


def percentile(df: DataFrame, field: str, at: float, alias: str | None = None,
               by: Iterable[str] = (), round_to: int | None = None) -> DataFrame:
    """faxe `percentile` node — exact interpolated percentile (esp_percentile.erl:26)."""
    alias = alias or f"{field}_percentile"
    return aggregate(df, [(field, f"percentile:{at}", alias)], by, round_to=round_to)


def top_k(df: DataFrame, field: str, k: int, by: Iterable[str] = (), *,
          bottom: bool = False, tiebreak: str | None = None,
          salt: int | None = None) -> DataFrame:
    """stats `top`/`bottom(num)` (stats/esp_top.erl:17-25).

    Emits the k largest (smallest) rows per group with a `rank` column.
    Deterministic: ties broken by `tiebreak` column when given.

    `salt` is accepted for call-site compatibility but the manual
    two-phase pre-prune it used to enable is GONE (r11, guide §2.4:
    remove the shuffle outright): on this engine the optimizer already
    rewrites row_number+filter(rank<=k) into the equivalent protection
    natively — grouped top-k gets WindowGroupLimit (a map-side partial
    per-group limit BEFORE the exchange, bounding every task's buffer
    at k per group: exactly what the salt phase bought, minus its
    extra shuffle), and ungrouped top-k is collapsed into
    TakeOrderedAndProject (the distributed partial top-k — no
    single-partition sort of the input exists in the physical plan).
    A/B at sf0.1: grouped-with-hot-key 0.376 -> 0.174 s, global over
    events 0.272 -> 0.095 s, exceptAll = 0 both ways. If this ever
    runs on an engine without the rewrite, re-introduce the two-phase
    form guarded on the version."""
    from pyspark.sql.window import Window

    order = [F.col(field).asc() if bottom else F.col(field).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    keys = [F.col(c) for c in by]
    w = Window.partitionBy(*keys).orderBy(*order) if by else Window.orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def dist_count(df: DataFrame, field: str | Column, by: Iterable[str] = (),
               count_alias: str = "cnt") -> DataFrame:
    """stats `dist_count` — count per distinct value of a field
    (stats/esp_stats_dist_count.erl:79-99) => groupBy(value).count()."""
    c = F.col(field) if isinstance(field, str) else field
    keys = [*by, c.alias("value") if not isinstance(field, str) else field]
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(count_alias))


def statistics(df: DataFrame, field: str, funcs: Sequence[str], by: Iterable[str] = (),
               ts_col: str = "ts", round_to: int | None = None) -> DataFrame:
    """faxe `statistics` node — several stat functions over one field merged
    into one row (esp_statistics.erl:24) => a single .agg() pass."""
    specs = [(field, fn, f"{field}_{fn.replace(':', '_')}") for fn in funcs]
    return aggregate(df, specs, by, ts_col=ts_col, round_to=round_to)
