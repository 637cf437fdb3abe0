"""Joins & stream combination (SURVEY.md §2.7).

faxe's `join` is an N-way as-of/nearest-timestamp join with tolerance
(esp_join.erl:85-128, nearest :197-207, inner-vs-outer fill :146-156).

Two Spark-first implementations:

1. `asof_join` — pure window-function formulation (union + last_value over
   a key-partitioned ts-ordered frame). Entirely JVM-side / whole-stage
   codegen, one shuffle on the key: THE scalable path at 100 TB (no Python,
   no per-row state; AQE handles skewed keys).
2. `asof_join_exact` — `applyInPandas` + `pandas.merge_asof` per key group.
   Kept for parity/backstop and for semantics window functions can't
   express; Arrow-batched, but the union trick above is preferred.

`interval_join` (all pairs within tolerance) is the stream-stream
interval-join analog; `combine` (esp_combine.erl:55) = backward as-of
enrich; `union_streams` (esp_union.erl:18) = unionByName.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.window import Window

from faxe_spark.durations import parse_duration_ms


def _q(name: str) -> Column:
    """Exact-name column ref — names may be literally dotted (DFS
    dot-path writes), which unquoted F.col would parse as struct nav."""
    return F.col("`" + name + "`")


def _prefixed(df: DataFrame, keys: Sequence[str], ts_col: str, prefix: str) -> tuple[DataFrame, list[str]]:
    value_cols = [c for c in df.columns if c not in keys and c != ts_col]
    renamed = df.select(
        *[_q(k) for k in keys], _q(ts_col),
        *[_q(c).alias(f"{prefix}{c}") for c in value_cols],
    )
    return renamed, [f"{prefix}{c}" for c in value_cols]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    ts_col: str = "ts",
    direction: str = "backward",
    tolerance: str | int | None = None,
    right_prefix: str = "r_",
    how: str = "left",
) -> DataFrame:
    """As-of join: each left row gets the nearest right row per key.

    direction: 'backward' (right.ts <= left.ts, the `combine` semantics),
    'forward', or 'nearest' (faxe join default; ties -> earlier right row,
    per SURVEY §7.4 determinism note). `tolerance` limits |Δts|; beyond it
    the right side is null (how='left') or the row is dropped (how='inner',
    faxe `full=true`).

    Implementation: union both sides with a source marker, then
    last_value(right_col, ignorenulls) over (key ORDER BY ts, marker) —
    a single shuffle, no Python, whole-stage codegen.
    """
    tol_ms = parse_duration_ms(tolerance) if tolerance is not None else None
    keys = list(on)
    r, r_cols = _prefixed(right, keys, ts_col, right_prefix)
    r = r.withColumn(f"{right_prefix}_ts", F.col(ts_col))
    r_cols = [f"{right_prefix}_ts", *r_cols]

    l_marked = left.withColumn("_src", F.lit(1))
    r_marked = r.withColumn("_src", F.lit(0))
    unioned = l_marked.unionByName(r_marked, allowMissingColumns=True)

    def enrich(dir_: str, suffix: str) -> list[Column]:
        if dir_ == "backward":
            w = (Window.partitionBy(*keys).orderBy(F.col(ts_col).asc(), F.col("_src").asc())
                 .rowsBetween(Window.unboundedPreceding, 0))
            return [F.last(_q(c), ignorenulls=True).over(w).alias(f"{c}{suffix}") for c in r_cols]
        w = (Window.partitionBy(*keys).orderBy(F.col(ts_col).desc(), F.col("_src").asc())
             .rowsBetween(Window.unboundedPreceding, 0))
        return [F.last(_q(c), ignorenulls=True).over(w).alias(f"{c}{suffix}") for c in r_cols]

    if direction in ("backward", "forward"):
        d = "backward" if direction == "backward" else "forward"
        enriched = unioned.select("*", *enrich(d, "_m"))
        picked = {c: _q(f"{c}_m") for c in r_cols}
    else:  # nearest: compute both directions, pick closer (ties -> backward)
        enriched = unioned.select("*", *enrich("backward", "_b"), *enrich("forward", "_f"))
        lt = F.unix_micros(F.col(ts_col))
        bdist = lt - F.unix_micros(_q(f"{right_prefix}_ts_b"))
        fdist = F.unix_micros(_q(f"{right_prefix}_ts_f")) - lt
        use_b = _q(f"{right_prefix}_ts_f").isNull() | (
            _q(f"{right_prefix}_ts_b").isNotNull() & (bdist <= fdist))
        picked = {c: F.when(use_b, _q(f"{c}_b")).otherwise(_q(f"{c}_f")) for c in r_cols}

    out = enriched.filter(F.col("_src") == 1)
    match_ts = picked[f"{right_prefix}_ts"]
    if tol_ms is not None:
        # compare at microsecond precision — ms truncation could disagree
        # with an oracle at the exact tolerance boundary
        dist = F.abs(F.unix_micros(F.col(ts_col)) - F.unix_micros(match_ts))
        within = match_ts.isNotNull() & (dist <= F.lit(tol_ms * 1000))
    else:
        within = match_ts.isNotNull()

    final_cols = [_q(c) for c in left.columns]
    for c in r_cols:
        final_cols.append(F.when(within, picked[c]).alias(c))
    res = out.select(*final_cols)
    if how == "inner":
        res = res.filter(F.col(f"{right_prefix}_ts").isNotNull())
    return res


def asof_join_exact(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    ts_col: str = "ts",
    direction: str = "backward",
    tolerance: str | int | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """As-of join via pandas.merge_asof inside applyInPandas (per-key
    groups, Arrow-batched). Semantics identical to `asof_join`; used as a
    cross-check and for exotic variants. Prefer `asof_join` at scale."""
    tol = pd.Timedelta(milliseconds=parse_duration_ms(tolerance)) if tolerance is not None else None
    keys = list(on)
    r, r_cols = _prefixed(right, keys, ts_col, right_prefix)
    r = r.withColumn(f"{right_prefix}_ts", F.col(ts_col))
    r_cols = [f"{right_prefix}_ts", *r_cols]

    out_schema = left.schema
    from pyspark.sql.types import StructType
    fields = list(out_schema.fields)
    r_schema = {f.name: f for f in r.schema.fields}
    for c in r_cols:
        fields.append(r_schema[c])
    result_schema = StructType(fields)

    l_cols = list(left.columns)
    l_tagged = left.withColumn("_side", F.lit("l"))
    r_tagged = r.withColumn("_side", F.lit("r"))
    both = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    def merge(_key, pdf: pd.DataFrame) -> pd.DataFrame:
        lp = pdf[pdf["_side"] == "l"][l_cols].sort_values(ts_col).reset_index(drop=True)
        rp = pdf[pdf["_side"] == "r"][[*keys, ts_col, *r_cols]].sort_values(ts_col).reset_index(drop=True)
        rp = rp.rename(columns={ts_col: "_rts"})
        if lp.empty:
            return pd.DataFrame(columns=[*l_cols, *r_cols])
        if rp.empty:
            for c in r_cols:
                lp[c] = None
            return lp
        merged = pd.merge_asof(
            lp, rp.drop(columns=keys), left_on=ts_col, right_on="_rts",
            direction=direction, tolerance=tol, allow_exact_matches=True,
        )
        return merged[[*l_cols, *r_cols]]

    return both.groupBy(*keys).applyInPandas(merge, schema=result_schema)


def interval_join(left: DataFrame, right: DataFrame, on: Sequence[str], *,
                  ts_col: str = "ts", tolerance: str | int = "1s",
                  right_prefix: str = "r_", how: str = "inner") -> DataFrame:
    """All-pairs join within |Δts| <= tolerance — Spark's stream-stream
    interval join analog of faxe `join2` (multi-row-per-ts,
    esp_join2.erl:50)."""
    tol_ms = parse_duration_ms(tolerance)
    keys = list(on)
    r, r_cols = _prefixed(right, keys, ts_col, right_prefix)
    r = r.withColumnRenamed(ts_col, f"{right_prefix}_ts")
    cond = F.lit(True)  # keyless: pure time-proximity join (faxe default)
    for k in keys:
        cond = cond & (left[k] == r[k])
    cond = cond & (
        F.abs(F.unix_micros(left[ts_col]) - F.unix_micros(r[f"{right_prefix}_ts"])) <= F.lit(tol_ms * 1000)
    )
    joined = left.join(r, cond, how)
    return joined.select(*[left[c] for c in left.columns], f"{right_prefix}_ts", *r_cols)


def _merge_deep(a: Column, b: Column, dtype) -> Column:
    """Nested-merge rules inside a map/struct (esp_join.erl merge_fun
    :246-251): nested maps recurse, lists merge, scalars -> right wins
    (null-safe either way)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dtype, MapType):
        inner = dtype.valueType
        return F.map_zip_with(
            a, b,
            lambda k, x, y: F.when(x.isNull(), y).when(y.isNull(), x)
            .otherwise(_merge_deep(x, y, inner)))
    if isinstance(dtype, StructType):
        return F.struct(*[
            _merge_deep(a[f.name], b[f.name], f.dataType).alias(f.name)
            for f in dtype.fields])
    if isinstance(dtype, ArrayType):
        return F.when(a.isNull(), b).when(b.isNull(), a) \
                .otherwise(F.array_sort(F.concat(a, b)))
    return F.coalesce(b, a)


def merge_value(a: Column, b: Column, dtype) -> Column:
    """Top-level merge of two same-typed field values (esp_join.erl
    merge/2 :228-236): maps deep-merge, lists merge (sorted), numbers
    ADD, strings concatenate. Type dispatch happens at PLAN time from
    the column dtype — the whole merge stays in whole-stage codegen
    (map_zip_with / concat / +), no Python in the row path."""
    from pyspark.sql.types import ArrayType, MapType, NumericType, StringType, StructType

    if isinstance(dtype, (MapType, StructType)):
        return _merge_deep(a, b, dtype)
    if isinstance(dtype, ArrayType):
        return F.array_sort(F.concat(a, b))
    if isinstance(dtype, NumericType):
        return a + b
    if isinstance(dtype, StringType):
        return F.concat(a, b)
    raise TypeError(
        f"cannot merge fields of type {dtype.simpleString()} "
        f"(reference merges maps, lists, numbers, strings — esp_join.erl:228-236)")


def merge_join(streams: Sequence[DataFrame], on: Sequence[str], *,
               ts_col: str = "ts", merge_field: str = "value",
               direction: str = "nearest", tolerance: str | int | None = None,
               how: str = "left") -> DataFrame:
    """faxe join with `merge_field` (esp_join.erl:205-216): instead of
    prefix-joining whole points, align the N streams on (key, ~ts) and
    MERGE one field across them — maps deep-merge, numbers add, strings
    concat (merge/2 :228-236). how='inner' mirrors full=true (only
    complete rows emit); how='left' keeps partial rows with the
    unmerged value (the missing_timeout emit path :146-156 in batch
    form, where 'the timeout expired' = 'no partner within tolerance').

    Implemented as a fold of as-of alignments (each one shuffle, window
    formulation — see asof_join): stream i+1's merge field is aligned
    to the accumulated left side, then merged at plan time."""
    if len(streams) < 2:
        raise ValueError("merge_join needs at least 2 streams")
    keys = list(on)
    out = streams[0]
    dtype = out.schema[merge_field].dataType
    for i, s in enumerate(streams[1:]):
        right = s.select(*keys, ts_col, F.col(merge_field).alias("_mf"))
        pref = f"_mj{i}_"
        aligned = asof_join(out, right, keys, ts_col=ts_col, direction=direction,
                            tolerance=tolerance, right_prefix=pref, how=how)
        matched = F.col(f"{pref}_ts").isNotNull()
        merged = F.when(matched,
                        merge_value(F.col(merge_field), F.col(f"{pref}_mf"), dtype)) \
                  .otherwise(F.col(merge_field))
        out = (aligned.withColumn(merge_field, merged)
               .drop(f"{pref}_ts", f"{pref}_mf"))
    return out


def combine(trigger: DataFrame, latest_from: DataFrame, on: Sequence[str], *,
            ts_col: str = "ts", prefix: str = "c_", tolerance: str | int | None = None) -> DataFrame:
    """faxe `combine` (esp_combine.erl:55): every trigger row enriched with
    the most recent row from the other stream => backward as-of join."""
    return asof_join(trigger, latest_from, on, ts_col=ts_col, direction="backward",
                     tolerance=tolerance, right_prefix=prefix, how="left")


def union_streams(*dfs: DataFrame) -> DataFrame:
    """faxe `union` (esp_union.erl:18) => unionByName(allowMissingColumns)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def salted_join(skewed: DataFrame, dim: DataFrame, on: str, *,
                salt: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join resilient to EXTREME key skew: salt the skewed side
    with hash(row)%salt, replicate the dim side once per salt value,
    join on (key, salt). The hot key's rows spread over `salt` tasks
    instead of one straggler.

    Output-identical to `skewed.join(dim, on, how)` for inner/left
    (tests/test_plans.py::test_salted_join_matches_plain). AQE's
    skew-join split handles MODERATE skew post-shuffle, but it can only
    split existing shuffle blocks of one join side; replicate-the-dim
    salting is the lever when a single key dominates entire partitions
    (the 100 TB power-law case: one user/device producing >> 1/parallelism
    of all events). Cost: dim side inflated x salt — keep for small dims."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt)))
    replicated = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = salted.join(replicated, [on, "_salt"], how)
    return out.drop("_salt")
