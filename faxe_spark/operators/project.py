"""Projection / field-transform operators (SURVEY.md §2.3).

faxe addresses fields with dot-paths into a nested JSON document; the
Spark analog is nested-column expressions (`col("a.b.c")`, `withField`,
`element_at` — 1-based like the reference, SURVEY §1.2). These operators
therefore accept either flat column names or dot-paths.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _as_col(e: str | Column) -> Column:
    return F.expr(e) if isinstance(e, str) else e


def eval_lambdas(df: DataFrame, exprs: Mapping[str, str | Column]) -> DataFrame:
    """faxe `eval` (esp_eval.erl:24): N lambdas written to N `as` paths,
    applied sequentially so later lambdas see earlier results
    (fold at esp_eval.erl:44-62) => chained withColumn."""
    out = df
    for alias, e in exprs.items():
        out = out.withColumn(alias, _as_col(e))
    return out


def set_fields(df: DataFrame, values: Mapping[str, object]) -> DataFrame:
    """faxe `set` (esp_set.erl:28): set fields to constant values."""
    return df.withColumns({k: F.lit(v) for k, v in values.items()})


def default_fields(df: DataFrame, defaults: Mapping[str, object]) -> DataFrame:
    """faxe `default` (esp_default.erl:26, apply :95-131): set only when
    absent/null => coalesce(col, lit(default)). Missing columns are created."""
    out = df
    for k, v in defaults.items():
        if k in out.columns:
            out = out.withColumn(k, F.coalesce(F.col(k), F.lit(v)))
        else:
            out = out.withColumn(k, F.lit(v))
    return out


def keep(df: DataFrame, fields: Sequence[str], aliases: Sequence[str] | None = None) -> DataFrame:
    """faxe `keep` (esp_keep.erl:22): project to listed paths, optional
    rename via `as` => select(col.alias(...))."""
    aliases = aliases or fields
    return df.select(*[F.expr(f).alias(a) for f, a in zip(fields, aliases)])


def delete(df: DataFrame, fields: Sequence[str], *, when: str | Column | None = None) -> DataFrame:
    """faxe `delete` (esp_delete.erl:26): drop paths; conditional via
    `where` lambda => drop() or conditional null-out."""
    if when is None:
        return df.drop(*fields)
    cond = _as_col(when)
    out = df
    for f in fields:
        out = out.withColumn(f, F.when(cond, F.lit(None)).otherwise(F.col(f)))
    return out


def rename(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """faxe `rename` (esp_rename.erl:27) => withColumnsRenamed."""
    return df.withColumnsRenamed(dict(mapping))


def extract_path(df: DataFrame, paths: Sequence[str], aliases: Sequence[str],
                 defaults: Sequence[object] | None = None) -> DataFrame:
    """faxe `extract_path` (esp_extract_path.erl:24, :35-53): build a new
    row from listed paths with defaults => select(coalesce(path, default))."""
    cols = []
    for i, (p, a) in enumerate(zip(paths, aliases)):
        c = F.expr(p)
        if defaults is not None and defaults[i] is not None:
            c = F.coalesce(c, F.lit(defaults[i]))
        cols.append(c.alias(a))
    return df.select(*cols)


def case_when(df: DataFrame, conditions: Sequence[str | Column],
              values: Sequence[object], alias: str, default: object = None) -> DataFrame:
    """faxe `case` (esp_case.erl:28, eval :63-73): first-true lambda selects
    the corresponding value => chained F.when().otherwise(default)."""
    expr = None
    for cond, val in zip(conditions, values):
        c = _as_col(cond)
        expr = F.when(c, F.lit(val)) if expr is None else expr.when(c, F.lit(val))
    expr = expr.otherwise(F.lit(default)) if expr is not None else F.lit(default)
    return df.withColumn(alias, expr)


def if_else(df: DataFrame, test: str | Column, then_val: object, else_val: object,
            alias: str) -> DataFrame:
    """faxe `if` (esp_if.erl:25): ternary into `as`."""
    return df.withColumn(alias, F.when(_as_col(test), F.lit(then_val)).otherwise(F.lit(else_val)))


def fields_to_array(df: DataFrame, fields: Sequence[str], *, key_name: str = "key",
                    value_name: str = "value", alias: str = "data") -> DataFrame:
    """faxe `fields_to_array` (esp_fields_to_array.erl:33): pivot listed
    fields into an array of {key, value} structs."""
    structs = [
        F.struct(F.lit(f).alias(key_name), F.col(f).cast("double").alias(value_name))
        for f in fields
    ]
    return df.withColumn(alias, F.array(*structs))


def path_split(df: DataFrame, fields: Sequence[str], *, keep_cols: Sequence[str] = (),
               key_alias: str = "name", value_alias: str = "value") -> DataFrame:
    """faxe `path_split` (esp_path_split.erl:22): one output row per root
    key of the fields object => melt/stack + explode.

    All-numeric roots melt to a double value column; mixed shapes
    (struct/array roots — the s7-style payloads the node exists for)
    melt to the value's JSON text, which downstream dot-paths read as a
    JSON document (paths.get_path_safe string fallback)."""
    from pyspark.sql.types import ArrayType, MapType, NumericType, StructType

    def _v(f: str) -> F.Column:
        c = F.col(f"`{f}`")
        dt = df.schema[f].dataType
        if numeric_lane:
            return c.cast("double")
        if isinstance(dt, (StructType, ArrayType, MapType)):
            return F.to_json(c)
        return c.cast("string")

    numeric_lane = all(
        isinstance(df.schema[f].dataType, NumericType) for f in fields)
    pairs = F.array(*[
        F.struct(F.lit(f).alias(key_alias), _v(f).alias(value_alias))
        for f in fields
    ])
    out = df.select(*keep_cols, F.explode(pairs).alias("_kv"))
    return out.select(*keep_cols, f"_kv.{key_alias}", f"_kv.{value_alias}")


def array_explode(df: DataFrame, fields: Sequence[str], aliases: Sequence[str] | None = None,
                  *, ts_col: str | None = None, time_offset_ms: int = 0,
                  keep_cols: Sequence[str] = ()) -> DataFrame:
    """faxe `array_explode` (esp_array_explode.erl:28, process :49-84): one
    output row per element of one or more same-length arrays; optional
    synthetic ts offset per element (1-based position, matching the
    reference's 1-based indexing).

    => posexplode(arrays_zip(...)) — single generate, no shuffle.
    """
    aliases = list(aliases or fields)
    zipped = F.arrays_zip(*[F.col(f) for f in fields]) if len(fields) > 1 else None
    base = list(keep_cols)
    if zipped is not None:
        out = df.select(*base, *( [ts_col] if ts_col and ts_col not in base else []),
                        F.posexplode(zipped).alias("_pos", "_elem"))
        value_cols = [F.col("_elem").getField(f).alias(a) for f, a in zip(fields, aliases)]
    else:
        out = df.select(*base, *( [ts_col] if ts_col and ts_col not in base else []),
                        F.posexplode(F.col(fields[0])).alias("_pos", "_elem"))
        value_cols = [F.col("_elem").alias(aliases[0])]
    cols = [*base]
    if ts_col:
        if time_offset_ms:
            cols.append(
                (F.col(ts_col) + F.make_dt_interval(0, 0, 0, (F.col("_pos") + 1) * F.lit(time_offset_ms / 1000.0)))
                .alias(ts_col))
        else:
            cols.append(F.col(ts_col))
    cols.append((F.col("_pos") + 1).alias("pos"))  # 1-based, faxe-style
    return out.select(*cols, *value_cols)


def jsonsize(df: DataFrame, alias: str = "json_size") -> DataFrame:
    """faxe `jsonsize` (esp_jsonsize.erl:22): byte size of the row as
    JSON. NULL fields are KEPT as "field":null — the reference's jiffy
    encoding does the same, and it is what keeps the size identical to
    the DuckDB oracle's struct to_json (which always emits nulls)."""
    return df.withColumn(alias, F.octet_length(
        F.to_json(F.struct(*df.columns),
                  {"ignoreNullFields": "false"})))


def shift_time(df: DataFrame, offset: str, ts_col: str = "ts") -> DataFrame:
    """faxe `shift` (esp_shift.erl:22 `{offset, duration, "-30s"}`):
    move the event timestamp by a (possibly negative) duration.
    Millisecond-exact interval arithmetic, pure Column op."""
    from faxe_spark.durations import parse_duration_ms

    ms = parse_duration_ms(offset)
    return df.withColumn(ts_col, F.col(ts_col) + F.expr(f"INTERVAL {ms} MILLISECOND"))
