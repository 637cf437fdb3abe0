"""Dot-path field addressing on nested columns — the `flowdata` analog.

Reference semantics (SURVEY.md §1.2; flowdata_tests.erl):
- `"a.b.c"` deep access (tests :60-72), auto-creating intermediate
  objects on set (:175-184);
- `"this[2].is.my.paths[2].id"` — 1-based array indexes (:26-29),
  matching Spark's `element_at`;
- delete / rename operate on paths (:74-160).

Spark mapping: reads compile to `getField`/`element_at` chains; writes
use `Column.withField` (nested struct rebuild — Catalyst turns it into
a single projection); deletes use `dropFields`. All pure Column ops.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_SEG = re.compile(r"^([^\[\]]+)((?:\[\d+\])*)$")


def parse_path(path: str) -> list[tuple[str, list[int]]]:
    """'a.b[2].c' -> [('a', []), ('b', [2]), ('c', [])]; indexes 1-based."""
    out = []
    for seg in path.split("."):
        m = _SEG.match(seg)
        if not m:
            raise ValueError(f"invalid path segment: {seg!r} in {path!r}")
        name, idx_part = m.group(1), m.group(2)
        idxs = [int(i) for i in re.findall(r"\[(\d+)\]", idx_part)]
        if any(i < 1 for i in idxs):
            raise ValueError(f"array indexes are 1-based (got {seg!r})")
        out.append((name, idxs))
    return out


def get_path(path: str) -> Column:
    """Column for a dot-path; missing paths read as NULL (undefined)."""
    segs = parse_path(path)
    col: Column | None = None
    for name, idxs in segs:
        col = F.col(name) if col is None else col.getField(name)
        for i in idxs:
            col = F.element_at(col, i)  # 1-based, like the reference
    return col


def get_path_safe(df: DataFrame, path: str) -> Column:
    """Like get_path, but schema-aware:
    - a path absent from the schema reads as NULL (the reference's
      `undefined` for missing fields, esp_aggregate.erl:134-137
      skip-undefined behavior) instead of an analysis error;
    - a path that descends INTO a string column reads it as a JSON
      document (get_json_object) — undecoded payloads are JSON text in
      the reference's world, so 'data.x' over a string `data` is a
      JSON extract, not an error."""
    from pyspark.sql.types import ArrayType, StringType, StructType

    # exact-name first: DFS write nodes (eval/case .as with dot-paths)
    # create literally-dotted flat columns via withColumn; reading such a
    # name back must hit the flat column, not attempt struct navigation.
    if path in df.columns:
        return F.col("`" + path + "`")
    segs = parse_path(path)
    dtype: object = df.schema
    for i, (name, idxs) in enumerate(segs):
        if isinstance(dtype, StringType) and i > 0:
            prefix = segs[:i]
            base = None
            for n, ixs in prefix:
                base = F.col(n) if base is None else base.getField(n)
                for ix in ixs:
                    base = F.element_at(base, ix)
            rest = "$." + ".".join(
                n + "".join(f"[{ix - 1}]" for ix in ixs)
                for n, ixs in segs[i:])
            return F.get_json_object(base, rest)
        if not isinstance(dtype, StructType) or name not in dtype.fieldNames():
            return F.lit(None)
        dtype = dtype[name].dataType
        if idxs and isinstance(dtype, StringType):
            # indexing INTO a string column is a JSON-array extract —
            # 'data[2].x' over a string `data` reads $[1].x of its
            # JSON (r11 review: this shape fell through to the
            # ArrayType check and silently read NULL while the
            # sibling 'data.x' shape JSON-extracted)
            base = None
            for n, ixs in segs[:i]:
                base = F.col(n) if base is None else base.getField(n)
                for ix in ixs:
                    base = F.element_at(base, ix)
            base = (F.col(name) if base is None
                    else base.getField(name))
            rest = "$" + "".join(f"[{ix - 1}]" for ix in idxs)
            tail = ".".join(
                n + "".join(f"[{ix - 1}]" for ix in ixs)
                for n, ixs in segs[i + 1:])
            if tail:
                rest += "." + tail
            return F.get_json_object(base, rest)
        for _ in idxs:
            if not isinstance(dtype, ArrayType):
                return F.lit(None)
            dtype = dtype.elementType
    return get_path(path)


def set_path(df: DataFrame, path: str, value: Column | object) -> DataFrame:
    """Set a (possibly deep) path, auto-creating intermediate structs
    (flowdata_tests.erl:175-184). Root paths take the fast path
    (esp_set.erl:60-67 root-path optimization = plain withColumn)."""
    v = value if isinstance(value, Column) else F.lit(value)
    segs = parse_path(path)
    if any(idxs for _, idxs in segs):
        raise NotImplementedError(
            "array-index writes: rebuild the array with F.transform/F.concat "
            "at the call site (struct-path writes are supported)")
    names = [n for n, _ in segs]
    if len(names) == 1:
        return df.withColumn(names[0], v)
    from pyspark.sql.types import StructType

    root = names[0]
    root_is_struct = root in df.columns and isinstance(
        df.schema[root].dataType, StructType)
    if root not in df.columns or not root_is_struct:
        # auto-create the whole intermediate chain as nested structs;
        # a non-map root value is REPLACED by the map, like flowdata's
        # set on a scalar (a deep set always yields nested maps)
        nested = v
        for n in reversed(names[1:]):
            nested = F.struct(nested.alias(n))
        return df.withColumn(root, nested)

    def _set_field(parent_type, parent_col, rest):
        # descend existing struct levels; the first missing (or
        # non-struct — flowdata replaces scalars with maps) level
        # switches to fresh nested-struct creation for the remainder
        name = rest[0]
        if len(rest) == 1:
            return parent_col.withField(name, v)
        if name in parent_type.fieldNames() and isinstance(
                parent_type[name].dataType, StructType):
            child = _set_field(parent_type[name].dataType,
                               parent_col.getField(name), rest[1:])
            return parent_col.withField(name, child)
        nested = v
        for n in reversed(rest[1:]):
            nested = F.struct(nested.alias(n))
        return parent_col.withField(name, nested)

    return df.withColumn(root, _set_field(df.schema[root].dataType,
                                          F.col(root), names[1:]))


def delete_path(df: DataFrame, path: str) -> DataFrame:
    """Drop a path (flowdata_tests.erl:74-101); missing paths no-op
    (delete_field_undefined_test — Spark's drop/dropFields tolerate
    absent names the same way)."""
    segs = parse_path(path)
    if any(idxs for _, idxs in segs):
        # r11 review: 'a.b[2]' used to silently drop ALL of a.b —
        # deleting MORE than asked. Refuse like set_path does.
        raise NotImplementedError(
            "array-index deletes: rebuild the array with F.filter/"
            "F.transform at the call site (struct-path deletes are "
            "supported)")
    names = [n for n, _ in segs]
    if len(names) == 1:
        return df.drop(names[0])
    return df.withColumn(names[0], F.col(names[0]).dropFields(".".join(names[1:])))


def rename_path(df: DataFrame, src: str, dst: str) -> DataFrame:
    """Move a value between paths, value untouched (esp_rename.erl:27;
    deep->deep allowed)."""
    value = get_path(src)
    out = set_path(df, dst, value)
    return delete_path(out, src)


# ---------------------------------------------------------------------------
# JSON time-format round-trip (flowdata:to_json / from_json_struct,
# flowdata_tests.erl:292,425-502)
# ---------------------------------------------------------------------------

TF_TS_MILLI = "millisecond"     # default: epoch-ms integer (to_json :292)
TF_TS_FLOAT_MICRO = "float_micro"  # "1568029511.598123" seconds string (:457)
TF_ISO8601 = "iso8601"          # "2019-10-05T14:48:01.023Z" (:479)


def ts_from_json_value(col: Column | str, time_format: str = TF_TS_MILLI) -> Column:
    """Parse a JSON timestamp field into TimestampType with the
    reference's three wire formats. float_micro ROUNDS to ms (the grip
    fixture: '…119.037648' -> …119038, flowdata/faxe_time): exact via
    decimal arithmetic, never a double round-trip."""
    c = F.col(col) if isinstance(col, str) else col
    if time_format == TF_TS_MILLI:
        return F.timestamp_millis(c.cast("long"))
    if time_format == TF_TS_FLOAT_MICRO:
        ms = F.round(c.cast("decimal(26,6)") * 1000, 0).cast("long")
        return F.timestamp_millis(ms)
    if time_format == TF_ISO8601:
        return F.to_timestamp(c, "yyyy-MM-dd'T'HH:mm:ss[.SSS][XXX]")
    raise ValueError(f"unknown time_format {time_format!r}")


def ts_to_json_value(ts: Column | str, time_format: str = TF_TS_MILLI) -> Column:
    """Render a TimestampType column in a JSON wire format (inverse of
    ts_from_json_value; flowdata:to_json emits epoch-ms by default)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    if time_format == TF_TS_MILLI:
        return F.unix_millis(c)
    if time_format == TF_TS_FLOAT_MICRO:
        return (F.unix_micros(c).cast("decimal(26,6)")
                / F.lit(1000000)).cast("decimal(20,6)").cast("string")
    if time_format == TF_ISO8601:
        return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
    raise ValueError(f"unknown time_format {time_format!r}")


def row_to_json(df: DataFrame, *, ts_col: str = "ts",
                time_format: str = TF_TS_MILLI,
                fields: list[str] | None = None) -> DataFrame:
    """flowdata:to_json analog: one JSON document per row — `ts` rendered
    per `time_format`, every other column under its own name (nested
    structs/maps serialize naturally through to_json)."""
    names = fields or [c for c in df.columns if c != ts_col]
    doc = F.struct(ts_to_json_value(F.col(ts_col), time_format).alias("ts"),
                   *[F.col(c) for c in names])
    return df.withColumn("json", F.to_json(doc))
