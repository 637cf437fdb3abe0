"""The lambda expression library (SURVEY.md §2.11).

faxe lambdas (`lambda: str_concat("field", 'x')`) evaluate over the
point's fields with the faxe_lambda_lib + mathex function set (whitelist
faxe_dfs.erl:19; evidenced functions faxe_lambdalib_tests.erl:19-31).
Here each name maps to a Spark Column function — JVM-side, codegen'd —
plus Erlang-truthiness and undefined-as-null helpers. Double-quoted DFS
field references become F.col paths; single-quoted literals become lits.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.lit(x)


def truthy(x) -> Column:
    """Erlang/dfs_std_lib:bool truthiness: false/undefined/null/0/'' are
    falsy, everything else truthy (used by where, esp_where.erl:39-40).

    Numeric zero is tested NUMERICALLY (try_cast to double != 0), not by
    string rendering — a DOUBLE 0.0 renders as '0.0' and would otherwise
    slip through the isin('0') check; non-numeric strings fall back to
    the string rules."""
    c = _c(x)
    num = c.try_cast("double")
    return F.when(c.isNull(), F.lit(False)).otherwise(
        F.when(num.isNotNull(), num != 0.0).otherwise(
            ~c.cast("string").isin("false", "")))


def undefined() -> Column:
    """faxe `undefined` == SQL NULL."""
    return F.lit(None)


def _if(cond, then, else_):
    return F.when(truthy(cond), _c(then)).otherwise(_c(else_))


def _time_align(ts, unit_ms):
    """faxe_time align: snap epoch-ms timestamp down to a unit boundary."""
    ms = F.unix_millis(_c(ts)) if not isinstance(unit_ms, Column) else None
    return F.timestamp_millis((F.unix_millis(_c(ts)) / _c(unit_ms)).cast("long") * _c(unit_ms))


# reference-name -> Column function. Everything resolves to built-in
# Spark expressions (no UDFs): the whole lambda surface stays in codegen.
def _map_arg(m):
    """A JSON-object STRING literal used where a map is expected (the
    dfs corpus pattern `def letter_map = '{"a": 1, ...}'` +
    map_get(key, letter_map)) becomes a map literal."""
    if isinstance(m, str) and m.lstrip().startswith("{"):
        import json as _json

        d = _json.loads(m)
        vals = list(d.values())

        def _num(v):
            return isinstance(v, (int, float)) and not isinstance(v, bool)

        # a genuinely mixed-type map lives in the string domain (erlang
        # terms don't care; create_map needs ONE value type — left to
        # Spark's implicit coercion, lit(1)+lit("x") picks BIGINT and
        # fails at runtime on the non-numeric value)
        homogeneous = vals and (all(_num(v) for v in vals)
                                or all(isinstance(v, str) for v in vals))
        pairs = []
        for k, v in d.items():
            pairs += [F.lit(str(k)), F.lit(v) if homogeneous else F.lit(str(v))]
        return F.create_map(*pairs)
    return _c(m)


def _map_get(k, m, default=None):
    """faxe map_get: key-first order, optional default for missing keys
    (faxe_lambdalib_tests.erl:28-31). A JSON-string literal map is
    dynamically typed in the reference; Spark's coalesce needs ONE type,
    so when the JSON values are homogeneous (all numeric, or all
    strings) and the default fits that domain, the lookup keeps the
    map's value type — map_get('a', '{"a": 1}', 0) returns 1 (int),
    same as the no-default call, never '1'. Only genuinely mixed-type
    maps (erlang terms don't care) coerce both sides to string."""
    mm = _map_arg(m)
    if default is None:
        return F.element_at(mm, k)
    if isinstance(m, str) and not isinstance(default, Column):
        import json as _json

        vals = list(_json.loads(m).values())

        def _num(v):
            return isinstance(v, (int, float)) and not isinstance(v, bool)

        if vals and all(_num(v) for v in vals) and _num(default):
            return F.coalesce(F.element_at(mm, k), F.lit(default))
        if vals and all(isinstance(v, str) for v in vals) \
                and isinstance(default, str):
            return F.coalesce(F.element_at(mm, k), F.lit(default))
        return F.coalesce(F.element_at(mm, k).cast("string"),
                          F.lit(str(default)))
    return F.coalesce(F.element_at(mm, k), _c(default))


LAMBDA_FUNCTIONS = {
    # conversions (faxe_lambdalib_tests.erl:19-31)
    "string": lambda x: _c(x).cast("string"),
    "int": lambda x: _c(x).cast("long"),
    "float": lambda x: _c(x).cast("double"),
    "bool": truthy,
    # math
    "abs": lambda x: F.abs(_c(x)),
    "round": lambda x: F.round(_c(x), 0).cast("long"),
    "round_float": lambda x, n=2: F.round(_c(x), n),
    "floor": lambda x: F.floor(_c(x)),
    "ceiling": lambda x: F.ceil(_c(x)),
    "log": lambda x: F.log(_c(x)),
    "log10": lambda x: F.log10(_c(x)),
    "sqrt": lambda x: F.sqrt(_c(x)),
    "pow": lambda x, y: F.pow(_c(x), _c(y)),
    "max": lambda *xs: F.greatest(*[_c(x) for x in xs]),
    "min": lambda *xs: F.least(*[_c(x) for x in xs]),
    "random": lambda n: (F.rand() * _c(n)).cast("long"),
    "random_real": lambda n: F.rand() * _c(n),
    "random_latin_string": lambda n=10: F.substring(
        F.md5((F.rand() * 1e18).cast("long").cast("string")), 1, n),
    # strings
    # accepts both varargs and a single list literal (dfs corpus uses
    # str_concat(['a', "field", ...]))
    "str_concat": lambda *xs: F.concat(*[
        _c(x) for x in (xs[0] if len(xs) == 1 and isinstance(xs[0], list) else xs)]),
    "str_replace": lambda s, a, b: F.replace(_c(s), _c(a), _c(b)),
    "str_slice": lambda s, start, length=None: (
        F.substring(_c(s), start + 1, length) if length is not None
        else F.substring(_c(s), start + 1, 2**31 - 1)),
    "str_downcase": lambda s: F.lower(_c(s)),
    "str_upcase": lambda s: F.upper(_c(s)),
    "str_trim": lambda s: F.trim(_c(s)),
    "str_ends_with": lambda s, suf: _c(s).endswith(_c(suf)),
    "str_starts_with": lambda s, pre: _c(s).startswith(_c(pre)),
    "str_contains": lambda s, sub: _c(s).contains(_c(sub)),
    "str_length": lambda s: F.length(_c(s)),
    "str_split": lambda s, sep: F.split(_c(s), sep),
    # maps / lists (1-based element_at matches faxe's 1-based paths).
    # map_get takes the KEY first (faxe_lambdalib_tests.erl:28-31), with
    # an optional default for missing keys (:30 returns <<"undefined">>)
    "map_get": lambda k, m, default=None: _map_get(k, m, default),
    "list_get": lambda l, i: F.element_at(_c(l), i),
    "size": lambda x: F.size(_c(x)),
    # membership in the string domain: tolerant of empty/NULL mem lists
    # and undefined probes (faxe compares erlang terms; numbers and
    # strings normalize identically on both sides here)
    "member": lambda x, l: F.coalesce(
        F.array_contains(_c(l).cast("array<string>"), _c(x).cast("string")),
        F.lit(False)),
    "not_member": lambda x, l: ~F.coalesce(
        F.array_contains(_c(l).cast("array<string>"), _c(x).cast("string")),
        F.lit(False)),
    # control / null handling
    "if": _if,
    "coalesce": lambda *xs: F.coalesce(*[_c(x) for x in xs]),
    "is_undefined": lambda x: _c(x).isNull(),
    "undefined": lambda x: _c(x).isNull(),  # undefined(field) predicate form
    "defined": lambda x: _c(x).isNotNull(),
    # environment (evaluated driver-side at plan build, like the DFS
    # macro expansion; dfs/test/env.dfs)
    "env": lambda name, default=None: F.lit(
        __import__("os").environ.get(_as_py(name), _as_py(default))),
    # time (faxe_time semantics, SURVEY §2.12)
    "now": F.current_timestamp,
    "time_align": _time_align,
    "to_iso8601": lambda ts: F.date_format(
        _c(ts), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"),
    "to_date_string": lambda ts: F.date_format(_c(ts), "yyyy-MM-dd HH:mm:ss"),
    "dt_parse": lambda s, fmt="yyyy-MM-dd HH:mm:ss": F.to_timestamp(_c(s), fmt),
    "year": lambda ts: F.year(_c(ts)),
    "month": lambda ts: F.month(_c(ts)),
    "day_of_week": lambda ts: F.dayofweek(_c(ts)),
    "hour": lambda ts: F.hour(_c(ts)),
    "minute": lambda ts: F.minute(_c(ts)),
    "second": lambda ts: F.second(_c(ts)),
    # trig / extra math (mathex surface)
    "sin": lambda x: F.sin(_c(x)),
    "cos": lambda x: F.cos(_c(x)),
    "tan": lambda x: F.tan(_c(x)),
    "exp": lambda x: F.exp(_c(x)),
    "nth_root": lambda x, n: F.pow(_c(x), 1.0 / n),
    # JSON select (faxe_lambda_lib:get_jsn, esp_jsn_select.erl): extract
    # a dot-path from a JSON string column; returns string (cast after)
    "get_jsn": lambda path, s: F.get_json_object(
        _c(s), "$." + _as_py(path).replace("[", "[").lstrip("$.")),
    "from_iso8601": lambda s: F.to_timestamp(
        _c(s), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"),
    # mem reads: flow-wide key/value memory (esp_mem.erl:31). Values are
    # registered driver-side (set_mem below) and resolve to literals /
    # array literals — the broadcast-variable analog.
    "mem": lambda k: _mem_read(k),
    "ls_mem": lambda k: _mem_read(k),
    "ls_mem_list": lambda k: _mem_read(k),
    "s_mem": lambda k: _mem_read(k),
}


# ---------------------------------------------------------------------------
# Long-tail of the public lambda library (VERDICT r2 missing #3).
#
# The reference's docs expose ~100 functions across string / math / time /
# list / conversion groups (faxe_lambda_lib + mathex, both in the external
# faxe_common dep — semantics mirrored from the public faxe documentation
# and the Elixir-String-style `estr` conventions its str_* family follows).
# Everything below is a thin mapping onto built-in Column functions — pure
# JVM expressions, no UDFs, so lambdas stay inside whole-stage codegen.
# ---------------------------------------------------------------------------

def _str_capitalize(s):
    c = _c(s)
    return F.concat(F.upper(F.substring(c, 1, 1)), F.lower(F.substring(c, 2, 2**31 - 2)))


def _str_replace_prefix(s, pre, repl):
    c, p = _c(s), _c(pre)
    return F.when(c.startswith(p),
                  F.concat(_c(repl), F.substring(c, F.length(p) + 1, 2**31 - 2))) \
            .otherwise(c)


def _str_replace_suffix(s, suf, repl):
    c, x = _c(s), _c(suf)
    return F.when(c.endswith(x),
                  F.concat(F.substring(c, 1, F.length(c) - F.length(x)), _c(repl))) \
            .otherwise(c)


def _str_split_at(s, i):
    c = _c(s)
    return F.array(F.substring(c, 1, i), F.substring(c, i + 1, 2**31 - 2))


# -- array ("list") statistics: the mathex surface applied to list values.
# All pure JVM higher-order functions (aggregate/transform) — conventions
# match the batch aggregate layer (Spark: population skewness, EXCESS
# kurtosis) so the engine's two stat layers agree.

def _arr_d(l):
    return F.transform(_c(l), lambda x: x.cast("double"))


def _arr_sum(l):
    return F.aggregate(_arr_d(l), F.lit(0.0), lambda a, x: a + x)


def _arr_avg(l):
    return _arr_sum(l) / F.size(_c(l))


def _arr_moment(l, k):
    """Central moment sum: sum((x - mean)^k)."""
    m = _arr_avg(l)
    return F.aggregate(_arr_d(l), F.lit(0.0), lambda a, x: a + F.pow(x - m, k))


def _arr_var_sample(l):
    n = F.size(_c(l))
    return _arr_moment(l, 2) / (n - 1)


def _arr_var_pop(l):
    return _arr_moment(l, 2) / F.size(_c(l))


def _arr_skew(l):
    n = F.size(_c(l)).cast("double")
    m2 = _arr_moment(l, 2) / n
    m3 = _arr_moment(l, 3) / n
    return m3 / F.pow(m2, 1.5)


def _arr_kurtosis(l):
    n = F.size(_c(l)).cast("double")
    m2 = _arr_moment(l, 2) / n
    m4 = _arr_moment(l, 4) / n
    return m4 / (m2 * m2) - 3.0


def _arr_percentile(l, p):
    """Exact linear-interpolated percentile over a list value — the same
    interpolation as esp_percentile.erl:62-71 (and operators.percentile).
    Empty/NULL input reads as undefined (NULL) per the engine's
    NULL-tolerant lambda conventions — without the guard the rank math
    hits element_at(arr, 0), an invalid-array-index runtime error."""
    arr = F.array_sort(_arr_d(l))
    n = F.size(arr)
    rank = (n - 1) * (F.lit(p).cast("double") / 100.0)
    lo = F.floor(rank).cast("int")
    frac = rank - lo
    lo_v = F.element_at(arr, lo + 1)
    hi_v = F.element_at(arr, F.least(lo + 2, n))
    return F.when(n.isNull() | (n == 0), F.lit(None).cast("double")) \
        .otherwise(lo_v + frac * (hi_v - lo_v))


def _empty(x):
    """faxe_lambda_lib:empty (esp_amqp_publish.erl:167): undefined, '',
    or an empty container is empty. Containers stringify to '[]'/'{}'."""
    c = _c(x)
    return c.isNull() | c.cast("string").isin("", "[]", "{}")


LAMBDA_FUNCTIONS.update({
    # -- strings (estr / Elixir String conventions; 0-based indexes like
    #    the reference's str_at / str_slice)
    "str_at": lambda s, i: F.substring(_c(s), i + 1, 1),
    "str_capitalize": _str_capitalize,
    "str_duplicate": lambda s, n: F.repeat(_c(s), n),
    "str_find": lambda s, sub: F.instr(_c(s), _as_py(sub)),  # 1-based; 0 = absent
    "str_first": lambda s: F.substring(_c(s), 1, 1),
    "str_last": lambda s: F.substring(_c(s), -1, 1),
    "str_pad_leading": lambda s, n, pad=" ": F.lpad(_c(s), n, _as_py(pad)),
    "str_pad_trailing": lambda s, n, pad=" ": F.rpad(_c(s), n, _as_py(pad)),
    "str_replace_prefix": _str_replace_prefix,
    "str_replace_suffix": _str_replace_suffix,
    "str_replace_leading": _str_replace_prefix,
    "str_replace_trailing": _str_replace_suffix,
    "str_reverse": lambda s: F.reverse(_c(s)),
    "str_split_at": _str_split_at,
    "str_trim_leading": lambda s: F.ltrim(_c(s)),
    "str_trim_trailing": lambda s: F.rtrim(_c(s)),
    "str_quote": lambda s: F.concat(F.lit('"'), _c(s), F.lit('"')),
    "str_enclose": lambda s, w: F.concat(_c(w), _c(s), _c(w)),
    "str_match": lambda s, pattern: _c(s).rlike(_as_py(pattern)),
    "str_codepoints": lambda s: F.split(_c(s), ""),
    # -- math long tail
    "acos": lambda x: F.acos(_c(x)),
    "asin": lambda x: F.asin(_c(x)),
    "atan": lambda x: F.atan(_c(x)),
    "atan2": lambda y, x: F.atan2(_c(y), _c(x)),
    "sinh": lambda x: F.sinh(_c(x)),
    "cosh": lambda x: F.cosh(_c(x)),
    "tanh": lambda x: F.tanh(_c(x)),
    "log2": lambda x: F.log2(_c(x)),
    "mod": lambda x, y: F.pmod(_c(x), _c(y)),  # Erlang mod: sign of divisor
    "rem": lambda x, y: _c(x) % _c(y),         # Erlang rem: sign of dividend
    "sign": lambda x: F.signum(_c(x)),
    "truncate": lambda x: _c(x).cast("long"),
    # -- mathex over list values (population skew / excess kurtosis,
    #    matching Spark's F.skewness / F.kurtosis in the aggregate layer)
    "average": _arr_avg,
    "sum_list": _arr_sum,
    "variance": _arr_var_sample,
    "stdev_sample": lambda l: F.sqrt(_arr_var_sample(l)),
    "stdev_population": lambda l: F.sqrt(_arr_var_pop(l)),
    "skew": _arr_skew,
    "kurtosis": _arr_kurtosis,
    "percentile": _arr_percentile,
    "zscore": lambda x, l: (_c(x) - _arr_avg(l)) / F.sqrt(_arr_var_pop(l)),
    # -- lists
    "head": lambda l: F.element_at(_c(l), 1),
    "tail": lambda l: F.slice(_c(l), 2, 2**31 - 2),
    "last": lambda l: F.element_at(_c(l), -1),
    "list_join": lambda l, sep=",": F.array_join(_c(l), _as_py(sep)),
    "list_sort": lambda l: F.array_sort(_c(l)),
    "list_reverse": lambda l: F.reverse(_c(l)),
    "list_distinct": lambda l: F.array_distinct(_c(l)),
    "list_min": lambda l: F.array_min(_c(l)),
    "list_max": lambda l: F.array_max(_c(l)),
    "list_concat": lambda *ls: F.concat(*[_c(x) for x in ls]),
    "list_flatten": lambda l: F.flatten(_c(l)),
    "list_contains": lambda l, x: F.array_contains(_c(l), _c(x)),
    "range": lambda a, b, step=1: F.sequence(_c(a), _c(b), F.lit(step)),
    # -- maps
    "map_size": lambda m: F.size(_c(m)),
    "map_keys": lambda m: F.map_keys(_c(m)),
    "map_values": lambda m: F.map_values(_c(m)),
    "map_has": lambda k, m: F.map_contains_key(_c(m), _as_py(k)),
    "map_merge": lambda a, b: F.map_concat(_c(a), _c(b)),
    # -- time long tail
    "to_rfc3339": lambda ts: F.date_format(_c(ts), "yyyy-MM-dd'T'HH:mm:ssXXX"),
    "to_date": lambda ts: F.to_date(_c(ts)),
    "dt_format": lambda ts, fmt: F.date_format(_c(ts), _as_py(fmt)),
    "day_of_month": lambda ts: F.dayofmonth(_c(ts)),
    "day_of_year": lambda ts: F.dayofyear(_c(ts)),
    "week_of_year": lambda ts: F.weekofyear(_c(ts)),
    "unix_ts": lambda ts: F.unix_seconds(_c(ts)),
    "unix_ms": lambda ts: F.unix_millis(_c(ts)),
    "from_unix_ms": lambda ms: F.timestamp_millis(_c(ms).cast("long")),
    # -- conversion / misc
    "to_json": lambda x: F.to_json(_c(x)),
    "str_to_int": lambda s: _c(s).cast("long"),
    "str_to_float": lambda s: _c(s).cast("double"),
    "uuid": lambda: F.uuid(),
    "empty": _empty,
    "not_empty": lambda x: ~_empty(x),
})


def _ms(x):
    """Epoch-ms Column from a DFS ms-domain value."""
    return _c(x).cast("long")


def _ms_ts(x):
    return F.timestamp_millis(_ms(x))


# In the DFS front-end, "ts"-domain values are EPOCH-MS INTEGERS
# (faxe_time; the corpus does `"ts" - 60000`, `to_iso8601("ts")`,
# `string("ts")`). DFSCompiler resolves TimestampType fieldrefs to
# unix_millis and overlays these ms-consuming/producing variants over
# the Column-timestamp versions above.
DFS_TIME_MS_OVERRIDES = {
    "now": lambda: F.unix_millis(F.current_timestamp()),
    "time_align": lambda ts, unit: _ms(ts) - (_ms(ts) % _c(unit)),
    "to_iso8601": lambda x: F.date_format(_ms_ts(x), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"),
    "to_rfc3339": lambda x: F.date_format(_ms_ts(x), "yyyy-MM-dd'T'HH:mm:ssXXX"),
    "to_date_string": lambda x: F.date_format(_ms_ts(x), "yyyy-MM-dd HH:mm:ss"),
    "to_date": lambda x: F.to_date(_ms_ts(x)),
    "dt_format": lambda x, fmt: F.date_format(_ms_ts(x), _as_py(fmt)),
    "from_iso8601": lambda s: F.unix_millis(
        F.to_timestamp(_c(s), "yyyy-MM-dd'T'HH:mm:ss[.SSS][XXX]")),
    "dt_parse": lambda s, fmt="yyyy-MM-dd HH:mm:ss":
        F.unix_millis(F.to_timestamp(_c(s), fmt)),
    "year": lambda x: F.year(_ms_ts(x)),
    "month": lambda x: F.month(_ms_ts(x)),
    "day_of_week": lambda x: F.dayofweek(_ms_ts(x)),
    "day_of_month": lambda x: F.dayofmonth(_ms_ts(x)),
    "day_of_year": lambda x: F.dayofyear(_ms_ts(x)),
    "week_of_year": lambda x: F.weekofyear(_ms_ts(x)),
    "hour": lambda x: F.hour(_ms_ts(x)),
    "minute": lambda x: F.minute(_ms_ts(x)),
    "second": lambda x: F.second(_ms_ts(x)),
    "unix_ts": lambda x: (_ms(x) / 1000).cast("long"),
    "unix_ms": _ms,
    "from_unix_ms": _ms,
}


def _as_py(x):
    """Literal-only argument (name of an env var etc.)."""
    if isinstance(x, Column):
        raise ValueError("this lambda function needs a literal argument")
    return x


# -- flow-wide `mem` (esp_mem.erl:31): driver-registered constants -------
_MEM: dict[str, object] = {}


def set_mem(key: str, value) -> None:
    """Register a flow-wide memory value readable from any lambda via
    mem()/ls_mem()/s_mem() — the broadcast-variable analog of esp_mem.
    Lists become array literals (ls_mem semantics)."""
    _MEM[key] = value


def clear_mem() -> None:
    _MEM.clear()


def _mem_read(k) -> Column:
    key = _as_py(k)
    v = _MEM.get(key)
    if isinstance(v, (list, tuple)):
        return F.array(*[F.lit(e) for e in v])
    return F.lit(v)


def mem_write(df, field: str, *, key: str | None = None,
              type: str = "single", ts_col: str = "ts"):
    """esp_mem.erl:84-100 write path — values GATHERED FROM THE FLOW:
    'single' keeps the last value (by event time), 'list' preserves
    arrival order, 'set' dedups. The batch analog of the per-point ETS
    write is the aggregate of the flow at this node: a tiny driver-side
    collect (one scalar / one small array — mem values are lambda-sized
    by contract), registered via set_mem and readable from any
    subsequent lambda via mem()/ls_mem()/s_mem(). Returns df unchanged
    (the reference node passes items through)."""
    from faxe_spark.paths import get_path_safe

    key = key or field
    col = get_path_safe(df, field).alias("_v")  # dot-path tolerant
    if type == "single":
        row = df.orderBy(F.col(ts_col).desc()).select(col).first()
        set_mem(key, None if row is None else row[0])
    elif type == "list":
        rows = df.orderBy(F.col(ts_col)).select(col).collect()
        set_mem(key, [r[0] for r in rows])
    elif type == "set":
        rows = df.select(col).distinct().collect()
        set_mem(key, sorted((r[0] for r in rows),
                            key=lambda v: (v is None, str(v))))
    else:
        raise ValueError(f"mem type must be single/list/set, got {type!r}")
    return df


def mem_updater(field: str, *, key: str | None = None, type: str = "single",
                ts_col: str = "ts"):
    """Streaming write path: a foreachBatch callable that refreshes the
    flow-wide memory from each micro-batch (the continuous analog of
    the per-point ETS write). Usage:
    `df.writeStream.foreachBatch(mem_updater("temp", key="last_temp"))`."""
    k = key or field

    def update(batch_df, _batch_id):
        if type == "list":  # append semantics across batches
            rows = batch_df.orderBy(F.col(ts_col)).select(field).collect()
            cur = _MEM.get(k) or []
            set_mem(k, list(cur) + [r[0] for r in rows])
        elif type == "set":
            rows = batch_df.select(field).distinct().collect()
            cur = set(_MEM.get(k) or [])
            set_mem(k, sorted(cur | {r[0] for r in rows}))
        else:
            row = batch_df.orderBy(F.col(ts_col).desc()).select(field).first()
            if row is not None:
                set_mem(k, row[0])

    return update
