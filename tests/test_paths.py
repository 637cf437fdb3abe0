"""flowdata path semantics (SURVEY §1.2; mirrors flowdata_tests.erl
scenarios: deep get/set/delete/rename, auto-created intermediates,
1-based array indexes)."""

import pyspark.sql.functions as F
import pytest

from faxe_spark import paths


@pytest.fixture(scope="module")
def nested_df(spark):
    schema = ("ts long, data struct<code: long, meta: struct<unit: string, ok: boolean>>, "
              "vals array<double>")
    data = [(1, (7, ("C", True)), [10.0, 20.0, 30.0])]
    return spark.createDataFrame(data, schema)


def test_deep_get(nested_df):
    row = nested_df.select(
        paths.get_path("data.code").alias("c"),
        paths.get_path("data.meta.unit").alias("u"),
        paths.get_path("vals[2]").alias("v2"),  # 1-based -> 20.0
    ).collect()[0]
    assert (row.c, row.u, row.v2) == (7, "C", 20.0)


def test_missing_path_is_null(nested_df):
    # schema-aware resolution: absent paths read as NULL (undefined)
    row = nested_df.select(
        paths.get_path_safe(nested_df, "data.meta.missing").alias("m"),
        paths.get_path_safe(nested_df, "nosuch.deep.path").alias("n"),
        paths.get_path_safe(nested_df, "data.code").alias("ok"),
    ).collect()[0]
    assert (row.m, row.n, row.ok) == (None, None, 7)


def test_set_deep_existing(nested_df):
    out = paths.set_path(nested_df, "data.meta.unit", "F")
    assert out.select(paths.get_path("data.meta.unit")).collect()[0][0] == "F"
    # siblings untouched
    assert out.select(paths.get_path("data.meta.ok")).collect()[0][0] is True


def test_set_autocreates_intermediates(nested_df):
    # flowdata_tests.erl:175-184: set "x.y.z" creates x and x.y
    out = paths.set_path(nested_df, "x.y.z", 42)
    assert out.select(paths.get_path("x.y.z")).collect()[0][0] == 42


def test_set_root_fast_path(nested_df):
    out = paths.set_path(nested_df, "newroot", "v")
    assert out.select("newroot").collect()[0][0] == "v"


def test_delete_deep(nested_df):
    out = paths.delete_path(nested_df, "data.meta.ok")
    fields = out.select("data.meta.*").columns
    assert fields == ["unit"]


def test_rename_deep_to_deep(nested_df):
    out = paths.rename_path(nested_df, "data.meta.unit", "data.unit_moved")
    assert out.select(paths.get_path("data.unit_moved")).collect()[0][0] == "C"
    assert "unit" not in out.select("data.meta.*").columns


def test_one_based_index_enforced():
    with pytest.raises(ValueError, match="1-based"):
        paths.parse_path("a[0].b")


class TestJsonTimeFormats:
    """flowdata:from_json_struct / to_json time handling
    (flowdata_tests.erl:292,425-502) — the reference's own fixtures."""

    def test_float_micro_rounds_to_ms(self, spark):
        from faxe_spark.paths import TF_TS_FLOAT_MICRO, ts_from_json_value
        import pyspark.sql.functions as F

        df = spark.createDataFrame(
            [("1568029511.598123",), ("1574067119.037648",)], "t string")
        got = [r.ms for r in df.select(
            F.unix_millis(ts_from_json_value("t", TF_TS_FLOAT_MICRO)).alias("ms")
        ).collect()]
        # :457 truncto-ms; grip fixture rounds .648us up
        assert got == [1568029511598, 1574067119038]

    def test_iso8601_parse(self, spark):
        from faxe_spark.paths import TF_ISO8601, ts_from_json_value
        import pyspark.sql.functions as F

        df = spark.createDataFrame([("2019-10-05T14:48:01.023Z",)], "t string")
        got = df.select(F.unix_millis(
            ts_from_json_value("t", TF_ISO8601)).alias("ms")).collect()[0].ms
        assert got == 1570286881023  # flowdata_tests.erl:479

    def test_round_trip_all_formats(self, spark):
        from faxe_spark.paths import (TF_ISO8601, TF_TS_FLOAT_MICRO,
                                      TF_TS_MILLI, ts_from_json_value,
                                      ts_to_json_value)
        import pyspark.sql.functions as F

        df = spark.createDataFrame([(1568029511598,)], "ms long") \
            .select(F.timestamp_millis("ms").alias("ts"))
        for fmt in (TF_TS_MILLI, TF_TS_FLOAT_MICRO, TF_ISO8601):
            back = df.select(F.unix_millis(ts_from_json_value(
                ts_to_json_value("ts", fmt), fmt)).alias("ms")).collect()[0].ms
            assert back == 1568029511598, fmt

    def test_row_to_json_default_ms(self, spark):
        import json

        import pyspark.sql.functions as F

        from faxe_spark.paths import row_to_json

        df = spark.createDataFrame([(1568029511598, 323424, "somestringvalue")],
                                   "ms long, value1 long, value2 string") \
            .select(F.timestamp_millis("ms").alias("ts"), "value1", "value2")
        doc = json.loads(row_to_json(df).collect()[0].json)
        # flowdata_tests.erl:292 — ts as epoch ms beside the fields
        assert doc == {"ts": 1568029511598, "value1": 323424,
                       "value2": "somestringvalue"}


def test_get_path_safe_json_string_fallback(spark):
    """A dot-path descending into a STRING column reads it as a JSON
    document (the reference's undecoded-payload case); missing JSON
    members read as null."""
    from faxe_spark.paths import get_path_safe

    df = spark.createDataFrame(
        [('{"code": {"id": 7}, "vals": [1, 2, 3]}',)], "data string")
    got = df.select(
        get_path_safe(df, "data.code.id").cast("long").alias("id"),
        get_path_safe(df, "data.vals[2]").cast("long").alias("v2"),
        get_path_safe(df, "data.nope").alias("missing"),
        get_path_safe(df, "other.path").alias("absent"),
    ).collect()[0]
    assert (got.id, got.v2, got.missing, got.absent) == (7, 2, None, None)


def test_set_creates_missing_intermediate_under_existing_root(nested_df):
    """Deep set where the root struct exists but an intermediate level
    does not (s7_read_test2.dfs aliases like data.Kdr.McNo1 landing in
    an existing data struct): flowdata auto-creates the chain
    (flowdata_tests.erl:175-184)."""
    out = paths.set_path(nested_df, "data.kdr.mc1", 5)
    out = paths.set_path(out, "data.kdr.mc2", 6)       # sibling merge
    row = out.select(
        paths.get_path("data.kdr.mc1").alias("a"),
        paths.get_path("data.kdr.mc2").alias("b"),
        paths.get_path("data.code").alias("c")).collect()[0]
    assert (row.a, row.b, row.c) == (5, 6, 7)


def test_set_deep_replaces_scalar_intermediate(nested_df):
    # a deep set through a scalar replaces it with a map (flowdata set)
    out = paths.set_path(nested_df, "data.code.sub", 1)
    assert out.select(
        paths.get_path("data.code.sub")).collect()[0][0] == 1


def test_get_path_safe_index_on_json_string(spark):
    """r11 review: 'data[2].x' where `data` is a JSON STRING is an
    array extract of its document ($[1].x) — this shape used to fall
    through the ArrayType check and silently read NULL while the
    sibling 'data.x' shape JSON-extracted."""
    from faxe_spark.paths import get_path_safe

    df = spark.createDataFrame(
        [('[{"x": 1}, {"x": 2}]', '{"rows": [5, 6]}')],
        "data string, doc string")
    got = df.select(
        get_path_safe(df, "data[2].x").cast("long").alias("a"),
        get_path_safe(df, "data[1].x").cast("long").alias("b"),
        get_path_safe(df, "doc.rows[2]").cast("long").alias("c"),
        get_path_safe(df, "data[9].x").alias("missing"),
    ).collect()[0]
    assert (got.a, got.b, got.c, got.missing) == (2, 1, 6, None)


def test_delete_path_array_index_refuses(nested_df):
    """r11 review: 'vals[2]' used to silently drop ALL of `vals` —
    deleting more than asked; now it refuses like set_path."""
    with pytest.raises(NotImplementedError, match="array-index"):
        paths.delete_path(nested_df, "vals[2]")
    with pytest.raises(NotImplementedError, match="array-index"):
        paths.delete_path(nested_df, "data.meta[1]")
