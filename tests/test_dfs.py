"""DFS front-end tests: parsing the reference's own script corpus and
compiling the supported subset end-to-end."""

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMOKE
from faxe_spark.dfs import DFSCompiler, compile_lambda, parse_script


def test_parse_reference_group_by_script():
    """The reference's dfs/test/group_by.dfs parses into the expected
    chain/node structure (the dfs_to_graph.erl golden-test analog)."""
    text = open("/root/reference/dfs/test/group_by.dfs").read()
    chains = parse_script(text)
    by_var = {c.var: c for c in chains if c.var}
    assert by_var["data"].nodes[0].name == "json_emitter"
    assert [n.name for n in by_var["group_by"].nodes] == ["group_by"]
    assert by_var["group_by"].source_ref == "data"
    window = by_var["window"]
    assert [n.name for n in window.nodes] == ["eval", "value_diff", "win_clock"]
    assert window.nodes[1].params["mode"] == ["p-c"]
    # final unnamed chain: join -> group_union -> debug
    tail = [c for c in chains if c.var is None][-1]
    assert [n.name for n in tail.nodes][-1] == "debug"


def test_parse_all_reference_scripts():
    """Every script in the reference corpus tokenizes + parses."""
    import glob

    ok, fail = 0, []
    for path in glob.glob("/root/reference/dfs/**/*.dfs", recursive=True):
        try:
            # parse-only: unbound {{vars}} become a placeholder literal
            parse_script(open(path).read(), on_missing="1")
            ok += 1
        except Exception as e:  # noqa: BLE001
            fail.append((path, str(e)[:80]))
    assert not fail, f"parsed {ok}, failures: {fail[:8]}"
    assert ok >= 100  # the reference ships 114 scripts


def test_lambda_compile(spark):
    df = spark.createDataFrame([(5.0, "abc")], "value double, name string")
    out = df.select(
        compile_lambda('"value" * 2 + 1').alias("a"),
        compile_lambda("str_concat('x', \"name\")").alias("b"),
        compile_lambda('"value" > 4 AND "value" < 6').alias("c"),
        compile_lambda("if(\"value\" > 100, 'big', 'small')").alias("d"),
        compile_lambda("max(str_length(\"name\"), 2)").alias("e"),
    ).collect()[0]
    assert (out.a, out.b, out.c, out.d, out.e) == (11.0, "xabc", True, "small", 3)


def test_compile_json_emitter_pipeline(spark):
    script = """
    def data =
     |json_emitter()
     .every(100ms)
     .json(
         <<<{"code": 224, "val": 1.5, "mode": 1}>>>,
         <<<{"code": 334, "val": 2.5, "mode": 1}>>>,
         <<<{"code": 114, "val": 9.0, "mode": 2}>>>
     )

    data
    |where(lambda: "val" > 2)
    |eval(lambda: "val" * 10).as('val10')
    |keep('code', 'val10')
    """
    out = DFSCompiler(spark).run(script)
    rows = {r.code: r.val10 for r in out.collect()}
    assert rows == {334: 25.0, 114: 90.0}


def test_compile_window_aggregate_on_testdata(spark):
    script = """
    def ev = |parquet('events')

    ev
    |where(lambda: "value" > 5)
    |group_by('event_type')
    |win_time()
    .period(1h)
    |aggregate()
    .fields('value', 'value')
    .functions('sum', 'count')
    .as('sum_v', 'n')
    """
    out = DFSCompiler(spark, tables_dir=SF_SMOKE).run(script)
    assert set(out.columns) == {"window", "event_type", "sum_v", "n", "ts"}
    # golden check against the direct operator pipeline
    from faxe_spark.tables import load_table
    ev = load_table(spark, SF_SMOKE, "events").filter(F.col("value") > 5)
    want = ev.groupBy(F.window("ts", "1 hour"), "event_type").count().count()
    assert out.count() == want


def test_unsupported_node_is_explicit(spark):
    with pytest.raises(NotImplementedError, match="mqtt_subscribe"):
        DFSCompiler(spark).run("|mqtt_subscribe()")


def test_const_def_and_case_node(spark):
    """`def name = literal` constants resolve inside lambdas (the corpus
    macro1.dfs pattern), and `case` maps to chained F.when."""
    script = """
    def threshold = 5

    def ev = |parquet('events')

    ev
    |case(
        lambda: "value" > threshold * 10,
        lambda: "value" > threshold
    )
    .values('high', 'mid')
    .as('bucket')
    .default('low')
    |keep('event_id', 'bucket')
    """
    out = DFSCompiler(spark, tables_dir=SF_SMOKE).run(script)
    got = {r.bucket for r in out.limit(500).collect()}
    assert got <= {"high", "mid", "low"} and len(got) > 1


def test_stat_alias_and_count_window(spark):
    """Single-field stat nodes (avg/sum/...) consume the pending window;
    win_event maps to rolling row frames."""
    script = """
    def ev = |parquet('events')

    ev
    |group_by('user_id')
    |win_event()
    .period(5)
    .every(5)
    |aggregate()
    .fields('value')
    .functions('avg')
    .as('v_avg')
    """
    out = DFSCompiler(spark, tables_dir=SF_SMOKE).run(script)
    assert "v_avg" in out.columns
    assert out.count() > 0

    script2 = """
    def ev = |parquet('events')

    ev
    |group_by('event_type')
    |win_time()
    .period(6h)
    |avg('value').as('value_avg')
    """
    out2 = DFSCompiler(spark, tables_dir=SF_SMOKE).run(script2)
    # windowed aggregate points carry ts = window start
    assert set(out2.columns) == {"window", "event_type", "value_avg", "ts"}
    assert out2.count() > 0


def test_lambda_lib_extended(spark):
    """map_get key-first order + default (faxe_lambdalib_tests.erl:28-31),
    member, mem reads, round_float, iso8601."""
    from faxe_spark.functions.lambda_lib import LAMBDA_FUNCTIONS as L, set_mem, clear_mem

    set_mem("codes", [224, 334])
    set_mem("limit", 5.0)
    try:
        df = spark.createDataFrame(
            [({"k2": "yes"}, 224, 125.455679)], "m map<string,string>, code int, x double")
        out = df.select(
            L["map_get"]("k2", F.col("m")).alias("a"),
            L["map_get"]("k8", F.col("m"), "undefined").alias("b"),
            L["member"](F.col("code"), L["ls_mem"]("codes")).alias("c"),
            (F.col("x") > L["mem"]("limit")).alias("d"),
            L["round_float"](F.col("x"), 3).alias("e"),
        ).collect()[0]
        assert (out.a, out.b, out.c, out.d, out.e) == ("yes", "undefined", True, True, 125.456)
    finally:
        clear_mem()


def test_lambda_env_and_mem_in_script(spark, monkeypatch):
    """env() reads process environment at compile (dfs/test/env.dfs);
    mem() resolves inside DFS lambdas."""
    from faxe_spark.functions.lambda_lib import set_mem, clear_mem

    monkeypatch.setenv("FAXE_TEST_MODE", "on")
    set_mem("vmin", 2.0)
    try:
        script = """
        def data =
         |json_emitter()
         .json(
             <<<{"val": 1.5}>>>,
             <<<{"val": 9.0}>>>
         )

        data
        |where(lambda: "val" > mem('vmin') AND env('FAXE_TEST_MODE', 'off') == 'on')
        """
        out = DFSCompiler(spark).run(script)
        assert [r.val for r in out.collect()] == [9.0]
    finally:
        clear_mem()


def test_mem_default_does_not_leak_between_scripts(spark):
    """Two scripts declaring the same mem key in ONE process: the second
    compile must see its own default, not the first script's stale value
    (a flow's startup default beats process-global leftovers)."""
    from faxe_spark.functions.lambda_lib import clear_mem

    tpl = """
    |mem()
    .key('thresh')
    .default({d})

    |json_emitter()
    .json(<<<{{"val": 5.0}}>>>)
    |where(lambda: "val" > mem('thresh'))
    """
    try:
        out1 = DFSCompiler(spark).run(tpl.format(d="1.0"))
        assert out1.count() == 1
        out2 = DFSCompiler(spark).run(tpl.format(d="9.0"))
        assert out2.count() == 0, "second script leaked the first default"
    finally:
        clear_mem()


def test_dfs_script_compiles_to_streaming(spark):
    """The SAME DFS text compiles onto Structured Streaming when the
    source chain is an injected readStream DataFrame — the reference's
    deployment model (scripts ARE streaming jobs)."""
    from faxe_spark.streaming import stream_parquet
    from faxe_spark.tables import load_table

    script = """
    stream
    |where(lambda: "value" > 10)
    |group_by('event_type')
    |win_time()
    .period(1h)
    |aggregate()
    .fields('value', 'value')
    .functions('sum', 'count')
    .as('sum_v', 'n')
    """
    s = stream_parquet(spark, f"{SF_SMOKE}/events.parquet").withWatermark("ts", "0 seconds")
    sdf = DFSCompiler(spark, sources={"stream": s}).run(script)
    assert sdf.isStreaming
    q = (sdf.writeStream.format("memory").queryName("dfs_stream_t")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    batch = DFSCompiler(spark, tables_dir=SF_SMOKE,
                        sources={"stream": load_table(spark, SF_SMOKE, "events")}).run(script)
    max_ts = load_table(spark, SF_SMOKE, "events").agg(F.max("ts")).collect()[0][0]
    want = {tuple(r) for r in
            (batch.filter(F.col("window.end") <= F.lit(max_ts))
             .select(F.col("window.start"), "event_type", "sum_v", "n").collect())}
    got = {tuple(r) for r in spark.sql(
        "SELECT window.start, event_type, sum_v, n FROM dfs_stream_t").collect()}
    assert got and got == want


def test_template_var_substitution(spark):
    """{{var}} templates (faxe_dfs.erl:49-57): strict substitution with
    provided vars; missing vars raise with the full list."""
    from faxe_spark.dfs import substitute_template

    script = "data |where(lambda: \"value\" > {{threshold}}) |sample({{ n }})"
    out = substitute_template(script, {"threshold": 5, "n": 3})
    assert "{{" not in out and "> 5" in out and "sample(3)" in out
    with pytest.raises(KeyError, match="threshold.*|.*n"):
        substitute_template(script, {"n": 1})
    # quoted form
    assert substitute_template('x({{"a-b"}})', {"a-b": 9}) == "x(9)"


def test_template_vars_compile_end_to_end(spark):
    from faxe_spark.dfs import DFSCompiler

    script = """
def src = 'unused'
data
|where(lambda: "value" > {{threshold}})
"""
    import pyspark.sql.functions as SF
    d = spark.range(10).select(SF.col("id").alias("value"))
    c = DFSCompiler(spark, sources={"data": d})
    out = c.run(parse_and_sub(script, {"threshold": 6}))
    assert out.count() == 3


def parse_and_sub(script, vars):
    from faxe_spark.dfs import substitute_template

    return substitute_template(script, vars)


def test_dfs_corpus_sweep_parse_coverage():
    """The honest front-end metric: >=80% of the reference's 118 dfs
    scripts must parse (currently 100%); regressions fail here."""
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from dfs_sweep import sweep

    files, ok, failed, node_names = sweep()
    assert len(files) >= 110
    pct = 100.0 * len(ok) / len(files)
    assert pct >= 80.0, f"parse coverage {pct:.1f}% < 80%: {failed[:5]}"


def test_dfs_join2_and_statistics_compile(spark):
    from faxe_spark.dfs import DFSCompiler

    script = """
a
|group_by('user')
|join2(b)
.prefix('x_', 'b_')
.tolerance(10s)
"""
    import datetime
    t = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    a = spark.createDataFrame([(1, t(0), 1.0)], "user int, ts timestamp, v double")
    b = spark.createDataFrame([(1, t(2), 2.0)], "user int, ts timestamp, v double")
    c = DFSCompiler(spark, sources={"a": a, "b": b})
    out = c.run(script)
    assert out.count() == 1  # within 10s tolerance

    stat_script = """
a
|win_time_q()
.period(1h)
|statistics()
.modules('avg', 'max')
.field('v')
"""
    c2 = DFSCompiler(spark, sources={"a": a})
    row = c2.run(stat_script).collect()[0]
    assert row["v_avg"] == 1.0 and row["v_max"] == 1.0


def test_dfs_collect_and_sink_defer_compile(spark):
    from faxe_spark.dfs import DFSCompiler

    script = """
a
|collect()
.key_fields('user')
.add(lambda: "v" > 0)
|http_post()
.host('h.example')
.port(8080)
.path('/ingest')
"""
    import datetime
    t = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    a = spark.createDataFrame(
        [(1, t(0), 1.0), (1, t(1), 2.0), (2, t(0), -1.0)],
        "user int, ts timestamp, v double")
    c = DFSCompiler(spark, sources={"a": a})
    out = c.run(script)
    rows = {r.user: r.v for r in out.collect()}
    assert rows == {1: 2.0}  # add-filter dropped user 2; last row per key
    assert c.sinks == [{"kind": "http_post", "node": "http_post",
                        "url": "http://h.example:8080/ingest"}]


def test_dfs_corpus_compile_sweep(spark):
    """End-to-end compile gate: every emitter-driven corpus script
    (the ones runnable without a broker/PLC) must COMPILE to a
    DataFrame — except the corpus's own negative-test fixture
    (node_not_found_err.dfs, whose unknown `son_emitter` node is
    SUPPOSED to error; dfs_to_graph.erl asserts the same)."""
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from dfs_sweep import compile_sweep

    ok, failed = compile_sweep(spark)
    total = len(ok) + len(failed)
    assert total >= 80
    real_fails = [(f, e) for f, e in failed
                  if "node_not_found_err" not in str(f)]
    assert len(ok) / total >= 0.9, \
        f"compile coverage {len(ok)}/{total}: {real_fails[:5]}"
    assert not real_fails, f"corpus scripts failing: {real_fails}"


def test_fill_period_suppresses_partial_head_windows(spark):
    """esp_win_clock.erl:10 fill_period: windows that started before the
    first event (partial head) don't emit."""
    import datetime

    from faxe_spark.dfs import DFSCompiler

    t = lambda s: (datetime.datetime(2024, 1, 1)
                   + datetime.timedelta(seconds=s))  # noqa: E731
    # first event at :05 — the epoch-aligned [0:00,1:00) head window is
    # partial under a 1m period with 30s slide
    rows = [(t(5), 1.0), (t(35), 2.0), (t(65), 3.0), (t(95), 4.0)]
    d = spark.createDataFrame(rows, "ts timestamp, val double")

    script = """
a
|win_time()
.period(1m)
.every(30s)
{FILL}
|sum('val')
.as('s')
"""
    plain = DFSCompiler(spark, sources={"a": d}).run(script.format(FILL=""))
    filled = DFSCompiler(spark, sources={"a": d}).run(
        script.format(FILL=".fill_period()"))
    n_plain, n_filled = plain.count(), filled.count()
    assert n_filled < n_plain
    # every remaining window starts at/after the first event's slide
    starts = [r["window"]["start"] for r in filled.collect()]
    assert all(s >= t(0) for s in starts)
    assert min(starts) >= t(0)


def test_fill_period_count_window(spark):
    """win_event fill_period: no emission until `period` rows seen."""
    import datetime

    from faxe_spark.dfs import DFSCompiler

    t = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    d = spark.createDataFrame(
        [(t(i), 1, float(i)) for i in range(6)], "ts timestamp, k int, val double")
    script = """
a
|group_by('k')
|win_event()
.period(3)
.every(1)
.fill_period()
|sum('val')
.as('s')
"""
    out = DFSCompiler(spark, sources={"a": d}).run(script)
    # rows 1 and 2 are suppressed; rows 3..6 emit full 3-row sums
    sums = sorted(r.s for r in out.collect())
    assert sums == [3.0, 6.0, 9.0, 12.0]


def test_python_node_compiles_in_dfs(spark):
    """@Class() user-callback nodes (c_python3.erl) run through the
    mapInPandas adapter: @double writes field*2 under the .as() name."""
    import datetime

    from faxe_spark.dfs import DFSCompiler

    t = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    d = spark.createDataFrame([(t(0), 3.0), (t(1), 5.0)],
                              "ts timestamp, val double")
    script = """
a
@double()
.field('val')
.as('val2')
@callback()
.stop_on_exit(true)
"""
    out = DFSCompiler(spark, sources={"a": d}).run(script)
    assert sorted(r.val2 for r in out.collect()) == [6.0, 10.0]


def test_dfs_state_change_bulk_compiles_and_runs(spark):
    """state_change_bulk's condition targets the MELTED value column
    (the original field names no longer exist after stack()) — ADVICE r2:
    the old build referenced the first original field and every script
    using the node died with UNRESOLVED_COLUMN."""
    import datetime

    from faxe_spark.dfs import DFSCompiler

    t = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    d = spark.createDataFrame(
        [(1, t(0), 0.0, 1.0), (1, t(1), 1.0, 1.0), (1, t(2), 1.0, 0.0)],
        "user int, ts timestamp, m1 double, m2 double")
    script = """
a
|group_by('user')
|state_change_bulk()
.field('m1', 'm2')
.state_value(1)
"""
    out = DFSCompiler(spark, sources={"a": d}).run(script)
    rows = {(r.field, int(r.ts.second), r.in_state) for r in out.collect()}
    # m1: enters state at t1 (0->1); m2: leaves state at t2 (1->0)
    assert ("m1", 0, False) in rows and ("m1", 1, True) in rows
    assert ("m2", 0, True) in rows and ("m2", 2, False) in rows


def test_dfs_run_strict_template_vars():
    """DFSCompiler.run raises on unbound {{vars}} (reference-strict);
    only the parse-only sweep substitutes a placeholder."""
    import pytest as _pytest

    from faxe_spark.dfs import DFSCompiler, parse_script

    script = "a\n|sample({{rate}})\n"
    with _pytest.raises(KeyError, match="rate"):
        parse_script(script)  # strict default
    with _pytest.raises(KeyError, match="rate"):
        DFSCompiler(None).run(script)
    assert parse_script(script, on_missing="1")  # sweep tolerance
    assert parse_script(script, {"rate": 5})[0].nodes[0].args == [5]


def test_dfs_corpus_exec_sweep(spark):
    """EXECUTION gate (beyond compile): every runnable emitter-driven
    corpus script collects rows — runtime-only failures (Arrow, python
    nodes, cast conflicts) surface here. Sole exception: the corpus's
    own negative-test fixture."""
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from dfs_sweep import exec_sweep

    ok, failed = exec_sweep(spark)
    real = [(str(f), e) for f, e in failed if "node_not_found_err" not in str(f)]
    assert not real, f"corpus scripts failing at RUNTIME: {real}"


# -- PLC / DB source nodes + macros (round-4 glue) -------------------------

PLCDB_SCRIPTS = [
    # (relative corpus path, template vars, expected wire-request count)
    ("dfs/test/mongo.dfs", {}, None),
    ("dfs/other/pg_query.dfs", {}, None),
    ("dfs/other/oracle_query_test.dfs", {}, None),
    ("dfs/other/s7_test.dfs", {}, 5),
    ("dfs/other/modbus_multi_test.dfs", {}, None),
    ("dfs/other/modbus_mqtt_pub.dfs", {}, 3),
    ("dfs/other/s7_read_test1.dfs",
     {"db_number": "11113", "db": "DB11113.DB", "pre": "data."}, 3),
    ("dfs/other/s7_read_test2.dfs",
     {"db_number": "11113", "db": "DB11113.DB", "pre": "data."}, None),
]


@pytest.mark.parametrize("rel,vars,nreq", PLCDB_SCRIPTS,
                         ids=[s[0].rsplit("/", 1)[-1] for s in PLCDB_SCRIPTS])
def test_dfs_plcdb_corpus_compiles(spark, rel, vars, nreq):
    """The DB/PLC corpus scripts compile end-to-end: options validated,
    the coalesced wire plan / connector spec built for real, the node
    lowered to a typed frame every downstream node resolves against
    (esp_s7read.erl:63, esp_modbus_read.erl:81, esp_mongo_query.erl:40)."""
    import pathlib

    from faxe_spark.dfs import DFSCompiler

    text = pathlib.Path("/root/reference", rel).read_text(errors="replace")
    c = DFSCompiler(spark)
    df = c.run(text, vars=vars)
    assert df.schema  # analyzes end-to-end
    assert c.plc_plans or c.connector_specs
    if nreq is not None:
        assert len(c.plc_plans[0]["requests"]) == nreq


def test_dfs_s7read_wire_plan_coalesces(spark):
    """16 tags -> few wire requests through the DFS front door, typed
    stub schema matches the parsed dtypes."""
    from faxe_spark.dfs import DFSCompiler

    c = DFSCompiler(spark)
    df = c.run("""|s7read()
.ip('127.0.0.1').rack(0).slot(1).every(100ms)
.vars('DB4,R1', 'DB4,Int42', 'DB4,Int43', 'DB4,Int44')
.as('torque', 'pos', 'velo_set', 'velo_act')
""")
    [plan] = c.plc_plans
    # Int42/43/44 are contiguous in the reference's word-length table
    # (int=1 unit, esp_s7read.erl:457-469) -> ONE wire request; R1 a
    # second
    assert len(plan["requests"]) == 2
    types = dict((f.name, f.dataType.simpleString()) for f in df.schema)
    assert types["torque"] == "double"
    assert types["pos"] == "int"
    assert df.count() == 0  # wire-less container: typed, empty


def test_dfs_modbus_decode_types_and_plan(spark):
    from faxe_spark.dfs import DFSCompiler

    c = DFSCompiler(spark)
    df = c.run("""|modbus()
.ip('127.0.0.1').every(5s)
.function('hregs', 'hregs', 'coils')
.from(2701, 2703, 10)
.count(2, 2, 1)
.as('energy_a', 'energy_b', 'on')
.output('float32', 'float32', '')
""")
    [plan] = c.plc_plans
    # 2701+2 == 2703 with equal opts -> merged; coils separate
    assert len(plan["requests"]) == 2
    types = dict((f.name, f.dataType.simpleString()) for f in df.schema)
    # no-output reads (incl. coils) are raw ints in the live decode
    # lane (sources/modbus.py fmt "") — the stub schema must agree
    assert types == {"ts": "timestamp", "energy_a": "double",
                     "energy_b": "double", "on": "int"}


def test_dfs_pg_query_time_bucket_rewrite(spark):
    """postgresql_query + group_by_time goes through the crate-style
    time-bucket rewrite before it would hit the wire."""
    from faxe_spark.dfs import DFSCompiler

    c = DFSCompiler(spark)
    c.run("""|postgresql_query()
.host('h').port(5432).database('doc').user('u')
.query(<<< SELECT avg(v) AS avg_v FROM t >>>)
.group_by_time(3m)
.every(5s)
""")
    [spec] = c.connector_specs
    assert spec["url"] == "jdbc:postgresql://h:5432/doc"
    assert "time_bucket" in spec["query"] or "GROUP BY" in spec["query"]


def test_dfs_mongo_query_validates_json(spark):
    from faxe_spark.dfs import DFSCompiler

    with pytest.raises(ValueError, match="not valid JSON"):
        DFSCompiler(spark).run(
            "|mongo_query()\n.collection('c')\n.query('{nope')\n")


def test_dfs_macro_compiles_and_applies(spark):
    """||name() macro invocation (dfs/other/macro1.dfs): the body
    declared under '%% macro : flow_id : <name>' splices in at the
    invocation, with node params overriding the body's def defaults."""
    from faxe_spark.dfs import DFSCompiler

    src = """
%% macro : flow_id : cond
def val = 1
|case(
    lambda: "data.State.Err" == val OR "data.State.Warn" == val,
    lambda: "data.State.Auto" == val
    )
    .values('Err', 'Ok')
    .as('condition')
    .default('Warn')
%% use
|json_emitter()
.json('{"data": {"State": {"Err": 2, "Warn": 0, "Auto": 0}}}',
      '{"data": {"State": {"Err": 0, "Warn": 0, "Auto": 5}}}',
      '{"data": {"State": {"Err": 0, "Warn": 0, "Auto": 2}}}')
||cond()
.val(2)
"""
    c = DFSCompiler(spark)
    out = c.run(src)
    assert [r["condition"] for r in out.select("condition").collect()] \
        == ["Err", "Warn", "Ok"]
    # the macro body must NOT also compile as a free-standing chain
    assert "cond" in c.macros


def test_dfs_macro1_corpus_script_compiles(spark):
    import pathlib

    from faxe_spark.dfs import DFSCompiler

    c = DFSCompiler(spark)
    df = c.run(pathlib.Path(
        "/root/reference/dfs/other/macro1.dfs").read_text(errors="replace"))
    assert "ctc_module_condition" in c.macros
    assert "data.condition" in df.columns


def test_dfs_http_listen_port_clamp(spark):
    """ADVICE r3: fixed corpus ports outside the safe unprivileged
    range bind ephemeral instead of privileged/overflowing."""
    from faxe_spark.dfs import DFSCompiler

    c = DFSCompiler(spark)
    c.run("|http_listen()\n.port(80)\n")
    try:
        [lis] = c.listeners
        assert lis.port != 80 and lis.port >= 1024
    finally:
        for lis in c.listeners:
            lis.stop()


def test_dfs_macro_edge_cases(spark):
    """Review r4: back-to-back macro declarations register BOTH; an
    ordinary body comment beginning with 'use ...' does not truncate
    the body (only a bare '%% use' terminates)."""
    from faxe_spark.dfs import DFSCompiler

    src = """
%% macro : flow_id : m_one
def v = 1
|set().fields('a').field_values(1)
%% macro : flow_id : m_two
%% use upstream default behavior here
|set().fields('b').field_values(2)
%% use
|json_emitter()
.json('{"x": 0}')
||m_one()
||m_two()
"""
    c = DFSCompiler(spark)
    out = c.run(src)
    assert set(c.macros) == {"m_one", "m_two"}
    [row] = out.select("a", "b").collect()
    assert (row.a, row.b) == (1, 2)


def test_dfs_influx_sink_spec_executes_live(spark):
    """Full circuit: a DFS script's influx_out spec binds to the live
    line-protocol lane and lands points on the embedded endpoint."""
    import datetime

    from faxe_spark.dfs import DFSCompiler
    from faxe_spark.sinks import run_sink_spec
    from faxe_spark.sinks.influx import InfluxHTTPServer

    script = """
a
|eval()
.lambdas(lambda: "v" * 2)
.as('v2')
|influx_out()
.host('127.0.0.1')
.port(8086)
.database('metrics')
.measurement('m1')
.user('u')
.pass('pw')
"""
    t = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    a = spark.createDataFrame([(t(0), 1.5), (t(1), 2.0)],
                              "ts timestamp, v double")
    c = DFSCompiler(spark, sources={"a": a})
    out = c.run(script)
    [spec] = [s for s in c.sinks if s["kind"] == "influx_write"]
    assert spec["port"] == 8086 and spec["user"] == "u"
    srv = InfluxHTTPServer()
    try:
        run_sink_spec(out, spec, port=srv.port)
        pts = sorted(srv.points["metrics"])
        assert pts == ["m1 v=1.5,v2=3.0 1704067200000",
                       "m1 v=2.0,v2=4.0 1704067201000"]
        assert any("u=u&p=pw" in r for r in srv.requests)
    finally:
        srv.stop()


def test_dfs_http_post_crate_sink_spec_executes_live(spark):
    """The http_post_crate node binds to the /_sql bulk lane (NOT the
    plain-JSON http_post): compile a DFS script, run the spec against
    the embedded endpoint, and land content-exact rows."""
    import duckdb

    from faxe_spark.dfs import DFSCompiler
    from faxe_spark.sinks import run_sink_spec
    from faxe_spark.sinks.crate_http import CrateSQLServer

    script = """
a
|http_post_crate()
.host('127.0.0.1')
.port(4200)
.database('doc')
.table('dfs_sink')
.db_fields('id', 'val')
.faxe_fields('id', 'val')
"""
    a = spark.createDataFrame([(1000, 7, 2.5), (2000, 8, 0.5)],
                              "ts long, id long, val double")
    c = DFSCompiler(spark, sources={"a": a})
    out = c.run(script)
    [spec] = [s for s in c.sinks if s["kind"] == "http_post_crate"]
    con = duckdb.connect()
    con.execute("CREATE SCHEMA doc")
    con.execute("CREATE TABLE doc.dfs_sink(ts BIGINT, id BIGINT, "
                "val DOUBLE)")
    srv = CrateSQLServer(con)
    try:
        assert run_sink_spec(out, spec, port=srv.port)
        got = con.execute("SELECT ts, id, val FROM doc.dfs_sink "
                          "ORDER BY ts").fetchall()
        assert got == [(1000, 7, 2.5), (2000, 8, 0.5)]
    finally:
        srv.stop()
        con.close()


def test_dfs_timeseries_nodes(spark):
    """The Matrix-Profile family on the DFS text surface (VERDICT r6
    #7): a corpus-style script compiles and equals the direct op."""
    from faxe_spark.operators import timeseries as ts
    from faxe_spark.tables import load_table

    script = """
    |parquet('events')
    |group_by('user_id')
    |subsequence_topk()
    .pattern(0.0, 1.0, 3.0, 1.0)
    .k(5)
    """
    out = DFSCompiler(spark, tables_dir=SF_SMOKE).run(script)
    ev = load_table(spark, SF_SMOKE, "events")
    want = ts.subsequence_topk(ev, [0.0, 1.0, 3.0, 1.0],
                               key_col="user_id", ts_col="ts",
                               value_col="value", k=5)
    assert sorted(map(tuple, out.collect())) == \
        sorted(map(tuple, want.collect()))

    dis = DFSCompiler(spark, tables_dir=SF_SMOKE).run("""
    |parquet('events')
    |group_by('user_id')
    |discord_topk(4)
    .k(1)
    """)
    assert set(dis.columns) == {"user_id", "end_ts", "nn_corr",
                                "nn_dist", "rank"}
    assert dis.count() > 0

    with pytest.raises(ValueError, match="series key"):
        DFSCompiler(spark, tables_dir=SF_SMOKE).run(
            "|parquet('events')\n|motif_topk(4)")


def test_dfs_subsequence_match_node(spark):
    """VERDICT r7 #6: the shape-alerting matcher on the DFS text
    surface — a corpus-style script compiles to the exact batch analog
    (the streaming branch of the same node is pinned equal to this
    lane by tests/test_flow.py's build_stream round-trip)."""
    from faxe_spark.operators import timeseries as ts
    from faxe_spark.tables import load_table

    script = """
    |parquet('events')
    |group_by('user_id')
    |subsequence_match()
    .pattern(0.0, 1.0, 3.0, 1.0)
    .max_dist(2.5)
    """
    out = DFSCompiler(spark, tables_dir=SF_SMOKE).run(script)
    ev = load_table(spark, SF_SMOKE, "events")
    want = ts.subsequence_match(ev, [0.0, 1.0, 3.0, 1.0],
                                key_col="user_id", ts_col="ts",
                                value_col="value", max_dist=2.5)
    assert out.columns == ["key", "end_ts_ms", "dist"]
    assert sorted(map(tuple, out.collect())) == \
        sorted(map(tuple, want.collect()))
    assert out.count() > 0

    with pytest.raises(ValueError, match="series key"):
        DFSCompiler(spark, tables_dir=SF_SMOKE).run(
            "|parquet('events')\n|subsequence_match()\n.pattern(1.0, 2.0)")


def test_dfs_trainprep_nodes_match_direct(spark):
    """VERDICT r8 #6: dsir_resample / shard / split on the DFS script
    surface — each compiles to the trainprep library op and matches it
    row-for-row (the lane-equality contract the r8 match_pattern node
    set)."""
    from faxe_spark.operators import trainprep as tp
    from faxe_spark.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")

    out = DFSCompiler(spark, tables_dir=SF_SMOKE).run("""
    def docs = |parquet('documents')

    docs
    |dsir_resample(lambda: "lang" == 'en')
    .k(10)
    .salt(4)
    |keep('doc_id', 'score', 'rank')
    """)
    want = (tp.dsir_resample(docs, target_flag=F.expr("lang = 'en'"),
                             k=10, salt=4)
            .select("doc_id", "score", "rank"))
    assert sorted(map(tuple, out.collect())) == \
        sorted(map(tuple, want.collect()))
    assert out.count() == 10

    out = DFSCompiler(spark, tables_dir=SF_SMOKE).run("""
    def docs = |parquet('documents')

    docs
    |shard(8)
    .seed('epoch1')
    |keep('doc_id', 'shard', 'shard_pos')
    """)
    want = (tp.shard_assign(docs, n_shards=8, seed="epoch1")
            .select("doc_id", "shard", "shard_pos"))
    assert sorted(map(tuple, out.collect())) == \
        sorted(map(tuple, want.collect()))

    out = DFSCompiler(spark, tables_dir=SF_SMOKE).run("""
    def docs = |parquet('documents')

    docs
    |split()
    .names('train', 'val', 'test')
    .fractions(0.8, 0.1, 0.1)
    |keep('doc_id', 'split')
    """)
    want = (tp.split_assign(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
            .select("doc_id", "split"))
    assert sorted(map(tuple, out.collect())) == \
        sorted(map(tuple, want.collect()))


def test_dfs_split_validates_names_fractions(spark):
    with pytest.raises(ValueError, match="equal"):
        DFSCompiler(spark, tables_dir=SF_SMOKE).run("""
        def docs = |parquet('documents')

        docs
        |split()
        .names('train', 'val')
        .fractions(0.8)
        """)


def test_dfs_fold_nodes_match_library(spark):
    """VERDICT r9 #4: shard_append / dsir_select on the DFS script
    surface — carried state rides in via the compiler env (`sources=`)
    or a script var; each epoch-2 script run equals the library fold."""
    from faxe_spark.operators import trainprep as tp
    from faxe_spark.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    e1 = docs.filter("doc_id % 2 = 0")
    e2 = docs.filter("doc_id % 2 = 1")

    a1, c1 = tp.shard_append(e1, None, n_shards=4)
    a2, _ = tp.shard_append(e2, c1, n_shards=4)

    out1 = DFSCompiler(spark, tables_dir=SF_SMOKE,
                       sources={"epoch": e1}).run("""
    epoch
    |shard_append(4)
    |keep('doc_id', 'shard', 'shard_pos')
    """)
    out2 = DFSCompiler(spark, tables_dir=SF_SMOKE,
                       sources={"epoch": e2, "prior_counts": c1}).run("""
    epoch
    |shard_append(4)
    .counts('prior_counts')
    |keep('doc_id', 'shard', 'shard_pos')
    """)
    key = lambda df: sorted(  # noqa: E731
        (r.doc_id, r.shard, r.shard_pos)
        for r in df.select("doc_id", "shard", "shard_pos").collect())
    assert key(out1) == key(a1)
    assert key(out2) == key(a2)

    wdf = tp.dsir_weights_flagged(docs, F.expr("lang = 'en'"), buckets=64)
    w = {int(r.bucket): int(r.lam) for r in wdf.collect()}
    b1 = tp.dsir_select_incremental(e1, None, weights=w, k=10, buckets=64)
    b2 = tp.dsir_select_incremental(e2, b1, weights=w, k=10, buckets=64)
    tp.save_dsir_weights(spark, wdf, name="t_dfs_dsel")
    try:
        s1 = DFSCompiler(spark, tables_dir=SF_SMOKE,
                         sources={"epoch": e1}).run("""
        epoch
        |dsir_select()
        .k(10)
        .weights('t_dfs_dsel')
        .buckets(64)
        """)
        assert sorted(map(tuple, s1.collect())) == \
            sorted(map(tuple, b1.collect()))
        s2 = DFSCompiler(spark, tables_dir=SF_SMOKE,
                         sources={"epoch": e2, "prior_best": b1}).run("""
        epoch
        |dsir_select()
        .k(10)
        .weights('t_dfs_dsel')
        .best('prior_best')
        .buckets(64)
        """)
        assert sorted(map(tuple, s2.collect())) == \
            sorted(map(tuple, b2.collect()))
    finally:
        tp.drop_dsir_weights(spark, name="t_dfs_dsel")

    with pytest.raises(ValueError, match="shard count"):
        DFSCompiler(spark, tables_dir=SF_SMOKE).run(
            "|parquet('documents')\n|shard_append()")
    with pytest.raises(ValueError, match=r"\.weights\("):
        DFSCompiler(spark, tables_dir=SF_SMOKE).run(
            "|parquet('documents')\n|dsir_select()\n.k(10)")
    # r10 review find: a typo'd carried-state ref fails descriptively
    with pytest.raises(ValueError, match="carried-state ref"):
        DFSCompiler(spark, tables_dir=SF_SMOKE).run(
            "|parquet('documents')\n|shard_append(4)\n.counts(prior)")


def test_dfs_shard_and_dsir_missing_options_are_loud(spark):
    """ADVICE r9 (low): missing required options on shard /
    dsir_resample raise descriptive ValueErrors (node_split's
    convention), not bare KeyErrors."""
    with pytest.raises(ValueError, match="shard count"):
        DFSCompiler(spark, tables_dir=SF_SMOKE).run(
            "|parquet('documents')\n|shard()")
    with pytest.raises(ValueError, match="target lambda"):
        DFSCompiler(spark, tables_dir=SF_SMOKE).run(
            "|parquet('documents')\n|dsir_resample()\n.k(10)")
    with pytest.raises(ValueError, match=r"\.k\("):
        DFSCompiler(spark, tables_dir=SF_SMOKE).run(
            "|parquet('documents')\n"
            "|dsir_resample(lambda: \"lang\" == 'en')")


def test_dfs_state_table_no_tables_dir_descriptive(spark):
    """ADVICE r10: a plain-string carried-state name with no env match
    and tables_dir=None must raise the descriptive ValueError, not a
    PATH_NOT_FOUND on 'None/<name>.parquet'."""
    from faxe_spark.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents").limit(4)
    with pytest.raises(ValueError, match="no tables_dir was configured"):
        DFSCompiler(spark, sources={"epoch": docs}).run("""
        epoch
        |shard_append(4)
        .counts('missing_state')
        """)
