"""Streaming semantics tests: file-stream the sf0.001 events table with
an availableNow trigger into a memory sink, and check stateful operators
against their batch analogs (the reference's test strategy: golden
behavior from synthetic emitters, SURVEY.md §5)."""

from __future__ import annotations

import time

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMOKE

EVENTS = f"{SF_SMOKE}/events.parquet"


def _run_available_now(sdf, name):
    q = (sdf.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    return q


def test_stream_win_time_matches_batch(spark):
    from faxe_spark.streaming import stream_parquet, win_time_stream
    from faxe_spark.tables import load_table

    s = stream_parquet(spark, EVENTS)
    agg = win_time_stream(
        s, [("value", "sum", "sum_v"), ("value", "count", "n")],
        ts_col="ts", period="1h", by=["event_type"], watermark="0s")
    _run_available_now(agg, "win_stream")
    got = {tuple(r) for r in spark.sql(
        "SELECT window.start, event_type, sum_v, n FROM win_stream").collect()}

    ev = load_table(spark, SF_SMOKE, "events")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    batch = (ev.groupBy(F.window("ts", "1 hour").alias("window"), "event_type")
             .agg(F.sum("value").alias("sum_v"), F.count("value").alias("n"))
             # append mode only emits windows the final watermark (= max ts)
             # has closed; the trailing open window is withheld by design
             .filter(F.col("window.end") <= F.lit(max_ts))
             .select(F.col("window.start"), "event_type", "sum_v", "n"))
    want = {tuple(r) for r in batch.collect()}
    assert got == want


def test_state_change_stream_matches_batch(spark):
    from faxe_spark.streaming import stream_parquet, state_change_stream
    from faxe_spark.operators import state_change
    from faxe_spark.tables import load_table

    s = stream_parquet(spark, EVENTS).withColumn("st", F.col("value") > 30)
    out = state_change_stream(s, key_col="user_id", state_col="st", ts_col="ts")
    _run_available_now(out, "sc_stream")
    got = {(r.key, r.ts_ms, r.in_state, r.run_id)
           for r in spark.sql("SELECT * FROM sc_stream").collect()}

    ev = load_table(spark, SF_SMOKE, "events")
    batch = state_change(ev, F.col("value") > 30, by=["user_id"],
                         ts_col="ts", tiebreak="event_id")
    want = {(r.user_id, r.ts_ms, r.in_state, r.run_id) for r in batch.select(
        "user_id", F.unix_millis("ts").alias("ts_ms"), "in_state",
        F.col("run_id").cast("long").alias("run_id")).collect()}
    assert got == want


def test_collect_stream_upsert_actions(spark):
    from faxe_spark.streaming import stream_parquet, collect_stream

    s = stream_parquet(spark, EVENTS)
    out = collect_stream(s, key_col="user_id", value_col="event_type",
                         remove_value="error", ts_col="ts")
    _run_available_now(out, "collect_stream")
    rows = spark.sql("SELECT * FROM collect_stream").collect()
    assert rows, "collect emitted nothing"
    by_key: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r.key, r.ts_ms)):
        by_key.setdefault(r.key, []).append(r)
    for key, krows in by_key.items():
        assert krows[0].action == "add", f"key {key} first action {krows[0].action}"
        for prev, cur in zip(krows, krows[1:]):
            if cur.action == "add":
                assert prev.action == "remove", "add only valid after remove"
            if cur.action in ("update", "remove"):
                assert prev.action in ("add", "update")
        # emit-on-change contract: within a lifetime (between removes),
        # consecutive emitted values must differ
        prev_val = None
        for r in krows:
            if r.action == "remove":
                prev_val = None
                continue
            assert r.value != prev_val, f"key {key} re-emitted unchanged value"
            prev_val = r.value


def test_session_window_stream_runs(spark):
    from faxe_spark.streaming import stream_parquet, win_session_stream

    s = stream_parquet(spark, EVENTS)
    agg = win_session_stream(s, [("value", "count", "n")], ts_col="ts",
                             gap="30m", by=["user_id"], watermark="0s")
    _run_available_now(agg, "sess_stream")
    n = spark.sql("SELECT count(*) c FROM sess_stream").collect()[0].c
    assert n > 0


def test_deadman_stream_times_out(spark):
    """Drive the processing-time timeout: one data batch, then silence;
    the watchdog must emit alive=false rows after the timeout."""
    from faxe_spark.streaming import stream_parquet, deadman_stream

    s = stream_parquet(spark, EVENTS)
    out = deadman_stream(s, key_col="user_id", timeout="2s", ts_col="ts")
    q = (out.writeStream.format("memory").queryName("deadman_stream")
         .outputMode("update").trigger(processingTime="1 second").start())
    try:
        deadline = time.time() + 60
        dead = 0
        while time.time() < deadline:
            dead = spark.sql(
                "SELECT count(*) c FROM deadman_stream WHERE alive = false").collect()[0].c
            if dead > 0:
                break
            time.sleep(1)
        alive = spark.sql(
            "SELECT count(*) c FROM deadman_stream WHERE alive = true").collect()[0].c
        assert alive > 0, "no heartbeat rows emitted"
        assert dead > 0, "deadman never fired after silence"
    finally:
        q.stop()


def test_triggered_timeout_fires_and_cancels(spark):
    """error rows arm the timer; a later purchase cancels; keys whose
    error is never followed by a purchase time out (fired=true)."""
    import pyspark.sql.functions as F
    from faxe_spark.streaming import stream_parquet
    from faxe_spark.streaming.stateful import triggered_timeout_stream

    s = (stream_parquet(spark, EVENTS)
         .withColumn("trig", F.col("event_type") == "error")
         .withColumn("cancel", F.col("event_type") == "purchase"))
    out = triggered_timeout_stream(s, key_col="user_id", trigger_col="trig",
                                   cancel_col="cancel", timeout="2s", ts_col="ts")
    q = (out.writeStream.format("memory").queryName("tt_stream")
         .outputMode("append").trigger(processingTime="1 second").start())
    try:
        deadline = time.time() + 60
        fired = 0
        while time.time() < deadline:
            fired = spark.sql(
                "SELECT count(*) c FROM tt_stream WHERE fired").collect()[0].c
            if fired > 0:
                break
            time.sleep(1)
        cancelled = spark.sql(
            "SELECT count(*) c FROM tt_stream WHERE NOT fired").collect()[0].c
        assert cancelled > 0, "no cancellations observed"
        assert fired > 0, "armed timers never fired after silence"
    finally:
        q.stop()


def test_time_elapsed_stream_arrival_diffs(spark):
    """time_elapsed (esp_time_elapsed.erl:31): arrival-time diff per key —
    first row per key = -1, later rows >= 0, row count preserved."""
    from faxe_spark.streaming import stream_parquet, time_elapsed_stream

    s = stream_parquet(spark, EVENTS)
    out = time_elapsed_stream(s, key_col="user_id", ts_col="ts")
    _run_available_now(out, "te_stream")
    rows = spark.sql("SELECT * FROM te_stream").collect()
    n_events = spark.read.parquet(EVENTS).count()
    assert len(rows) == n_events
    by_key = {}
    for r in rows:
        by_key.setdefault(r.key, []).append(r.elapsed_ms)
    for elapsed in by_key.values():
        assert sum(1 for e in elapsed if e == -1) == 1  # exactly one first row
        assert all(e >= 0 for e in elapsed if e != -1)


def test_win_clock_stream_processing_time(spark):
    """win_clock (esp_win_clock.erl:33): processing-time window — all rows
    of an availableNow run arrive 'now', so counts land in wall-clock
    windows and total count is preserved."""
    from faxe_spark.streaming import stream_parquet, win_clock_stream

    s = stream_parquet(spark, EVENTS)
    agg = win_clock_stream(s, [("value", "count", "n")], period="1m")
    q = (agg.writeStream.format("memory").queryName("wc_stream")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    total = spark.sql("SELECT sum(n) s FROM wc_stream").collect()[0].s
    assert total == spark.read.parquet(EVENTS).count()


def test_flow_metrics_listener_and_observe(spark, tmp_path):
    """node_metrics analog (node_metrics.erl:28-60): per-query items_in
    meter via StreamingQueryListener; batch items_out via df.observe."""
    import time as _time

    import pyspark.sql.functions as F

    from faxe_spark.streaming import metrics as fm

    listener = fm.attach(spark)
    try:
        df = spark.createDataFrame([(i, i * 1.0) for i in range(100)], "id long, v double")
        df.write.mode("overwrite").parquet(str(tmp_path / "in"))
        stream = (spark.readStream.schema("id long, v double")
                  .parquet(str(tmp_path / "in")))
        q = (stream.writeStream.format("memory").queryName("metrics_probe")
             .trigger(availableNow=True).start())
        q.awaitTermination(60)
        deadline = _time.time() + 15
        snap = {}
        while _time.time() < deadline:
            snap = listener.snapshot()
            hit = [s for s in snap.values() if s["name"] == "metrics_probe"
                   and s["items_in"] >= 100]
            if hit:
                break
            _time.sleep(0.2)
        assert hit, f"listener never saw the rows: {snap}"
        assert hit[0]["batches"] >= 1

        out, obs = fm.observed(df.filter("v >= 10"), "probe",
                               F.sum("v").alias("v_sum"))
        out.write.mode("overwrite").parquet(str(tmp_path / "out"))
        got = obs.get
        assert got["items_out"] == 90
        assert got["v_sum"] == sum(float(i) for i in range(10, 100))
    finally:
        spark.streams.removeListener(listener)


def _write_rows(spark, tmp_path, name, rows, schema):
    path = str(tmp_path / name)
    spark.createDataFrame(rows, schema).repartition(1).write.parquet(path)
    return path


def test_collect_full_stream_add_update_merge_remove(spark, tmp_path):
    """esp_collect.erl semantics: add_when gates inserts, update_when
    lambda picks updates, update_mode=merge keeps absent fields, a
    remove_when hit deletes the key."""
    import datetime
    import json

    from faxe_spark.streaming import stream_parquet, collect_full_stream

    t = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    path = _write_rows(
        spark, tmp_path, "cfs1",
        [(1, t(0), 1.0, "lo"), (1, t(1), 2.0, None), (1, t(2), -1.0, None),
         (3, t(0), -5.0, "never")],  # add_when rejects negative first rows
        "key bigint, ts timestamp, v double, q string")
    s = stream_parquet(spark, path)
    out = collect_full_stream(
        s, key_col="key", payload_cols=["v", "q"],
        add_when=lambda new, _st: new.get("v", 0) >= 0,
        update_when=lambda new, st: new.get("v", 0) >= 0,
        remove_when=lambda new, st: new.get("v", 0) < 0,
        update_mode="merge")
    _run_available_now(out, "cfs1")
    rows = [(r.key, json.loads(r.payload), r.action)
            for r in spark.sql("SELECT * FROM cfs1 ORDER BY ts_ms").collect()]
    assert rows == [
        ("1", {"v": 1.0, "q": "lo"}, "add"),
        ("1", {"v": 2.0, "q": "lo"}, "update"),  # merge kept q
        ("1", {"v": 2.0, "q": "lo"}, "remove"),
    ]


def test_collect_full_stream_max_ts_age_eviction(spark, tmp_path):
    """Event-time aging (max_ts_age): a buffered point older than
    newest-seen-ts - age is evicted; include_removed surfaces it."""
    import datetime

    from faxe_spark.streaming import stream_parquet, collect_full_stream

    t = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    path = _write_rows(
        spark, tmp_path, "cfs2",
        [(2, t(0), 5.0, None), (2, t(30), 6.0, None)],
        "key bigint, ts timestamp, v double, q string")
    s = stream_parquet(spark, path)
    out = collect_full_stream(
        s, key_col="key", payload_cols=["v"],
        update_when=False, max_ts_age="5s", include_removed=True)
    _run_available_now(out, "cfs2")
    rows = [(r.action, r.ts_ms) for r in
            spark.sql("SELECT * FROM cfs2 ORDER BY ts_ms").collect()]
    # t(0) added, then t(30) arrives (no update) -> stored point is 30s
    # older than newest -> evicted and surfaced
    assert rows[0][0] == "add"
    assert ("remove", rows[0][1]) in rows


def test_collect_full_stream_emit_every(spark, tmp_path):
    """emit_every: the buffer re-emits unchanged contents (action='emit')
    on a processing-time cadence, like the reference's emit_timeout."""
    import datetime

    from faxe_spark.streaming import stream_parquet, collect_full_stream

    t = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    path = _write_rows(
        spark, tmp_path, "cfs3", [(7, t(0), 1.5, None)],
        "key bigint, ts timestamp, v double, q string")
    s = stream_parquet(spark, path)
    out = collect_full_stream(s, key_col="key", payload_cols=["v"],
                              emit_every="2s")
    q = (out.writeStream.format("memory").queryName("cfs3")
         .outputMode("append").trigger(processingTime="1 second").start())
    try:
        deadline = time.time() + 60
        emits = 0
        while time.time() < deadline:
            emits = spark.sql(
                "SELECT count(*) c FROM cfs3 WHERE action = 'emit'").collect()[0].c
            if emits > 0:
                break
            time.sleep(1)
        assert emits > 0, "emit_every never re-emitted the buffer"
    finally:
        q.stop()


def test_change_detect_and_value_diff_streams_cross_batch(spark, tmp_path):
    """change_detect/value_diff streaming analogs: state survives
    micro-batch boundaries (second file's first row diffs against the
    first file's last row)."""
    import datetime

    from faxe_spark.streaming import (change_detect_stream, stream_parquet,
                                      value_diff_stream)

    t = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    src = str(tmp_path / "cdsrc")
    import os
    os.makedirs(src)
    spark.createDataFrame([(1, t(0), 10.0), (1, t(1), 10.0), (1, t(2), 12.0)],
                          "key bigint, ts timestamp, v double") \
        .repartition(1).write.parquet(src + "/b1")
    schema = spark.read.parquet(src + "/b1").schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1) \
        .parquet(src + "/*")

    cd = change_detect_stream(stream, key_col="key", value_col="v")
    vd = value_diff_stream(stream, key_col="key", value_col="v")
    q1 = (cd.writeStream.format("memory").queryName("cd_s")
          .outputMode("append").trigger(processingTime="1 second").start())
    q2 = (vd.writeStream.format("memory").queryName("vd_s")
          .outputMode("append").trigger(processingTime="1 second").start())
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.sql("SELECT count(*) c FROM cd_s").collect()[0].c >= 2:
                break
            time.sleep(0.5)
        # second batch: starts equal to previous last value (12) -> no
        # change event; then 13 -> change
        spark.createDataFrame([(1, t(10), 12.0), (1, t(11), 13.0)],
                              "key bigint, ts timestamp, v double") \
            .repartition(1).write.parquet(src + "/b2")
        deadline = time.time() + 45
        while time.time() < deadline:
            if spark.sql("SELECT count(*) c FROM cd_s").collect()[0].c >= 3 and \
               spark.sql("SELECT count(*) c FROM vd_s").collect()[0].c >= 5:
                break
            time.sleep(0.5)
        cd_vals = [r.value for r in
                   spark.sql("SELECT * FROM cd_s ORDER BY ts_ms").collect()]
        assert cd_vals == ["10.0", "12.0", "13.0"]  # 12->12 suppressed
        vd_rows = [(r.value, r.value_diff) for r in
                   spark.sql("SELECT * FROM vd_s ORDER BY ts_ms").collect()]
        assert vd_rows == [(10.0, None), (10.0, 0.0), (12.0, 2.0),
                           (12.0, 0.0), (13.0, 1.0)]
    finally:
        q1.stop()
        q2.stop()


def test_sample_stream_every_nth(spark, tmp_path):
    import datetime

    from faxe_spark.streaming import sample_stream, stream_parquet

    t = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    src = str(tmp_path / "smpsrc")
    spark.createDataFrame([(1, t(i)) for i in range(7)],
                          "key bigint, ts timestamp") \
        .repartition(1).write.parquet(src)
    s = stream_parquet(spark, src)
    out = sample_stream(s, key_col="key", n=3)
    _run_available_now(out, "smp_s")
    rows = [r.ts_ms for r in spark.sql("SELECT * FROM smp_s ORDER BY ts_ms").collect()]
    # rows 3 and 6 of 7 pass
    base = 1704067200000
    assert rows == [base + 2000, base + 5000]


def test_conn_status_registry_and_dfs_node(spark):
    """conn_status (esp_conn_status.erl:35-50): connectors report
    transitions into the event bus; the node view filters by
    flow/node/type. The Modbus client reports the reference's
    connecting/connected/disconnected lifecycle."""
    from faxe_spark.dfs import DFSCompiler
    from faxe_spark.sources.modbus import ModbusClient, ModbusServer
    from faxe_spark.streaming.metrics import CONN_STATUS

    srv = ModbusServer(hregs={1: 5})
    try:
        c = ModbusClient("127.0.0.1", srv.port, flow_id="f1",
                         node_id="plc_a")
        c.read("hregs", 1, 1)
        c.close()
    finally:
        srv.stop()
    CONN_STATUS.report(flow_id="f2", node_id="mq", conn_type="mqtt",
                       status="connected", peer="broker:1883")

    frame = CONN_STATUS.frame(spark, flow_id="f1", conn_type="modbus_tcp")
    got = [r.status for r in frame.orderBy("ts").collect()]
    assert got == ["connecting", "connected", "disconnected"]

    out = DFSCompiler(spark).run("|conn_status()\n.flow('f2')\n.type('mqtt')\n")
    [row] = out.collect()
    assert (row.node_id, row.status) == ("mq", "connected")

    # stream view: spool replays history, live reports append
    sdf = CONN_STATUS.stream(spark, flow_id="f2")
    q = sdf.writeStream.format("memory").queryName("connst").start()
    try:
        CONN_STATUS.report(flow_id="f2", node_id="mq", conn_type="mqtt",
                           status="disconnected", peer="broker:1883")
        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.sql("SELECT * FROM connst").count() >= 2:
                break
            time.sleep(0.3)
        states = {r.status for r in spark.sql("SELECT * FROM connst").collect()}
        assert {"connected", "disconnected"} <= states
    finally:
        q.stop()


def test_dedup_exact_stream_drops_replays(spark, tmp_path):
    """Replayed content within the watermark horizon is dropped across
    micro-batches; distinct content passes."""
    from faxe_spark.streaming.stateful import dedup_exact_stream

    import datetime

    t = lambda m, s: datetime.datetime(2024, 1, 1, 10, m, s)  # noqa: E731
    schema = "doc_id long, text string, ts timestamp"
    _write_rows(spark, tmp_path, "b1", [
        (1, "alpha beta", t(0, 0)),
        (2, "ALPHA   beta", t(0, 10)),   # normalized dup of doc 1
        (3, "gamma delta", t(0, 20)),
    ], schema)
    _write_rows(spark, tmp_path, "b2", [
        (4, "alpha beta", t(5, 0)),      # replay, inside horizon
        (5, "epsilon zeta", t(5, 10)),
    ], schema)
    read_schema = spark.read.parquet(str(tmp_path / "b1")).schema
    stream = (spark.readStream.schema(read_schema)
              .option("maxFilesPerTrigger", 1).parquet(str(tmp_path) + "/*"))
    out = dedup_exact_stream(stream, watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("dedup_s")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.doc_id for r in spark.sql("SELECT * FROM dedup_s").collect()}
    # one of {1,2} survives (first arrival per fingerprint), 4 is dropped
    assert 3 in got and 5 in got
    assert len(got & {1, 2}) == 1 and 4 not in got


def test_dedup_exact_stream_null_text_and_fp_column(spark, tmp_path):
    """r4 advice: NULL-text docs fingerprint as the empty doc (matching
    batch dedup_incremental — they dedup against '' instead of keying
    state on NULL), and a caller's own '_fp' column survives."""
    from faxe_spark.streaming.stateful import dedup_exact_stream

    import datetime

    t = lambda s: datetime.datetime(2024, 1, 1, 10, 0, s)  # noqa: E731
    schema = "doc_id long, text string, _fp string, ts timestamp"
    _write_rows(spark, tmp_path, "b1", [
        (1, None, "keep1", t(0)),
        (2, "", "keep2", t(5)),      # same fingerprint as NULL text
        (3, "alpha", "keep3", t(10)),
    ], schema)
    read_schema = spark.read.parquet(str(tmp_path / "b1")).schema
    stream = (spark.readStream.schema(read_schema)
              .option("maxFilesPerTrigger", 1).parquet(str(tmp_path) + "/*"))
    out = dedup_exact_stream(stream, watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("dedup_nulls")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = {r.doc_id: r for r in
            spark.sql("SELECT * FROM dedup_nulls").collect()}
    assert 3 in rows and len(rows.keys() & {1, 2}) == 1
    surviving = (rows.keys() & {1, 2}).pop()
    assert rows[surviving]._fp == f"keep{surviving}"   # caller col intact
    assert rows[3]._fp == "keep3"


def test_scan_stage_text_ops_run_on_streams(spark, tmp_path):
    """The scan-stage text operators (pii/quality/repetition/url) are
    stateless Column expressions, so the SAME functions run unchanged
    on a readStream — no streaming variants needed."""
    import pyspark.sql.functions as F

    from faxe_spark.operators import text as text_ops

    schema = "doc_id long, text string, ts timestamp"
    import datetime
    _write_rows(spark, tmp_path, "b1", [
        (1, "mail a@b.cc from 10.0.0.1", datetime.datetime(2024, 1, 1)),
        (2, "plain words only here", datetime.datetime(2024, 1, 1)),
    ], schema)
    read_schema = spark.read.parquet(str(tmp_path / "b1")).schema
    stream = spark.readStream.schema(read_schema).parquet(str(tmp_path) + "/*")
    out = text_ops.hashed_linear_score(
        text_ops.repetition_features(text_ops.pii_features(stream)))
    out = out.withColumn("clean", text_ops.scrub_pii(F.col("text")))
    q = (out.writeStream.format("memory").queryName("textops_s")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = {r.doc_id: r for r in spark.sql("SELECT * FROM textops_s").collect()}
    assert rows[1].n_email == 1 and rows[1].n_ipv4 == 1
    assert rows[1].clean == "mail <EMAIL> from <IPV4>"
    assert rows[2].repetition_ok and isinstance(rows[2].score, float)


def test_trainprep_stream_equals_batch_reference(spark, tmp_path):
    """Brief r5 item 7: the end-to-end incremental trainprep pipeline
    (file-stream source -> quality filter -> mixture sampling ->
    incremental exact dedup with mixture rates from a STATIC census)
    must emit exactly what the batch pipeline produces over the same
    batches in the same order."""
    import datetime

    from faxe_spark.operators.trainprep import plan_mixture
    from faxe_spark.streaming.trainprep import (trainprep_batch_reference,
                                                trainprep_stream)

    t = lambda m: datetime.datetime(2024, 1, 1, 10, m, 0)  # noqa: E731
    schema = "doc_id long, source string, text string, ts timestamp"
    good = ("the quick brown fox jumps over the lazy dog and then "
            "walks away to find some more interesting things to do "
            "with its afternoon in the quiet forest by the river")
    rows1 = [(i, "web" if i % 2 else "code", f"{good} variant {i}", t(0))
             for i in range(10)]
    rows1.append((90, "web", "!!! 4242 &&& 1111 ###", t(0)))  # low quality
    rows2 = ([(100 + i, "web" if i % 2 else "code",
               f"{good} variant {i}", t(5)) for i in range(5)]   # replays
             + [(200 + i, "web", f"{good} fresh {i}", t(5))
                for i in range(5)])
    _write_rows(spark, tmp_path, "b1", rows1, schema)
    _write_rows(spark, tmp_path, "b2", rows2, schema)

    # static census: the frozen first crawl decides the rates
    static = spark.createDataFrame(rows1, schema)
    rates = plan_mixture(static, {"web": 0.5, "code": 0.5})
    assert rates and all(0 < r <= 1 for r in rates.values())

    read_schema = spark.read.parquet(str(tmp_path / "b1")).schema
    stream = (spark.readStream.schema(read_schema)
              .option("maxFilesPerTrigger", 1).parquet(str(tmp_path) + "/*"))
    out = trainprep_stream(stream, rates=rates)
    q = (out.writeStream.format("memory").queryName("tp_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.doc_id for r in spark.sql("SELECT * FROM tp_stream").collect()}

    b1 = spark.createDataFrame(rows1, schema)
    b2 = spark.createDataFrame(rows2, schema)
    want = {r.doc_id for r in
            trainprep_batch_reference([b1, b2], rates=rates).collect()}
    # meaningful fixture: something passed, something was filtered,
    # every replay was dropped, and batch 2 contributed fresh docs
    assert got == want
    assert 90 not in got                       # quality gate fired
    assert not any(100 <= d < 200 for d in got)   # replays deduped
    assert any(d >= 200 for d in got)          # fresh content flowed
    assert len(got) < len(rows1) + len(rows2)  # mixture sampled out some


# ---------------------------------------------------------------------------
# Late / out-of-order arrival goldens (VERDICT r5 #5): SURVEY §2.5 claims
# Spark watermarks are a SUPERSET of the reference's win_time late-data
# handling — these pin the documented policy: an out-of-order event inside
# the watermark horizon lands in its (earlier) window; an event beyond the
# horizon is dropped from a finalized window; dedup state expires with the
# horizon so an ancient replay is a fresh document.
# ---------------------------------------------------------------------------


def _late_t(h, m, s=0):
    import datetime
    return datetime.datetime(2024, 1, 1, h, m, s)


def test_win_time_stream_late_within_watermark_included(spark, tmp_path):
    """An out-of-order event arriving AFTER later event-times were seen,
    but within the watermark horizon, is aggregated into its own
    (earlier) window — the window's final emission equals the batch
    reference computed over ALL rows including the late one."""
    from faxe_spark.streaming import win_time_stream
    from faxe_spark.tables import load_table  # noqa: F401 (batch analog below)

    schema = "key string, value double, ts timestamp"
    _write_rows(spark, tmp_path, "b1", [
        ("a", 1.0, _late_t(10, 10)),
        ("a", 2.0, _late_t(10, 20)),
        ("a", 10.0, _late_t(11, 5)),
    ], schema)
    _write_rows(spark, tmp_path, "b2", [
        ("a", 4.0, _late_t(10, 30)),   # LATE: older than the 11:05 max,
                                       # inside the 1h horizon -> accepted
        ("a", 20.0, _late_t(12, 30)),
    ], schema)
    _write_rows(spark, tmp_path, "b3", [
        ("a", 0.0, _late_t(14, 0)),    # advance watermark to 13:00
    ], schema)
    read_schema = spark.read.parquet(str(tmp_path / "b1")).schema
    stream = (spark.readStream.schema(read_schema)
              .option("maxFilesPerTrigger", 1).parquet(str(tmp_path) + "/*"))
    agg = win_time_stream(stream, [("value", "sum", "sum_v"),
                                   ("value", "count", "n")],
                          ts_col="ts", period="1h", by=["key"],
                          watermark="1h")
    _run_available_now(agg, "late_ok")
    rows = {r["start"]: r for r in spark.sql(
        "SELECT window.start AS start, sum_v, n FROM late_ok").collect()}
    w10 = rows[_late_t(10, 0)]
    assert w10.n == 3 and w10.sum_v == 7.0      # 1 + 2 + late 4
    assert rows[_late_t(11, 0)].sum_v == 10.0
    assert rows[_late_t(12, 0)].sum_v == 20.0


def test_win_time_stream_beyond_watermark_dropped(spark, tmp_path):
    """An event older than the watermark arrives after its window was
    finalized: it is DROPPED — the already-emitted window is not
    re-emitted or amended (append-mode policy), so the final result
    equals the batch reference computed WITHOUT the too-late row."""
    from faxe_spark.streaming import win_time_stream

    schema = "key string, value double, ts timestamp"
    _write_rows(spark, tmp_path, "b1", [
        ("a", 1.0, _late_t(10, 10)),
        ("a", 2.0, _late_t(10, 20)),
        ("a", 20.0, _late_t(12, 30)),  # advances watermark to 12:30 (0s delay)
    ], schema)
    # watermark updates lag one batch (a row late vs b1's max is still
    # accepted in the very next batch — Spark's bound is conservative,
    # verified empirically), so a filler batch makes 12:30 effective
    _write_rows(spark, tmp_path, "b2", [
        ("a", 9.0, _late_t(13, 0)),
    ], schema)
    _write_rows(spark, tmp_path, "b3", [
        ("a", 4.0, _late_t(10, 30)),   # TOO LATE: watermark 12:30 already
                                       # passed the 10:00 window's end
        ("a", 5.0, _late_t(13, 30)),
    ], schema)
    read_schema = spark.read.parquet(str(tmp_path / "b1")).schema
    stream = (spark.readStream.schema(read_schema)
              .option("maxFilesPerTrigger", 1).parquet(str(tmp_path) + "/*"))
    agg = win_time_stream(stream, [("value", "sum", "sum_v"),
                                   ("value", "count", "n")],
                          ts_col="ts", period="1h", by=["key"],
                          watermark="0s")
    _run_available_now(agg, "late_drop")
    got = [(r["start"], r.sum_v, r.n) for r in spark.sql(
        "SELECT window.start AS start, sum_v, n FROM late_drop").collect()]
    w10 = [g for g in got if g[0] == _late_t(10, 0)]
    assert w10 == [(_late_t(10, 0), 3.0, 2)]    # late 4.0 excluded, one emission
    assert (_late_t(12, 0), 20.0, 1) in got


def test_session_window_stream_out_of_order_merge(spark, tmp_path):
    """Two session fragments 15 min apart (> the 10-min gap) are bridged
    by an out-of-order event delivered in a LATER micro-batch: the state
    store merges them into ONE session, matching the batch
    session_window reference over the same rows."""
    import pyspark.sql.functions as F

    from faxe_spark.streaming.windows import win_session_stream

    schema = "user_id string, value double, ts timestamp"
    _write_rows(spark, tmp_path, "b1", [
        ("u", 1.0, _late_t(10, 0)),
        ("u", 2.0, _late_t(10, 15)),   # 15 min gap: two sessions... so far
    ], schema)
    _write_rows(spark, tmp_path, "b2", [
        ("u", 3.0, _late_t(10, 8)),    # out-of-order bridge -> ONE session
    ], schema)
    _write_rows(spark, tmp_path, "b3", [
        ("u", 0.0, _late_t(14, 0)),    # close the session past the watermark
    ], schema)
    read_schema = spark.read.parquet(str(tmp_path / "b1")).schema
    stream = (spark.readStream.schema(read_schema)
              .option("maxFilesPerTrigger", 1).parquet(str(tmp_path) + "/*"))
    agg = win_session_stream(stream, [("value", "sum", "sum_v"),
                                      ("value", "count", "n")],
                             ts_col="ts", gap="10m", by=["user_id"],
                             watermark="1h")
    _run_available_now(agg, "sess_ooo")
    got = [(r["start"], r.sum_v, r.n) for r in spark.sql(
        "SELECT session.start AS start, sum_v, n FROM sess_ooo").collect()]
    merged = [g for g in got if g[0] == _late_t(10, 0)]
    assert merged == [(_late_t(10, 0), 6.0, 3)]  # one merged session

    # batch reference over the same (closed-session) rows
    batch = (spark.read.parquet(str(tmp_path) + "/*")
             .filter(F.col("ts") < F.lit(_late_t(14, 0)))
             .groupBy(F.session_window("ts", "10 minutes").alias("s"),
                      "user_id")
             .agg(F.sum("value").alias("sum_v"), F.count("*").alias("n")))
    want = [(r["s"]["start"], r.sum_v, r.n) for r in batch.collect()]
    assert sorted(got) == sorted(want)


def test_dedup_stream_beyond_horizon_replay_is_fresh(spark, tmp_path):
    """dropDuplicatesWithinWatermark state expires with the horizon: a
    replay arriving AFTER the watermark passed the original's event time
    + delay is a fresh document by design (the bounded-state contract;
    catching it requires the compacted seen table —
    test_recovery.test_incremental_dedup_compaction_across_restart)."""
    from faxe_spark.streaming.stateful import dedup_exact_stream

    schema = "doc_id long, text string, ts timestamp"
    _write_rows(spark, tmp_path, "b1", [
        (1, "alpha beta", _late_t(10, 0)),
    ], schema)
    _write_rows(spark, tmp_path, "b2", [
        (2, "filler doc", _late_t(12, 0)),  # watermark -> 11:30 for the NEXT
                                            # batch (one-batch lag)
    ], schema)
    _write_rows(spark, tmp_path, "b3", [
        (5, "filler two", _late_t(12, 5)),  # runs AT watermark 11:30: end-of-
                                            # batch eviction removes fp(1)
    ], schema)
    _write_rows(spark, tmp_path, "b4", [
        (3, "alpha beta", _late_t(12, 6)),  # beyond-horizon replay: FRESH
        (4, "alpha beta", _late_t(12, 7)),  # in-horizon replay of 3: dropped
    ], schema)
    read_schema = spark.read.parquet(str(tmp_path / "b1")).schema
    stream = (spark.readStream.schema(read_schema)
              .option("maxFilesPerTrigger", 1).parquet(str(tmp_path) + "/*"))
    out = dedup_exact_stream(stream, watermark="30 minutes")
    q = (out.writeStream.format("memory").queryName("dedup_horizon")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.doc_id for r in spark.sql("SELECT * FROM dedup_horizon").collect()}
    assert got == {1, 2, 3, 5}


def test_unicode_and_gopher_ops_run_on_streams(spark, tmp_path):
    """Round-6 text additions on a readStream: gopher_rules is a
    stateless Column expression and the two Arrow-batched pandas UDFs
    (normalize_unicode, fix_mojibake) are per-row projections — all
    three run unchanged on a stream, no streaming variants needed."""
    import datetime

    from faxe_spark.operators import text as text_ops

    schema = "doc_id long, text string, ts timestamp"
    moji = "café".encode("utf-8").decode("latin-1")
    _write_rows(spark, tmp_path, "b1", [
        (1, "cafe\u0301 menu", datetime.datetime(2024, 1, 1)),  # decomposed
        (2, moji, datetime.datetime(2024, 1, 1)),
    ], schema)
    read_schema = spark.read.parquet(str(tmp_path / "b1")).schema
    stream = spark.readStream.schema(read_schema).parquet(str(tmp_path) + "/*")
    out = text_ops.fix_mojibake(
        text_ops.normalize_unicode(text_ops.gopher_rules(stream)))
    q = (out.writeStream.format("memory").queryName("textops_u")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = {r.doc_id: r for r in
            spark.sql("SELECT * FROM textops_u").collect()}
    assert rows[1].text_nfc == "caf\u00e9 menu"   # NFC composed
    assert rows[1].gopher_pass is False              # 2 words < 50
    assert rows[2].text_fixed == "café"         # mojibake unwound


def test_subsequence_match_stream_across_batch_boundary(spark, tmp_path):
    """Streaming shape alerting: a planted pattern SPLIT across two
    micro-batches is detected — the per-key state carries exactly the
    last m-1 readings, so the window straddling the boundary scores."""
    import datetime

    from faxe_spark.streaming.stateful import subsequence_match_stream

    def t(i):
        return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=i)

    pattern = [0.0, 2.0, 5.0, 2.0, 0.0]
    schema = "sensor string, ts timestamp, value double"
    noise1 = [4.0, -3.0, 1.5, -0.5, 2.2, -4.1]
    # plant gain-3/offset-50 copy with its first 3 points in batch 1
    planted = [50.0 + 3.0 * x for x in pattern]
    b1_vals = noise1 + planted[:3]
    b2_vals = planted[3:] + [9.9, -8.8]
    _write_rows(spark, tmp_path / "src", "b1",
                [("s1", t(i), v) for i, v in enumerate(b1_vals)], schema)
    _write_rows(spark, tmp_path / "src", "b2",
                [("s1", t(len(b1_vals) + i), v)
                 for i, v in enumerate(b2_vals)], schema)
    read_schema = spark.read.parquet(str(tmp_path / "src" / "b1")).schema
    stream = (spark.readStream.schema(read_schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(tmp_path / "src") + "/*"))
    out = subsequence_match_stream(stream, pattern, key_col="sensor",
                                   max_dist=0.01)
    q = (out.writeStream.format("memory").queryName("seqmatch_s")
         .outputMode("append").trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM seqmatch_s").collect()
    assert len(rows) == 1, rows
    r = rows[0]
    assert r.key == "s1" and r.dist == pytest.approx(0.0, abs=1e-9)
    # the match ends at the planted copy's last element
    end_i = len(noise1) + len(pattern) - 1
    assert r.end_ts_ms == int(t(end_i).timestamp() * 1000)


def test_subsequence_match_stream_state_survives_restart(spark, tmp_path):
    """The m-1 tail persists in the state store: stop after the first
    half of a planted shape, restart on the same checkpoint with the
    second half, and the straddling window still fires."""
    import datetime

    from faxe_spark.streaming.stateful import subsequence_match_stream

    def t(i):
        return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=i)

    pattern = [1.0, 4.0, 2.0, 6.0]
    schema = "sensor string, ts timestamp, value double"
    planted = [10 + 2 * x for x in pattern]
    ck = str(tmp_path / "ck")

    out_dir = str(tmp_path / "out")

    def run_once():
        read_schema = spark.read.parquet(str(tmp_path / "src" / "b1")).schema
        stream = (spark.readStream.schema(read_schema)
                  .option("maxFilesPerTrigger", 1)
                  .parquet(str(tmp_path / "src") + "/*"))
        out = subsequence_match_stream(stream, pattern, key_col="sensor",
                                       max_dist=0.01)
        q = (out.writeStream.format("parquet").option("path", out_dir)
             .outputMode("append").trigger(availableNow=True)
             .option("checkpointLocation", ck).start())
        q.awaitTermination(120)

    _write_rows(spark, tmp_path / "src", "b1",
                [("s1", t(0), -3.0), ("s1", t(1), planted[0]),
                 ("s1", t(2), planted[1])], schema)
    run_once()
    assert spark.read.parquet(out_dir).count() == 0

    _write_rows(spark, tmp_path / "src", "b2",
                [("s1", t(3), planted[2]), ("s1", t(4), planted[3])],
                schema)
    run_once()
    rows = spark.read.parquet(out_dir).collect()
    assert len(rows) == 1
    assert rows[0].dist == pytest.approx(0.0, abs=1e-9)
    assert rows[0].end_ts_ms == int(t(4).timestamp() * 1000)


def test_subsequence_match_stream_equals_batch_reference(spark, tmp_path):
    """Cross-lane equivalence: the streaming matcher's detections over
    an arbitrary micro-batch split equal the batch op's windows under
    the same threshold — same z-norm, same distances, same windows."""
    import datetime
    import random

    from faxe_spark.operators import timeseries as tso
    from faxe_spark.streaming.stateful import subsequence_match_stream

    def t(i):
        return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=i)

    rng = random.Random(21)
    pattern = [1.0, -1.0, 2.0, 0.0, -2.0]
    vals = [rng.uniform(-4, 4) for _ in range(60)]
    # two planted copies at different gain/offset
    for at, (g, o) in ((15, (2.0, 30.0)), (40, (0.5, -7.0))):
        for i, x in enumerate(pattern):
            vals[at + i] = o + g * x
    rows = [("s1", t(i), v) for i, v in enumerate(vals)]
    schema = "sensor string, ts timestamp, value double"
    # arbitrary uneven micro-batch split: 13 / 27 / 20
    for name, lo, hi in (("b1", 0, 13), ("b2", 13, 40), ("b3", 40, 60)):
        _write_rows(spark, tmp_path / "src", name, rows[lo:hi], schema)

    read_schema = spark.read.parquet(str(tmp_path / "src" / "b1")).schema
    stream = (spark.readStream.schema(read_schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(tmp_path / "src") + "/*"))
    max_dist = 0.35
    out = subsequence_match_stream(stream, pattern, key_col="sensor",
                                   max_dist=max_dist)
    q = (out.writeStream.format("memory").queryName("seqmatch_eq")
         .outputMode("append").trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.awaitTermination(120)
    got = {(r.end_ts_ms, r.dist) for r in
           spark.sql("SELECT * FROM seqmatch_eq").collect()}

    batch = tso.subsequence_topk(
        spark.createDataFrame(rows, schema), pattern, key_col="sensor",
        ts_col="ts", value_col="value", k=len(vals), tiebreak=None)
    want = {(int(r.end_ts.timestamp() * 1000), r.dist)
            for r in batch.collect() if r.dist <= max_dist}
    assert got == want and len(want) >= 2


def test_state_change_stream_late_transition_golden(spark, tmp_path):
    """Late-data golden (VERDICT r6 #8): a state row arriving one
    micro-batch LATE (ts older than rows already processed) folds into
    the run current at arrival — no retroactive transition, but it DOES
    count into n_in_prev_run of the next transition (the documented
    arrival-order / last-write-wins policy)."""
    from faxe_spark.streaming.stateful import state_change_stream

    schema = "user_id long, in_state boolean, ts timestamp"
    _write_rows(spark, tmp_path, "b1", [
        (1, False, _late_t(10, 0)),
        (1, False, _late_t(10, 1)),
        (1, True, _late_t(10, 5)),     # transition: run 2 opens
    ], schema)
    _write_rows(spark, tmp_path, "b2", [
        (1, True, _late_t(10, 2)),     # LATE row: same state as current
    ], schema)
    _write_rows(spark, tmp_path, "b3", [
        (1, False, _late_t(10, 6)),    # transition: run 3 opens
    ], schema)
    read_schema = spark.read.parquet(str(tmp_path / "b1")).schema
    stream = (spark.readStream.schema(read_schema)
              .option("maxFilesPerTrigger", 1).parquet(str(tmp_path) + "/*"))
    out = state_change_stream(stream, key_col="user_id",
                              state_col="in_state", ts_col="ts")
    _run_available_now(out, "sc_late")
    got = sorted((r.run_id, r.ts_ms, r.in_state, r.n_in_prev_run)
                 for r in spark.sql("SELECT * FROM sc_late").collect())

    def ms(h, m):
        return int(_late_t(h, m).timestamp() * 1000)

    assert got == [
        (1, ms(10, 0), False, 0),   # first row: run 1 opens
        (2, ms(10, 5), True, 2),    # F-run had 2 rows
        # run 3 opens at 10:06; run 2 counted the ON-TIME 10:05 row AND
        # the LATE 10:02 row -> n_in_prev_run = 2 (the late row folded
        # into the current run; no retro transition was emitted)
        (3, ms(10, 6), False, 2),
    ]


def test_subsequence_match_stream_late_row_golden(spark, tmp_path):
    """Late-data golden (VERDICT r6 #8): a value row arriving one
    micro-batch late is APPENDED to the carried series in arrival
    order (the documented policy) — the windows it forms carry ITS
    timestamp as end_ts even though older rows follow it in event
    time."""
    from faxe_spark.streaming.stateful import subsequence_match_stream

    schema = "sensor string, value double, ts timestamp"
    _write_rows(spark, tmp_path, "b1", [
        ("s", 1.0, _late_t(10, 0)),
        ("s", 2.0, _late_t(10, 1)),
        ("s", 3.0, _late_t(10, 2)),   # ramp completes: match @10:02
    ], schema)
    _write_rows(spark, tmp_path, "b2", [
        ("s", 4.0, _late_t(10, 1, 30)),  # LATE (before 10:02)
        ("s", 5.0, _late_t(10, 4)),
    ], schema)
    read_schema = spark.read.parquet(str(tmp_path / "b1")).schema
    stream = (spark.readStream.schema(read_schema)
              .option("maxFilesPerTrigger", 1).parquet(str(tmp_path) + "/*"))
    out = subsequence_match_stream(stream, [1.0, 2.0, 3.0],
                                   key_col="sensor", ts_col="ts",
                                   value_col="value", max_dist=1e-9)
    _run_available_now(out, "sm_late")
    got = sorted((r.end_ts_ms, r.dist)
                 for r in spark.sql("SELECT * FROM sm_late").collect())

    def ms(h, m, s=0):
        return int(_late_t(h, m, s).timestamp() * 1000)

    # arrival-order series: 1,2,3 | 4(late ts 10:01:30), 5(ts 10:04) —
    # every consecutive triple is a perfect ramp; the late row's window
    # ends at ITS OWN (older) timestamp
    assert got == [
        (ms(10, 1, 30), 0.0),   # window (2,3,4) — end_ts is the late ts
        (ms(10, 2), 0.0),       # window (1,2,3) from batch 1
        (ms(10, 4), 0.0),       # window (3,4,5)
    ]


def test_round_half_up_matches_f_round(spark):
    """Pin (ADVICE r7, medium; VERDICT r8 #2): the stream lane's
    _round_half_up must equal a LIVE F.round on doubles at digits=10,
    including the exact halfway values where the previous Decimal(x)
    (exact-binary) form diverged (1.5e-10 -> Spark says 2e-10;
    exact-binary said 1e-10, because the nearest double to 1.5e-10
    sits just below the decimal halfway point). Spark rounds the
    shortest-roundtrip decimal repr (BigDecimal.valueOf) — Python's
    repr(float) is the same algorithm.

    This IS the halfway-value lane golden: a halfway double cannot
    arise inside subsequence_match itself — the dist is a sqrt, whose
    shortest-roundtrip repr essentially never terminates at 11
    fractional digits with a trailing 5 (a 2M-sample search over
    z-normed integer-grid windows found zero) — so the halfway
    contract is pinned here against the same F.round the batch lane
    applies (timeseries.py:395), while
    test_subsequence_match_stream_equals_batch_reference pins the
    end-to-end lanes on reachable dists."""
    import pyspark.sql.functions as F

    from faxe_spark.streaming.stateful import _round_half_up

    vals = [1.5e-10, 2.5e-10, 3.5e-10, 4.5e-10, 1.23456789015e-2,
            0.12345678905, 7.0710678118654755, 0.0, -1.5e-10,
            1.4142135623730951, 2.675e-9]
    df = spark.createDataFrame([(v,) for v in vals], "x double") \
        .select("x", F.round("x", 10).alias("r"))
    spark_r = {r.x: r.r for r in df.collect()}
    for v in vals:
        assert _round_half_up(v, 10) == spark_r[v], v


def test_collect_full_stream_late_row_golden(spark, tmp_path):
    """Late-data golden (VERDICT r7 #9): collect's buffer folds rows
    in ARRIVAL order — a late-arriving update (event time older than
    the buffered point) still applies, carries ITS OWN older ts_ms
    outward, and moves the buffer's ts BACKWARD; no reordering, no
    retroactive replay (the documented policy: bound disorder upstream
    with a watermark where it matters)."""
    import json

    from faxe_spark.streaming.stateful import collect_full_stream

    schema = "k string, v double, w double, ts timestamp"
    _write_rows(spark, tmp_path, "b1", [("k", 1.0, None, _late_t(10, 5))],
                schema)
    _write_rows(spark, tmp_path, "b2", [("k", 2.0, 9.0, _late_t(10, 2))],
                schema)  # LATE: older than the buffered 10:05
    _write_rows(spark, tmp_path, "b3", [("k", 3.0, None, _late_t(10, 6))],
                schema)
    read_schema = spark.read.parquet(str(tmp_path / "b1")).schema
    stream = (spark.readStream.schema(read_schema)
              .option("maxFilesPerTrigger", 1).parquet(str(tmp_path) + "/*"))
    out = collect_full_stream(stream, key_col="k",
                              payload_cols=["v", "w"],
                              update_when=True, update_mode="merge")
    _run_available_now(out, "collect_late")
    got = [(r.ts_ms, r.action, json.loads(r.payload))
           for r in spark.sql("SELECT * FROM collect_late "
                              "ORDER BY ts_ms, action").collect()]

    def ms(h, m):
        return int(_late_t(h, m).timestamp() * 1000)

    assert sorted(got) == sorted([
        (ms(10, 5), "add", {"v": 1.0}),
        # the late row UPDATES the newer buffer (arrival order) and its
        # own older ts rides out; merge keeps its w over the old point
        (ms(10, 2), "update", {"v": 2.0, "w": 9.0}),
        (ms(10, 6), "update", {"v": 3.0, "w": 9.0}),
    ])


def test_dsir_score_stream_matches_batch(spark):
    """DSIR scoring on a live stream: the weight map is frozen
    batch-side (the paper's fit-once contract) and dsir_score is a
    pure projection — no state, no watermark — so it runs NATIVELY on
    a streaming frame (the scan-stage claim in streaming form: arriving
    crawl batches are scored with zero extra machinery). Stream rows
    must equal the batch op row-for-row."""
    from faxe_spark.operators import trainprep as tp
    from faxe_spark.streaming import stream_parquet
    from faxe_spark.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    tgt = docs.filter(F.col("source").isin("src0", "src1"))
    w = {int(r.bucket): int(r.lam)
         for r in tp.dsir_weights(docs, tgt).collect()}

    s = stream_parquet(spark, f"{SF_SMOKE}/documents.parquet")
    out = tp.dsir_score(s, w).select(
        "doc_id", "score_sum", "n_features", "score")
    _run_available_now(out, "dsir_stream")
    got = {(r.doc_id, r.score_sum, r.n_features, r.score)
           for r in spark.sql("SELECT * FROM dsir_stream").collect()}

    want = {(r.doc_id, r.score_sum, r.n_features, r.score)
            for r in tp.dsir_score(docs, w).select(
                "doc_id", "score_sum", "n_features", "score").collect()}
    assert got == want and len(got) > 0


def test_join_stream_one_sided_traffic_still_flushes(spark, tmp_path):
    """Review find: continuous one-sided traffic must NOT starve the
    missing_timeout flush. Old form re-armed a flat timer whenever
    anything was pending, so a key streaming only 'a' rows never timed
    out and state grew without bound; now every pending row carries
    its arrival stamp and ages out even while new rows keep coming."""
    import datetime
    import os
    import time as _t

    from faxe_spark.streaming import stream_parquet
    from faxe_spark.streaming.stateful import join_stream

    t = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    src = str(tmp_path / "js1")
    os.makedirs(src)
    schema = "key bigint, ts timestamp, src string, value double"
    spark.createDataFrame([(5, t(0), "a", 1.0)], schema) \
        .repartition(1).write.mode("append").parquet(src)
    s = stream_parquet(spark, src)
    out = join_stream(s, key_col="key", src_col="src", value_col="value",
                      tolerance="1s", missing_timeout="2s", full=False)
    q = (out.writeStream.format("memory").queryName("js_onesided")
         .outputMode("append").trigger(processingTime="1 second").start())
    try:
        # keep one-sided traffic flowing while the first row ages out
        # (rows 100s apart in EVENT time so nothing pairs)
        deadline = _t.time() + 60
        i = 0
        while _t.time() < deadline:
            n = spark.sql(
                "SELECT count(*) c FROM js_onesided").collect()[0].c
            if n >= 1:
                break
            i += 1
            spark.createDataFrame([(5, t(0) + datetime.timedelta(
                seconds=100 * i), "a", 1.0 + i)], schema) \
                .repartition(1).write.mode("append").parquet(src)
            _t.sleep(2)
        rows = spark.sql("SELECT * FROM js_onesided").collect()
        assert len(rows) >= 1
        assert all(r.complete is False and r.b_value is None
                   for r in rows)
    finally:
        q.stop()


def test_collect_full_stream_update_wins_over_remove(spark, tmp_path):
    """Reference DISPATCH order (esp_collect.erl do_process :186-192):
    maybe_update_state runs first; maybe_remove only when the update
    did NOT fire (ChangedBool=false). With update_when=True the row
    matching remove_when must therefore UPDATE, not remove — remove is
    unreachable by design (ADVICE r8 high: definition order :243-261
    is not dispatch order)."""
    import datetime
    import json

    from faxe_spark.streaming import stream_parquet, collect_full_stream

    t = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    path = _write_rows(
        spark, tmp_path, "cfs_rm",
        [(1, t(0), 1.0, "x"), (1, t(1), 2.0, None),
         (1, t(2), -9.0, "gone"), (1, t(3), 3.0, None)],
        "key bigint, ts timestamp, v double, q string")
    s = stream_parquet(spark, path)
    out = collect_full_stream(
        s, key_col="key", payload_cols=["v", "q"],
        update_when=True,
        remove_when=lambda new, st: new.get("v", 0) < 0)
    _run_available_now(out, "cfs_rm")
    rows = [(json.loads(r.payload), r.action) for r in
            spark.sql("SELECT * FROM cfs_rm ORDER BY ts_ms").collect()]
    assert [a for _, a in rows] == ["add", "update", "update", "update"]
    assert rows[2][0] == {"v": -9.0, "q": "gone"}  # update wins, replace mode
    assert rows[3][0] == {"v": 3.0}


def test_collect_stream_null_values_are_noops(spark, tmp_path):
    """Review find: a NULL value row must neither add, update, nor
    churn — ('x', NULL, 'x') is ONE add, nothing else."""
    import datetime

    from faxe_spark.streaming import stream_parquet
    from faxe_spark.streaming.stateful import collect_stream

    t = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    path = _write_rows(
        spark, tmp_path, "cs_null",
        [(1, t(0), "x"), (1, t(1), None), (1, t(2), "x"), (1, t(3), None)],
        "key bigint, ts timestamp, v string")
    s = stream_parquet(spark, path)
    out = collect_stream(s, key_col="key", value_col="v")
    _run_available_now(out, "cs_null")
    rows = [(r.value, r.action) for r in
            spark.sql("SELECT * FROM cs_null ORDER BY ts_ms").collect()]
    assert rows == [("x", "add")]


def test_pending_rows_only_swallows_missing_input(spark, tmp_path):
    """Review find (r9, refined r10): a broken pending dir must be a
    LOUD error; 'no pending epochs yet' is ONLY a genuinely-missing
    path or a present-but-empty dir (`rm -rf pending/*` keeps the
    prefix — UNABLE_TO_INFER_SCHEMA, the r10 refinement). A dir with
    unreadable files still raises instead of silently resetting crawl
    state."""
    import pytest as _pytest

    from faxe_spark.streaming.stateful import _pending_rows

    missing = str(tmp_path / "nope")
    assert _pending_rows(spark, missing, 3) is None
    empty = tmp_path / "empty"
    empty.mkdir()
    assert _pending_rows(spark, str(empty), 3) is None
    # junk parquet raises (schema inference reads the broken footer)
    bad = tmp_path / "bad"
    (bad / "epoch=0").mkdir(parents=True)
    (bad / "epoch=0" / "part-0.parquet").write_bytes(b"not parquet")
    with _pytest.raises(Exception):
        _pending_rows(spark, str(bad), 3)


def test_collect_full_stream_active_key_age_eviction(spark, tmp_path):
    """Review find: max_age is PROCESSING time since ADD and must
    evict even a key that keeps receiving rows (the old flat timer
    re-armed on every batch and never fired). The evicted key's next
    row re-adds -> a second 'add' action appears."""
    import datetime
    import os
    import time as _t

    from faxe_spark.streaming import stream_parquet, collect_full_stream

    t = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    src = str(tmp_path / "cfs_age")
    os.makedirs(src)
    schema = "key bigint, ts timestamp, v double"
    spark.createDataFrame([(1, t(0), 0.0)], schema) \
        .repartition(1).write.mode("append").parquet(src)
    s = stream_parquet(spark, src)
    # update_when=False: arriving rows keep the key ACTIVE but never
    # change it, isolating the age sweep from update traffic
    out = collect_full_stream(s, key_col="key", payload_cols=["v"],
                              update_when=False, max_age="2s")
    q = (out.writeStream.format("memory").queryName("cfs_age")
         .outputMode("append").trigger(processingTime="1 second").start())
    try:
        deadline = _t.time() + 60
        i = 0
        while _t.time() < deadline:
            adds = spark.sql("SELECT count(*) c FROM cfs_age "
                             "WHERE action = 'add'").collect()[0].c
            if adds >= 2:
                break
            i += 1
            spark.createDataFrame([(1, t(i), float(i))], schema) \
                .repartition(1).write.mode("append").parquet(src)
            _t.sleep(1)
        adds = [r for r in spark.sql(
            "SELECT * FROM cfs_age WHERE action = 'add'").collect()]
        assert len(adds) >= 2    # evicted at added+max_age, re-added
    finally:
        q.stop()


# -- r10 FSM-lane review fixes: pins ----------------------------------------

def _dt(s):
    import datetime
    return datetime.datetime(2024, 1, 1, 0, 0, s)


def test_triggered_timeout_not_postponed_by_unrelated_traffic(spark, tmp_path):
    """r10 review find: the state stores the arming's absolute
    processing-time deadline, so steady non-trigger/non-cancel rows on
    an armed key cannot push the synthetic timeout out — with the old
    flat re-arm, this test's 0.6s-spaced traffic would keep a 2s
    timeout from ever firing."""
    import os

    from faxe_spark.streaming.stateful import triggered_timeout_stream

    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "key bigint, ts timestamp, trig boolean, cancel boolean"

    def feed(sec, trig):
        spark.createDataFrame([(1, _dt(sec), trig, False)], schema) \
            .repartition(1).write.mode("append").parquet(src)

    feed(0, True)                       # arm key 1
    s = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    out = triggered_timeout_stream(s, key_col="key", trigger_col="trig",
                                   cancel_col="cancel", timeout="2s")
    q = (out.writeStream.format("memory").queryName("tt_deadline")
         .outputMode("append").trigger(processingTime="500 milliseconds")
         .start())
    try:
        fired = 0
        deadline = time.time() + 30
        sec = 1
        while time.time() < deadline and not fired:
            time.sleep(0.6)
            feed(sec, False)            # steady unrelated traffic
            sec += 1
            fired = spark.sql(
                "SELECT count(*) c FROM tt_deadline WHERE fired"
            ).collect()[0].c
        assert fired > 0, \
            "steady traffic postponed the deadline-armed timeout"
    finally:
        q.stop()


def test_collect_full_emit_every_is_free_running(spark, tmp_path):
    """r10 review find: emit_every is an absolute next-emit deadline
    (last_emit + interval), so steady NON-updating traffic cannot
    postpone the periodic 'emit' row — with the old flat re-arm this
    test's 0.6s-spaced rows would keep a 2s emit timer from ever
    firing."""
    import os

    from faxe_spark.streaming import collect_full_stream

    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "key bigint, ts timestamp, v double"

    def feed(sec):
        spark.createDataFrame([(1, _dt(sec), 1.0)], schema) \
            .repartition(1).write.mode("append").parquet(src)

    feed(0)                              # the 'add'
    s = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    out = collect_full_stream(s, key_col="key", payload_cols=["v"],
                              update_when=False, emit_every="2s")
    q = (out.writeStream.format("memory").queryName("cfs_freerun")
         .outputMode("append").trigger(processingTime="500 milliseconds")
         .start())
    try:
        emits = 0
        deadline = time.time() + 30
        sec = 1
        while time.time() < deadline and not emits:
            time.sleep(0.6)
            feed(sec)                    # keeps the key active
            sec += 1
            emits = spark.sql(
                "SELECT count(*) c FROM cfs_freerun WHERE action='emit'"
            ).collect()[0].c
        assert emits > 0, "steady traffic postponed the periodic emit"
    finally:
        q.stop()


def _run_fsm(spark, tmp_path, df_rows, schema, build, name,
             files_per_trigger=None):
    """Shared FSM-lane golden runner (r10 verdict: the NaN/deadline bug
    class lived in lanes whose ad-hoc fixtures skewed clean-typed —
    every new FSM golden goes through this builder so NULL-bearing and
    multi-batch shapes are one argument away, not a rewrite).
    files_per_trigger=1 makes each row-group its own micro-batch."""
    from faxe_spark.streaming import stream_parquet

    src = str(tmp_path / name)
    if isinstance(df_rows[0], list):     # one parquet file per batch
        for batch in df_rows:
            spark.createDataFrame(batch, schema).repartition(1) \
                .write.mode("append").parquet(src)
    else:
        spark.createDataFrame(df_rows, schema).repartition(1) \
            .write.parquet(src)
    if files_per_trigger:
        stream = (spark.readStream.schema(spark.read.parquet(src).schema)
                  .option("maxFilesPerTrigger", files_per_trigger)
                  .parquet(src))
    else:
        stream = stream_parquet(spark, src)
    out = build(stream)
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    q.stop()
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_fsm_lanes_numeric_null_semantics(spark, tmp_path):
    """r10 review finds: numeric NULLs arrive from Arrow as NaN, not
    None. Pins per lane: value_diff emits a NULL diff for the null row
    and does NOT poison the next diff; collect treats the null as a
    no-op; change_detect keeps NULL as a comparable value (the batch
    lane's eqNullSafe semantics); state_change treats NULL as its own
    state instead of bool-coercing."""
    from faxe_spark.streaming.stateful import (change_detect_stream,
                                               collect_stream,
                                               state_change_stream,
                                               value_diff_stream)

    def run(df_rows, schema, build, name):
        return _run_fsm(spark, tmp_path, df_rows, schema, build, name)

    rows = run([(1, _dt(0), 1.0), (1, _dt(1), None), (1, _dt(2), 4.0)],
               "key bigint, ts timestamp, v double",
               lambda s: value_diff_stream(s, key_col="key", value_col="v"),
               "vd_nan")
    got = sorted((r.ts_ms, r.value, r.value_diff) for r in rows)
    assert [g[1] for g in got] == [1.0, None, 4.0]
    assert [g[2] for g in got] == [None, None, 3.0]   # 4-1, not NaN

    rows = run([(1, _dt(0), 5.0), (1, _dt(1), None), (1, _dt(2), 5.0)],
               "key bigint, ts timestamp, v double",
               lambda s: collect_stream(s, key_col="key", value_col="v"),
               "col_nan")
    assert [(r.value, r.action) for r in rows] == [("5.0", "add")]

    rows = run([(1, _dt(0), 3.0), (1, _dt(1), None), (1, _dt(2), 3.0)],
               "key bigint, ts timestamp, v double",
               lambda s: change_detect_stream(s, key_col="key",
                                              value_col="v"),
               "cd_nan")
    assert [r.value for r in sorted(rows, key=lambda r: r.ts_ms)] == \
        ["3.0", None, "3.0"]             # null IS a value, once per edge

    rows = run([(1, _dt(0), True), (1, _dt(1), None), (1, _dt(2), True)],
               "key bigint, ts timestamp, st boolean",
               lambda s: state_change_stream(s, key_col="key",
                                             state_col="st"),
               "sc_nan")
    got = [(r.in_state, r.run_id) for r in
           sorted(rows, key=lambda r: r.ts_ms)]
    assert got == [(True, 1), (None, 2), (True, 3)]


def test_join_stream_skips_null_src_and_value(spark, tmp_path):
    """r10 review find: a NULL src/value row is an absent-field no-op —
    it must neither crash float(None) nor buffer an unmatchable
    'None'-source row that full=false later flushes as a garbage
    all-NULL partial."""
    from faxe_spark.streaming import stream_parquet
    from faxe_spark.streaming.stateful import join_stream

    src = str(tmp_path / "join_nan")
    spark.createDataFrame(
        [(1, _dt(0), "a", 10.0), (1, _dt(0), None, 99.0),
         (1, _dt(1), "b", None), (1, _dt(0), "b", 20.0)],
        "key bigint, ts timestamp, src string, value double") \
        .repartition(1).write.parquet(src)
    out = join_stream(stream_parquet(spark, src), key_col="key",
                      src_col="src", value_col="value",
                      tolerance="5s", missing_timeout="2s", full=False)
    q = (out.writeStream.format("memory").queryName("join_nan")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    q.stop()
    rows = spark.sql("SELECT * FROM join_nan").collect()
    # exactly the one valid pair; no all-NULL garbage partials
    assert [(r.a_value, r.b_value, r.complete) for r in rows] == \
        [(10.0, 20.0, True)]


def test_sample_n_zero_fails_loud_both_lanes(spark):
    """r10 review find: n=0 must fail at construction, not as a
    runtime ZeroDivisionError (stream) or a silently-empty result
    (batch: Spark's integral % 0 is NULL)."""
    from faxe_spark.operators.filter import sample_nth
    from faxe_spark.streaming.stateful import sample_stream
    from faxe_spark.tables import load_table

    docs = load_table(spark, SF_SMOKE, "events")
    with pytest.raises(ValueError, match="n >= 1"):
        sample_nth(docs, 0, by=["user_id"])
    with pytest.raises(ValueError, match="n >= 1"):
        sample_stream(docs, key_col="user_id", n=0)


# ---------------------------------------------------------------------------
# state_sequence_stream (r11: the one §2.10 FSM node that had no
# streaming lane — esp_state_sequence.erl:47)
# ---------------------------------------------------------------------------

_SEQ_SCHEMA = "key bigint, ts timestamp, s0 boolean, s1 boolean, s2 boolean"


def _seq(sec, a, b, c, key=1):
    return (key, _dt(sec), a, b, c)


def test_state_sequence_stream_cross_batch(spark, tmp_path):
    """A sequence whose three steps land in three different
    micro-batches completes; start_ts_ms is the first step's event
    time (cross-batch FSM state carried in the state store)."""
    from faxe_spark.streaming.stateful import state_sequence_stream

    batches = [
        [_seq(0, True, False, False)],            # step 0
        [_seq(2, False, True, False)],            # step 1
        [_seq(4, False, False, True),             # completes
         _seq(5, True, False, False)],            # new seq, never done
    ]
    rows = _run_fsm(
        spark, tmp_path, batches, _SEQ_SCHEMA,
        lambda s: state_sequence_stream(
            s, key_col="key", step_cols=["s0", "s1", "s2"],
            within=["1h", "1h"], wallclock_cleanup=False),
        "seq_xbatch", files_per_trigger=1)
    assert [(r.key, r.ts_ms, r.start_ts_ms) for r in rows] == \
        [(1, _dt(4).timestamp() * 1000, _dt(0).timestamp() * 1000)]


def test_state_sequence_stream_event_timeout_resets(spark, tmp_path):
    """A step arriving beyond its `within` resets the FSM first and is
    then evaluated against step 0 (the reference's timer fires before
    the late arrival) — so a late s1 is dropped, but a late s0 STARTS a
    fresh sequence that can complete."""
    from faxe_spark.streaming.stateful import state_sequence_stream

    rows = _run_fsm(
        spark, tmp_path,
        [_seq(0, True, False, False),             # step 0 at t=0
         _seq(10, False, True, False),            # s1 late (>3s): reset
         _seq(20, True, False, False),            # fresh start
         _seq(22, False, True, False),            # in time
         _seq(23, False, False, True)],           # completes
        _SEQ_SCHEMA,
        lambda s: state_sequence_stream(
            s, key_col="key", step_cols=["s0", "s1", "s2"],
            within=["3s", "3s"], wallclock_cleanup=False),
        "seq_timeout")
    assert [(r.ts_ms, r.start_ts_ms) for r in rows] == \
        [(_dt(23).timestamp() * 1000, _dt(20).timestamp() * 1000)]


def test_state_sequence_stream_strict_vs_lazy(spark, tmp_path):
    """Interleaved non-matching points: strict resets (esp_state_
    sequence.erl:95-97, without re-evaluating the interloper against
    step 0), non-strict ignores them while the within clock keeps
    running (:98-99)."""
    from faxe_spark.streaming.stateful import state_sequence_stream

    data = [_seq(0, True, False, False),
            _seq(1, False, False, False),         # interloper
            _seq(2, False, True, False),
            _seq(3, False, False, True)]
    lazy = _run_fsm(
        spark, tmp_path, data, _SEQ_SCHEMA,
        lambda s: state_sequence_stream(
            s, key_col="key", step_cols=["s0", "s1", "s2"],
            within=["1h", "1h"], wallclock_cleanup=False),
        "seq_lazy")
    assert [(r.ts_ms, r.start_ts_ms) for r in lazy] == \
        [(_dt(3).timestamp() * 1000, _dt(0).timestamp() * 1000)]
    strict = _run_fsm(
        spark, tmp_path, data, _SEQ_SCHEMA,
        lambda s: state_sequence_stream(
            s, key_col="key", step_cols=["s0", "s1", "s2"],
            within=["1h", "1h"], strict=True, wallclock_cleanup=False),
        "seq_strict")
    assert strict == []


def test_state_sequence_stream_strict_no_reeval(spark, tmp_path):
    """Reference semantic pin: in strict mode a point failing the
    CURRENT step is consumed by the reset — it is NOT re-tried against
    step 0 (eval_false -> reset only). 'a a b c' therefore completes
    NOTHING in the FSM (while the batch lead()-analog flags the inner
    'a b c' — divergence documented in both docstrings)."""
    from faxe_spark.streaming.stateful import state_sequence_stream

    rows = _run_fsm(
        spark, tmp_path,
        [_seq(0, True, False, False),
         _seq(1, True, False, False),             # fails s1, consumed
         _seq(2, False, True, False),             # FSM at 0: fails s0
         _seq(3, False, False, True)],
        _SEQ_SCHEMA,
        lambda s: state_sequence_stream(
            s, key_col="key", step_cols=["s0", "s1", "s2"],
            within=["1h", "1h"], strict=True, wallclock_cleanup=False),
        "seq_noreeval")
    assert rows == []


def test_state_sequence_stream_null_steps_no_phantom(spark, tmp_path):
    """NULL lambda results (Arrow NaN or None) are False, not phantom
    matches — the r10 NaN-as-NULL guard applied to this lane; and a
    single-state sequence emits on every match."""
    from faxe_spark.streaming.stateful import state_sequence_stream

    rows = _run_fsm(
        spark, tmp_path,
        [_seq(0, True, False, False),
         (1, _dt(1), None, None, None),           # no phantom advance
         _seq(2, False, True, False),
         _seq(3, False, False, True)],
        _SEQ_SCHEMA,
        lambda s: state_sequence_stream(
            s, key_col="key", step_cols=["s0", "s1", "s2"],
            within=["1h", "1h"], wallclock_cleanup=False),
        "seq_null")
    assert [(r.ts_ms, r.start_ts_ms) for r in rows] == \
        [(_dt(3).timestamp() * 1000, _dt(0).timestamp() * 1000)]

    single = _run_fsm(
        spark, tmp_path,
        [_seq(0, True, False, False), _seq(1, True, False, False)],
        _SEQ_SCHEMA,
        lambda s: state_sequence_stream(
            s, key_col="key", step_cols=["s0"], within=[], wallclock_cleanup=False),
        "seq_single")
    assert [r.ts_ms for r in single] == \
        [_dt(0).timestamp() * 1000, _dt(1).timestamp() * 1000]


def test_state_sequence_stream_matches_batch(spark, tmp_path):
    """Lane equality on ordered data: the batch lead()-analog's flagged
    START rows correspond 1:1 to the FSM's (start_ts, end_ts) emissions
    on a fixture free of the documented 'a a b c' re-eval divergence
    and of overlapping matches."""
    from faxe_spark.operators.state import state_sequence
    from faxe_spark.streaming.stateful import state_sequence_stream

    data = []
    sec = 0
    for k in (1, 2):
        for pat in (["a", "b", "c"],             # complete
                    ["a", "b", "b"],             # stalls at s2
                    ["a", "b", "c"],             # complete
                    ["b", "c", "a"]):            # only trailing a
            for et in pat:
                data.append((k, _dt(sec := sec + 2), et))
    schema = "key bigint, ts timestamp, et string"

    import pyspark.sql.functions as F  # noqa: N812

    steps = [F.col("et") == v for v in ("a", "b", "c")]
    got = _run_fsm(
        spark, tmp_path, data, schema,
        lambda s: state_sequence_stream(
            s.withColumns({f"s{i}": c for i, c in enumerate(steps)}),
            key_col="key", step_cols=["s0", "s1", "s2"],
            within=["5s", "5s"], strict=True, wallclock_cleanup=False),
        "seq_batch_eq")
    got = {(r.key, r.start_ts_ms, r.ts_ms) for r in got}

    bdf = spark.createDataFrame(data, schema)
    flagged = state_sequence(
        bdf, [f"et = '{v}'" for v in ("a", "b", "c")],
        [5000, 5000], by=["key"], ts_col="ts")
    want = set()
    for r in flagged.filter("seq_complete").collect():
        start_ms = int(r.ts.timestamp() * 1000)
        want.add((r.key, start_ms))
    assert {(k, s) for k, s, _ in got} == want
    # FSM end = start of the 3rd consecutive row, rows 2s apart
    assert all(e - s == 4000 for _, s, e in got)


def test_state_sequence_stream_wallclock_timeout_not_postponed(spark, tmp_path):
    """Live mode (wallclock_cleanup=True): the reference's timer is
    wall-clock, so a mid-sequence key whose next step arrives in event
    time but BEYOND the armed processing-time deadline has been reset —
    and per the r10 deadline device, steady non-matching traffic must
    not postpone that deadline. A fresh full sequence afterwards still
    completes (the lane stays alive after a timer reset)."""
    import os

    from faxe_spark.streaming.stateful import state_sequence_stream

    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "key bigint, ts timestamp, s0 boolean, s1 boolean"

    def feed(sec, a, b):
        spark.createDataFrame([(1, _dt(sec), a, b)], schema) \
            .repartition(1).write.mode("append").parquet(src)

    feed(0, True, False)                 # step 0: arms a 2s deadline
    s = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    out = state_sequence_stream(s, key_col="key", step_cols=["s0", "s1"],
                                within=["2s"])
    q = (out.writeStream.format("memory").queryName("seq_wallclock")
         .outputMode("append").trigger(processingTime="500 milliseconds")
         .start())
    try:
        # steady unrelated traffic for ~4s of wall clock, event ts
        # within the 2s within-bound (so only the wall-clock timer
        # can reset the FSM)
        for i in range(6):
            time.sleep(0.65)
            feed(1, False, False)
        feed(1, False, True)             # s1 in event time (1s gap) —
        #                                  but the timer fired long ago
        time.sleep(4)                    # let the batches drain
        assert spark.sql("SELECT * FROM seq_wallclock").collect() == [], \
            "wall-clock timer did not reset the armed sequence"
        # lane alive: a fresh in-time sequence completes
        feed(10, True, False)
        time.sleep(0.2)
        feed(11, False, True)
        deadline = time.time() + 30
        got = []
        while time.time() < deadline and not got:
            time.sleep(0.5)
            got = spark.sql("SELECT * FROM seq_wallclock").collect()
        assert [(r.ts_ms, r.start_ts_ms) for r in got] == \
            [(int(_dt(11).timestamp() * 1000), int(_dt(10).timestamp() * 1000))]
    finally:
        q.stop()


def test_collect_full_tombstone_emits_once_then_freed(spark, tmp_path):
    """ADVICE r10 medium: with include_removed + emit_every, a removed
    key's tombstone rides exactly ONE periodic emission (tagged
    'remove') and is then deleted — esp_collect's emit_buffer_cleanup
    buffer_deletes after one tagged emission. The old update+re-arm
    emitted duplicate 'remove' rows forever and leaked the state."""
    import os

    from faxe_spark.streaming import collect_full_stream

    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "key bigint, ts timestamp, v double"

    def feed(sec, v):
        spark.createDataFrame([(1, _dt(sec), v)], schema) \
            .repartition(1).write.mode("append").parquet(src)

    feed(0, 1.0)                         # add
    s = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    out = collect_full_stream(
        s, key_col="key", payload_cols=["v"], update_when=False,
        # remove_when sees payload_cols only, so the kill signal must
        # be a payload value (sentinel), not a side column
        remove_when=lambda new, st: new.get("v") == -99.0,
        emit_every="1s", include_removed=True)
    q = (out.writeStream.format("memory").queryName("cfs_tomb")
         .outputMode("append").trigger(processingTime="300 milliseconds")
         .start())
    try:
        deadline = time.time() + 30
        while time.time() < deadline:          # wait for the add
            if spark.sql("SELECT * FROM cfs_tomb").collect():
                break
            time.sleep(0.3)
        feed(1, -99.0)                         # data-path 'remove' row
        deadline = time.time() + 30
        removes = 0
        while time.time() < deadline and removes < 2:
            removes = spark.sql(
                "SELECT count(*) c FROM cfs_tomb WHERE action='remove'"
            ).collect()[0].c
            time.sleep(0.3)
        assert removes == 2, "tombstone never rode a periodic emission"
        time.sleep(3.5)                        # >3 further emit ticks
        assert spark.sql(
            "SELECT count(*) c FROM cfs_tomb WHERE action='remove'"
        ).collect()[0].c == 2, "tombstone kept emitting after its one ride"
    finally:
        q.stop()
