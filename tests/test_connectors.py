"""Connector plumbing tests (SURVEY.md §2.1/§2.2) — everything that can
run without external services: file round-trips, literal-row sources,
memory sinks, a real localhost HTTP POST sink, and the declared-options
failure surface for broker/JDBC connectors (no broker in the container)."""

from __future__ import annotations

import json
import threading
import time

import pytest

from tests.conftest import SF_SMOKE

EVENTS = f"{SF_SMOKE}/events.parquet"


def test_file_source_batch_and_stream(spark, tmp_path):
    from faxe_spark.sources import file_source
    from faxe_spark.sinks import file_sink, memory_sink

    df = file_source(spark, EVENTS)
    n = df.count()
    assert n > 0

    # batch sink round-trip with partitioning (the 100 TB layout lever)
    out = str(tmp_path / "out.parquet")
    file_sink(df, out, partition_by=("event_type",), mode="overwrite")
    assert file_source(spark, out).count() == n

    # streaming read of the written directory through the memory sink
    # (FileStreamSource wants a directory; single-file streams go through
    # streaming.stream_parquet which handles the layout)
    s = file_source(spark, out, streaming=True)
    q = memory_sink(s, "conn_stream")
    q.awaitTermination(120)
    assert spark.sql("SELECT count(*) c FROM conn_stream").collect()[0].c == n


def test_json_rows_source_ts_millis(spark):
    from faxe_spark.sources import json_rows_source

    df = json_rows_source(spark, [
        '{"ts": 1700000000000, "code": 1, "val": 1.5}',
        {"ts": 1700000001000, "code": 2, "val": 2.5},
    ])
    rows = df.orderBy("code").collect()
    assert rows[0].ts.year == 2023  # epoch-ms converted to timestamp
    assert rows[1].val == 2.5


def test_http_post_sink_real_post(spark):
    """http_post (esp_http_post.erl:34): POST rows as a JSON array to a
    live localhost server and verify the received body."""
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from faxe_spark.sinks import http_post_sink

    received = []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            received.append(json.loads(body))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    server = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
        http_post_sink(df, url=f"http://127.0.0.1:{server.server_port}/ingest")
        assert len(received) == 1
        assert sorted(r["id"] for r in received[0]) == [1, 2]
    finally:
        server.shutdown()


def test_kafka_source_fails_cleanly_without_broker_jar(spark):
    """kafka_source declares options only; absent connector jar/broker
    surfaces as a normal Spark error at load, not a silent wrong result."""
    from faxe_spark.sources import kafka_source

    with pytest.raises(Exception, match="(?i)kafka"):
        kafka_source(spark, brokers="localhost:9092", topic="t").collect()


def test_jdbc_source_fails_cleanly_without_driver(spark):
    from faxe_spark.sources import jdbc_source

    with pytest.raises(Exception):
        jdbc_source(spark, url="jdbc:postgresql://localhost:5432/x",
                    query="SELECT 1").collect()


def test_tcp_send_sink_line_framing(spark):
    """tcp_send (esp_tcp_send.erl:24,47): newline-delimited JSON over a
    live localhost TCP server; socket opened executor-side."""
    import socket

    from faxe_spark.sinks import tcp_send_sink

    received = []
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.bind(("127.0.0.1", 0))
    srv.listen(8)
    port = srv.getsockname()[1]
    done = threading.Event()

    def serve():
        # one accept per partition connection until the test closes us
        while not done.is_set():
            try:
                conn, _ = srv.accept()
            except OSError:
                return
            with conn:
                buf = b""
                while chunk := conn.recv(4096):
                    buf += chunk
                received.extend(json.loads(l) for l in buf.splitlines() if l)

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    try:
        df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")],
                                   "id int, s string").repartition(2)
        tcp_send_sink(df, host="127.0.0.1", port=port)
        deadline = time.time() + 10
        while len(received) < 3 and time.time() < deadline:
            time.sleep(0.05)
        assert sorted(r["id"] for r in received) == [1, 2, 3]
    finally:
        done.set()
        srv.close()


def test_udp_send_sink_datagram_per_row(spark):
    """udp_send (esp_udp_send.erl:5): one JSON datagram per row."""
    import socket

    from faxe_spark.sinks import udp_send_sink

    srv = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    srv.bind(("127.0.0.1", 0))
    srv.settimeout(10)
    port = srv.getsockname()[1]

    df = spark.createDataFrame([(1,), (2,), (3,)], "id int")
    udp_send_sink(df, host="127.0.0.1", port=port)
    got = sorted(json.loads(srv.recvfrom(65536)[0])["id"] for _ in range(3))
    srv.close()
    assert got == [1, 2, 3]


def test_email_sink_builds_message(spark):
    """email (esp_email.erl:37-49): subject_field/body_field templating,
    one message per batch; transport injected (no SMTP in container)."""
    from faxe_spark.sinks import email_sink

    sent = []

    class FakeSMTP:
        def __init__(self, host, port):
            sent.append(("connect", host, port))

        def send_message(self, msg):
            sent.append(("msg", msg["Subject"], msg["To"], msg.get_content()))

        def quit(self):
            sent.append(("quit",))

    df = spark.createDataFrame(
        [("disk full", "host1 disk 99%"), ("disk full", "host2 disk 98%")],
        "alert string, detail string")
    email_sink(df, smtp_relay="smtp.example", from_address="faxe@example",
               to=["ops@example"], subject_field="alert", body_field="detail",
               smtp_factory=FakeSMTP)
    kinds = [s[0] for s in sent]
    assert kinds == ["connect", "msg", "quit"]
    _, subject, to, body = sent[1]
    assert subject == "disk full" and to == "ops@example"
    assert "host1 disk 99%" in body and "host2 disk 98%" in body


def test_socket_source_line_stream(spark):
    """tcp_recv_line (esp_tcp_recv_line.erl:40 {packet,line}, :57
    min_length): live localhost TCP server pushes JSON lines; the
    socket stream parses and filters them."""
    import socket

    from faxe_spark.sources import socket_source

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    lines = [b'{"id": 1, "v": 10.5}\n', b'{"id": 2, "v": 20.5}\n', b'x\n']

    def serve():
        conn, _ = srv.accept()
        with conn:
            for ln in lines:
                conn.sendall(ln)
            time.sleep(8)  # keep the connection open while Spark polls

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    df = socket_source(spark, host="127.0.0.1", port=port,
                       json_schema="id long, v double", min_length=5)
    q = (df.writeStream.format("memory").queryName("sock_t").start())
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            got = spark.sql("SELECT * FROM sock_t").collect()
            if len(got) >= 2:
                break
            time.sleep(0.3)
        rows = sorted((r.id, r.v) for r in spark.sql("SELECT * FROM sock_t").collect())
        assert rows == [(1, 10.5), (2, 20.5)]
    finally:
        q.stop()
        srv.close()


def test_http_get_source_one_shot(spark):
    """http_get (esp_http_get.erl:38): one GET -> typed 1-row DataFrame."""
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from faxe_spark.sources import http_get_source

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            body = json.dumps({"code": 7, "val": 3.25}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    server = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        df = http_get_source(
            spark, f"http://127.0.0.1:{server.server_port}/x",
            json_schema="code long, val double")
        row = df.collect()[0]
        assert (row.code, row.val) == (7, 3.25)
    finally:
        server.shutdown()


def test_http_poll_source_polls_live_server(spark):
    """http_get with `every` (esp_http_get.erl poll loop): the streaming
    poller GETs the localhost server repeatedly; each poll is one row."""
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from faxe_spark.sources import http_poll_source

    hits = []

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            hits.append(1)
            body = json.dumps({"n": len(hits)}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    server = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    out = http_poll_source(
        spark, f"http://127.0.0.1:{server.server_port}/poll",
        every="1s", json_schema="n long")
    q = (out.writeStream.format("memory").queryName("http_poll").start())
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            rows = spark.sql("SELECT n FROM http_poll WHERE n IS NOT NULL").collect()
            if len(rows) >= 2:
                break
            time.sleep(0.5)
        assert len(rows) >= 2, "poller produced fewer than 2 polls"
        assert len(hits) >= 2
    finally:
        q.stop()
        server.shutdown()


def test_udp_source_live_datagrams(spark):
    """udp_recv (esp_udp_recv.erl:45): datagrams sent to the listener
    surface as streaming rows; changed=True drops consecutive dups."""
    import socket

    from faxe_spark.sources import udp_source

    lis = udp_source(spark, json_schema="id long, v double", changed=True)
    q = (lis.df.writeStream.format("memory").queryName("udp_t").start())
    snd = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    try:
        msgs = [b'{"id": 1, "v": 1.5}', b'{"id": 1, "v": 1.5}',  # dup dropped
                b'{"id": 2, "v": 2.5}']
        deadline = time.time() + 45
        got = []
        while time.time() < deadline:
            for m in msgs:
                snd.sendto(m, ("127.0.0.1", lis.port))
            time.sleep(1.0)
            got = sorted({(r.id, r.v) for r in spark.sql("SELECT * FROM udp_t").collect()})
            if len(got) >= 2:
                break
        assert got == [(1, 1.5), (2, 2.5)]
    finally:
        q.stop()
        snd.close()
        lis.stop()


def test_http_listen_source_receives_posts(spark):
    """http_listen (esp_http_listen.erl:30): POSTed ndjson bodies become
    streaming rows; wrong path 404s; basic auth gates when configured."""
    import urllib.request

    from faxe_spark.sources import http_listen_source

    lis = http_listen_source(spark, path="/ingest",
                             json_schema="id long, v double",
                             user="u", password="p")
    q = (lis.df.writeStream.format("memory").queryName("httpl_t").start())
    try:
        base = f"http://127.0.0.1:{lis.port}"
        auth = {"Authorization": "Basic dTpw"}  # u:p

        def post(path, body, headers=None):
            req = urllib.request.Request(base + path, data=body.encode(),
                                         headers=headers or {}, method="POST")
            try:
                with urllib.request.urlopen(req, timeout=5) as r:
                    return r.status
            except urllib.error.HTTPError as e:
                return e.code

        assert post("/ingest", '{"id":1,"v":1.5}\n{"id":2,"v":2.5}', auth) == 200
        assert post("/ingest", '{"id":9,"v":9.9}') == 401  # no auth
        assert post("/other", '{"id":9,"v":9.9}', auth) == 404

        deadline = time.time() + 45
        got = []
        while time.time() < deadline:
            got = sorted((r.id, r.v) for r in
                         spark.sql("SELECT * FROM httpl_t").collect())
            if len(got) >= 2:
                break
            time.sleep(0.5)
        assert got == [(1, 1.5), (2, 2.5)]
    finally:
        q.stop()
        lis.stop()


def test_tcp_serve_sink_broadcasts_to_clients(spark):
    """tcp_serve (esp_tcp_serve.erl:50-86): clients CONNECT TO US and
    receive each row as line-framed JSON; rows with no client connected
    are dropped (open=false path)."""
    import socket

    from faxe_spark.sinks import tcp_serve_sink

    srv = tcp_serve_sink()
    try:
        df = spark.createDataFrame([(1, "a")], "id int, s string")
        # no client yet: pushed rows go nowhere, last_item still records
        assert srv.push(df) == 0
        assert srv.last_item == {"id": 1, "s": "a"}

        c1 = socket.create_connection(("127.0.0.1", srv.port), timeout=5)
        c2 = socket.create_connection(("127.0.0.1", srv.port), timeout=5)
        time.sleep(0.5)  # acceptor picks them up
        df2 = spark.createDataFrame([(2, "b"), (3, "c")], "id int, s string")
        assert srv.push(df2) == 2
        for c in (c1, c2):
            c.settimeout(5)
            buf = b""
            while buf.count(b"\n") < 2:
                buf += c.recv(4096)
            ids = sorted(json.loads(l)["id"] for l in buf.strip().splitlines())
            assert ids == [2, 3]
        c1.close()
        c2.close()
    finally:
        srv.stop()


def test_tcp_poll_source_polls_live_server(spark):
    """tcppoll (esp_tcppoll.erl:30-90): periodic request/response —
    the poller sends the request, the device answers a CSV line that
    lands as prefix-numbered columns."""
    import socket

    from faxe_spark.sources import tcp_poll_source

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(8)
    port = srv.getsockname()[1]
    served = []
    done = threading.Event()

    def serve():
        while not done.is_set():
            try:
                srv.settimeout(0.5)
                conn, _ = srv.accept()
            except OSError:
                continue
            with conn:
                req = conn.recv(1024)
                served.append(req)
                conn.sendall(b"1.5,2.5,3.5,4.5\n")

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    out = tcp_poll_source(spark, host="127.0.0.1", port=port, every="1s")
    q = (out.writeStream.format("memory").queryName("tcp_poll").start())
    try:
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            rows = spark.sql(
                "SELECT * FROM tcp_poll WHERE payload IS NOT NULL").collect()
            if len(rows) >= 2:
                break
            time.sleep(0.5)
        assert len(rows) >= 2, "fewer than 2 successful polls"
        r = rows[0]
        assert (r.val_1, r.val_2, r.val_3, r.val_4) == (1.5, 2.5, 3.5, 4.5)
        assert served and served[0].startswith(b"get1")
    finally:
        q.stop()
        done.set()
        srv.close()


def test_kafka_sink_topic_routing_forms(spark):
    """esp_mqtt_publish one_of_params: exactly one of topic/topic_field/
    topic_expr; per-row routing lands in Kafka's native topic column
    (plan-level check — no broker in the container)."""
    import pyspark.sql.functions as F

    from faxe_spark.sinks import kafka_sink

    df = spark.createDataFrame([(1, "t/a")], "id int, dest string")
    with pytest.raises(ValueError, match="exactly one"):
        kafka_sink(df, brokers="b:9092")
    with pytest.raises(ValueError, match="exactly one"):
        kafka_sink(df, brokers="b:9092", topic="x", topic_field="dest")
    # the routed plan puts value+topic columns in front of the sink;
    # starting the write fails cleanly without the connector jar
    with pytest.raises(Exception, match="(?i)kafka|data.?source"):
        kafka_sink(df, brokers="localhost:9092", topic_field="dest",
                   streaming=False)
    with pytest.raises(Exception, match="(?i)kafka|data.?source"):
        kafka_sink(df, brokers="localhost:9092",
                   topic_expr=F.concat(F.lit("out/"), F.col("id")),
                   streaming=False)


def test_broker_bridge_fails_cleanly_without_broker(spark):
    from faxe_spark.sinks import broker_bridge

    with pytest.raises(Exception, match="(?i)kafka|data.?source"):
        broker_bridge(spark, source_brokers="localhost:9092",
                      source_topic="in", sink_brokers="localhost:9093")


def test_time_bucket_query_matches_reference_golden():
    """esp_crate_query.erl:218-225 golden SQL shape, byte-for-byte."""
    from faxe_spark.sources import time_bucket_query

    got = time_bucket_query(
        "SELECT COUNT(*) FROM table WHERE tag1 = 'test'",
        group_by_time="5m", time_field="time", group_by=["a", "b"])
    assert got == (
        "SELECT floor(EXTRACT(epoch FROM time)/300)*300 AS time_gb, "
        "COUNT(*) FROM table WHERE tag1 = 'test' "
        "AND time >= $1 AND time <= $2 "
        "GROUP BY time_gb, a, b ORDER BY time_gb DESC")
    # time_group_test: 7m -> 420s buckets
    assert "floor(EXTRACT(epoch FROM ts)/420)*420 AS ts_gb" in \
        time_bucket_query("SELECT 1 FROM t", group_by_time="7m")
    # no WHERE in user query -> range becomes the WHERE clause
    assert " WHERE ts >= $1 AND ts <= $2" in \
        time_bucket_query("SELECT sum(v) FROM t", group_by_time="1h")


def test_time_bucket_query_rejects_unrewritable_shapes():
    """Appending the range + GROUP BY after a body that already has
    GROUP BY/ORDER BY/LIMIT/HAVING or a subquery would be invalid SQL —
    reject loudly; and WHERE detection is a word match, so a column
    named warehouse_where_id must not flip the conjunction."""
    import pytest

    from faxe_spark.sources import time_bucket_query

    for bad in ("SELECT a, count(*) FROM t GROUP BY a",
                "SELECT a FROM t ORDER BY a",
                "SELECT a FROM t LIMIT 10",
                "SELECT a, count(*) FROM t GROUP BY a HAVING count(*) > 1",
                "SELECT a FROM (SELECT a FROM t) q"):
        with pytest.raises(ValueError, match="cannot rewrite"):
            time_bucket_query(bad, group_by_time="5m")
    got = time_bucket_query(
        "SELECT warehouse_where_id FROM t", group_by_time="5m")
    assert " WHERE ts >= $1" in got and " AND ts >= $1" not in got


def test_time_bucket_query_executes_in_duckdb():
    """The rewrite isn't just string-shaped — it runs: bucket an events
    query in DuckDB (CrateDB's EXTRACT(epoch ...) dialect matches)."""
    import duckdb

    from faxe_spark.sources import time_bucket_query
    from tests.conftest import SF_ORACLE

    sql = time_bucket_query(
        "SELECT count(*) AS n FROM events",
        group_by_time="6h", time_field="ts")
    runnable = sql.replace("$1", "TIMESTAMP '2020-01-01'") \
                  .replace("$2", "TIMESTAMP '2030-01-01'")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF_ORACLE}/events.parquet')")
    rows = con.execute(runnable).fetchall()
    assert len(rows) > 1
    buckets = [r[0] for r in rows]
    assert buckets == sorted(buckets, reverse=True)  # ORDER BY _gb DESC
    assert all(b % 21600 == 0 for b in buckets)      # 6h epoch buckets
    assert sum(r[1] for r in rows) == con.execute(
        "SELECT count(*) FROM events").fetchone()[0]


def test_embedded_broker_roundtrip_with_time_parsing(spark):
    """Produce -> consume round-trip through the embedded broker stub:
    dt_field/dt_format payload-time parsing (esp_mqtt_subscribe.erl:57),
    dedup_size bounded dedup (esp_amqp_consume.erl:96,162-184), and
    include_topic injection — the option surface that previously had
    only clean-failure tests."""
    from faxe_spark.sources.embedded_broker import (
        EmbeddedBroker, broker_sink, broker_source)

    broker = EmbeddedBroker()
    try:
        # float-micros payload time (flowdata_tests.erl:425-502 format)
        broker.publish("m1", {"id": 1, "t": 1700000000.000001, "v": 1.5})
        broker.publish("m1", {"id": 1, "t": 1700000000.000001, "v": 1.5})  # dup
        broker.publish("m1", {"id": 2, "t": 1700000060.5, "v": 2.5})
        df = broker_source(
            spark, broker, "m1", value_schema="id long, t double, v double",
            dt_field="t", dt_format="float_micro", dedup_size=10)
        q = df.writeStream.format("memory").queryName("ebk1").start()
        try:
            deadline = time.time() + 30
            while time.time() < deadline:
                if spark.sql("SELECT * FROM ebk1").count() >= 2:
                    break
                time.sleep(0.3)
            rows = {(r.id, r.ts.isoformat(), r.topic)
                    for r in spark.sql("SELECT * FROM ebk1").collect()}
        finally:
            q.stop()
        # dedup dropped the duplicate id=1 payload; float_micro rounds
        # to ms (flowdata grip-fixture semantics, paths.py:141)
        assert rows == {
            (1, "2023-11-14T22:13:20", "m1"),
            (2, "2023-11-14T22:14:20.500000", "m1"),
        }

        # sink side: per-row topic routing (esp_mqtt_publish topic_field)
        out = spark.createDataFrame(
            [("alpha", 1), ("beta", 2), ("alpha", 3)], "route string, n int")
        n = broker_sink(out, broker, topic_field="route")
        assert n == 3
        assert [json.loads(m)["n"] for m in broker.messages("alpha")] == [1, 3]
        assert [json.loads(m)["n"] for m in broker.messages("beta")] == [2]
    finally:
        broker.stop()


def test_dfs_mqtt_subscribe_via_embedded_broker(spark):
    """A DFS script's mqtt_subscribe node (esp_mqtt_subscribe.erl:47)
    compiles against the embedded broker and consumes published
    payloads with dt_field time parsing — the node's option surface
    executed from the TEXT front-end, not just the Python API."""
    from faxe_spark.dfs import DFSCompiler
    from faxe_spark.sources.embedded_broker import EmbeddedBroker

    broker = EmbeddedBroker()
    try:
        broker.publish("plant/1", {"code": 224, "t": 1700000000000, "v": 1.5})
        broker.publish("plant/1", {"code": 334, "t": 1700000060000, "v": 9.0})
        script = """
        |mqtt_subscribe()
        .topic('plant/1')
        .dt_field('t')
        |where(lambda: "v" > 2)
        """
        df = DFSCompiler(spark, broker=broker).run(script)
        assert df.isStreaming
        q = df.writeStream.format("memory").queryName("dfsmq").start()
        try:
            deadline = time.time() + 30
            while time.time() < deadline:
                if spark.sql("SELECT * FROM dfsmq").count() >= 1:
                    break
                time.sleep(0.3)
            rows = [(r.code, r.ts.isoformat(), r.topic)
                    for r in spark.sql("SELECT * FROM dfsmq").collect()]
        finally:
            q.stop()
        assert rows == [(334, "2023-11-14T22:14:20", "plant/1")]
    finally:
        broker.stop()


def test_dfs_http_listen_compiles_and_ingests(spark):
    """A DFS script's http_listen node compiles to the embedded HTTP
    listener; a live POST lands in the stream (esp_http_listen.erl:30)."""
    import urllib.request

    from faxe_spark.dfs import DFSCompiler

    c = DFSCompiler(spark)
    df = c.run("|http_listen()\n.payload_type('json')\n")
    assert df.isStreaming and c.listeners
    listener = c.listeners[0]
    q = df.writeStream.format("memory").queryName("dfshttp").start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{listener.port}/",
            data=b'{"code": 7}', method="POST")
        urllib.request.urlopen(req, timeout=10)
        deadline = time.time() + 30
        rows = []
        while time.time() < deadline:
            rows = [r.data for r in spark.sql("SELECT * FROM dfshttp").collect()]
            if rows:
                break
            time.sleep(0.3)
        assert rows == ['{"code": 7}']
    finally:
        q.stop()
        listener.stop()


# -- Modbus-TCP live lane (round 4) ----------------------------------------

def test_modbus_decode_formats():
    """Register decoding mirrors esp_modbus_read.erl:77 OUT_TYPES,
    big-endian register order."""
    import struct

    from faxe_spark.sources.modbus import decode_registers

    assert decode_registers([0xFFFF], "int16", True) == -1
    assert decode_registers([0xFFFF], "int16", None) == 65535
    assert decode_registers([0x0001, 0x86A0], "int32", False) == 100000
    assert decode_registers([0xFFFF, 0xFFFF], "int32", True) == -1
    f = decode_registers(list(struct.unpack(">HH", struct.pack(">f", 1.5))),
                         "float32")
    assert f == 1.5
    d = decode_registers(
        list(struct.unpack(">HHHH", struct.pack(">d", 2.25))), "double")
    assert d == 2.25
    assert decode_registers([0x4849, 0x0000], "ascii") == "HI"
    assert decode_registers([1, 0, 7], "coils") == [True, False, True]


def test_modbus_client_server_round_trip():
    from faxe_spark.sources.modbus import (ModbusClient, ModbusServer,
                                           set_float32)

    hregs = {}
    set_float32(hregs, 100, 42.5)
    srv = ModbusServer(hregs=hregs, iregs={7: 1234},
                       coils={3: 1}, discrete={0: 1, 2: 1})
    try:
        c = ModbusClient("127.0.0.1", srv.port)
        assert c.read("iregs", 7, 1) == [1234]
        assert c.read("coils", 2, 3) == [0, 1, 0]
        assert c.read("inputs", 0, 3) == [1, 0, 1]
        from faxe_spark.sources.modbus import decode_registers

        assert decode_registers(c.read("hregs", 100, 2), "float32") == 42.5
        c.close()
    finally:
        srv.stop()


def test_modbus_read_plan_splits_merged_runs():
    """The corpus modbus_multi shape: back-to-back float32 registers
    coalesce into few wire requests; read_plan must split the merged
    payload back per alias exactly."""
    from faxe_spark.plc import plan_modbus_reads
    from faxe_spark.sources.modbus import (ModbusClient, ModbusServer,
                                           set_float32)

    starts = [2701, 2699, 2709, 2707, 2717, 2715, 3009]
    names = ["aer", "aed", "rer", "red", "apr", "apd", "mcv"]
    hregs = {}
    for i, s in enumerate(starts):
        set_float32(hregs, s, float(10 * (i + 1)))
    plan = plan_modbus_reads(["hregs"] * 7, starts, [2] * 7, names,
                             outputs=["float32"] * 7)
    # 2699+2701, 2707+2709, 2715+2717 merge; 3009 alone -> 4 requests
    assert len(plan) == 4
    srv = ModbusServer(hregs=hregs)
    try:
        c = ModbusClient("127.0.0.1", srv.port)
        vals = c.read_plan(plan)
        assert vals == {n: float(10 * (i + 1))
                        for i, n in enumerate(names)}
        c.close()
    finally:
        srv.stop()


def test_modbus_read_df_single_tick(spark):
    from faxe_spark.sources.modbus import ModbusServer, modbus_read_df

    srv = ModbusServer(hregs={5: 7, 6: 9})
    try:
        df = modbus_read_df(
            spark, host="127.0.0.1", port=srv.port,
            functions=["hregs", "hregs"], starts=[5, 6], counts=[1, 1],
            aliases=["a", "b"], outputs=["int16", "int16"])
        [row] = df.collect()
        assert (row.a, row.b) == (7, 9) and row.ts is not None
    finally:
        srv.stop()


def test_modbus_dfs_plan_executes_against_live_server(spark):
    """Bridge: the wire plan a DFS modbus script compiles to executes
    against the embedded device (esp_modbus_read.erl:81 tick)."""
    import pathlib

    from faxe_spark.dfs import DFSCompiler
    from faxe_spark.sources.modbus import (ModbusClient, ModbusServer,
                                           set_float32)

    text = pathlib.Path(
        "/root/reference/dfs/other/modbus_multi_test.dfs").read_text()
    c = DFSCompiler(spark)
    c.run(text)
    [plan] = c.plc_plans
    hregs = {}
    expect = {}
    for run in plan["requests"]:
        width = run.amount // len(run.aliases)
        for i, alias in enumerate(run.aliases):
            v = float(len(expect) + 1)
            set_float32(hregs, run.start + i * width, v)
            expect[alias] = v
    srv = ModbusServer(hregs=hregs)
    try:
        cl = ModbusClient("127.0.0.1", srv.port, unit=plan["device"])
        assert cl.read_plan(plan["requests"]) == expect
        cl.close()
    finally:
        srv.stop()


# -- crate_out db_fields mapping parity (round 4) --------------------------

def test_crate_out_statement_golden():
    """Statement matches esp_crate_out.erl:434-447 byte shape: ts
    first, db_fields, optional remaining column, positional binds."""
    from faxe_spark.sinks import crate_out_statement

    assert crate_out_statement("tbl", ["id", "df", "vs"]) == \
        "INSERT INTO doc.tbl (ts, id, df, vs) VALUES (?, ?, ?, ?)"
    assert crate_out_statement(
        "oracle_test", ["id", "df", "vs", "topic"],
        remaining_fields_as="data_obj") == \
        ("INSERT INTO doc.oracle_test (ts, id, df, vs, topic, data_obj) "
         "VALUES (?, ?, ?, ?, ?, ?)")


def test_crate_out_args_reshape(spark):
    """bulk_args layout (esp_crate_out.erl:374-380): null-safe field
    reads, remaining fields as one JSON object, content dedup."""
    import json

    from faxe_spark.sinks import crate_out_args

    df = spark.createDataFrame(
        [(1000, 7, "a", 2.5), (1000, 7, "a", 2.5), (2000, 8, "b", 0.5)],
        "ts long, id int, tag string, val double")
    out = crate_out_args(df, ["id", "missing.path"],
                         remaining_fields_as="data_obj")
    rows = sorted(out.collect(), key=lambda r: r.ts)
    assert len(rows) == 2  # identical content row deduped (:384-395)
    assert rows[0].arg_0 == 7 and rows[0].arg_1 is None
    assert json.loads(rows[0].arg_rem) == {"tag": "a", "val": 2.5}
    assert json.loads(rows[1].arg_rem) == {"tag": "b", "val": 0.5}


def test_embedded_broker_bridge_round_trip(spark):
    """mqtt_amqp_bridge live lane (esp_mqtt_amqp_bridge.erl): messages
    published on broker A's topic stream through the bridge and arrive
    on broker B, content-unaware, order preserved."""
    from faxe_spark.sinks import embedded_broker_bridge
    from faxe_spark.sources.embedded_broker import EmbeddedBroker

    a, b = EmbeddedBroker(), EmbeddedBroker()
    payloads = ['{"n": 1}', '{"n": 2}', '{"n": 3}']
    for p in payloads:
        a.publish("plant/line1", p)
    q = None
    try:
        q = embedded_broker_bridge(spark, source=a, source_topic="plant/line1",
                                   sink=b, sink_topic="mirror")
        deadline = time.time() + 30
        while time.time() < deadline and len(b.messages("mirror")) < 3:
            time.sleep(0.3)
        assert b.messages("mirror") == payloads
    finally:
        if q:
            q.stop()
        a.stop()
        b.stop()


# -- s7read live lane (round 5) --------------------------------------------

def test_s7_decode_bit_order_and_types():
    """Decode fidelity vs esp_s7read.erl:515-549: bool_byte bits are
    LSB-first within each byte (the prepare_byte_list reversal), ints
    are big-endian signed, strings drop control bytes."""
    import struct

    from faxe_spark.sources.s7 import decode_payload

    # byte 0b00000101 -> bits [1,0,1,0,0,0,0,0]
    assert decode_payload("bool_byte", b"\x05")[:4] == [1, 0, 1, 0]
    assert decode_payload("int", struct.pack(">hh", -7, 300)) == [-7, 300]
    assert decode_payload("word", struct.pack(">H", 0xFFFE)) == [0xFFFE]
    assert decode_payload("d_int", struct.pack(">i", -100000)) == [-100000]
    assert decode_payload("float", struct.pack(">f", 2.5)) == [2.5]
    assert decode_payload("string", b"AB\x00\x1fC") == ["ABC"]
    assert decode_payload("sint", b"\xff\x7f") == [-1, 127]


def test_s7_client_server_round_trip():
    """Live ISO-on-TCP/S7comm conversation: COTP connect, setup comm,
    read-var over a coalesced plan with packed bools, merged words,
    floats — split back per alias exactly (brief r5 item 6)."""
    import struct

    from faxe_spark.plc import plan_bulk_reads
    from faxe_spark.sources.s7 import S7Client, S7Server

    db = bytearray(200)
    db[30] = 0b00000101             # X30.0=1, X30.2=1
    db[31] = 0b00000001             # X31.0=1
    struct.pack_into(">H", db, 8, 1234)
    struct.pack_into(">H", db, 10, 4321)
    struct.pack_into(">f", db, 62, 42.5)
    struct.pack_into(">f", db, 66, -1.25)
    addrs = ["DB11.DBX30.0", "DB11.DBX30.2", "DB11.DBX31.0",
             "DB11.DBW8", "DB11.DBW10",
             "DB11.DBD62.FLOAT", "DB11.DBD66.FLOAT"]
    names = ["b0", "b2", "b9", "w8", "w10", "f62", "f66"]
    plan = plan_bulk_reads(addrs, names)
    # bools pack into ONE 2-byte run (X31.0 joins at bit 0 of the
    # next byte, esp_s7read.erl:395-425); words merge; floats merge -> 3
    assert len(plan) == 3
    srv = S7Server({11: bytes(db)})
    try:
        c = S7Client("127.0.0.1", srv.port, rack=0, slot=1)
        vals = c.read_plan(plan)
        assert vals == {"b0": 1, "b2": 1, "b9": 1, "w8": 1234,
                        "w10": 4321, "f62": 42.5, "f66": -1.25}
        c.close()
    finally:
        srv.stop()


def test_s7_plan_chunking_across_pdus():
    """A plan bigger than one PDU budget splits across read-var
    requests (the bit_count budget, esp_s7read.erl:472-486) and still
    lands every alias."""
    import struct

    from faxe_spark.plc import plan_bulk_reads
    from faxe_spark.sources.s7 import S7Client, S7Server, chunk_plan

    # 40 non-contiguous words: 40 runs of 2 bytes each
    addrs = [f"DB2.DBW{4 * i}" for i in range(40)]
    names = [f"t{i}" for i in range(40)]
    db = bytearray(400)
    for i in range(40):
        struct.pack_into(">H", db, 4 * i, 100 + i)
    plan = plan_bulk_reads(addrs, names)
    assert len(plan) == 40
    assert len(chunk_plan(plan, max_items=18, pdu_size=480)) >= 3
    srv = S7Server({2: bytes(db)})
    try:
        c = S7Client("127.0.0.1", srv.port)
        vals = c.read_plan(plan)
        assert vals == {f"t{i}": 100 + i for i in range(40)}
        c.close()
    finally:
        srv.stop()


def test_s7_dfs_plan_executes_against_live_server(spark):
    """Bridge: the wire plan the reference's own s7_test.dfs compiles
    to (comma addresses, esp_s7read.erl:70 syntax) executes against
    the embedded device — the modbus_multi bridge, S7 edition."""
    import pathlib
    import struct

    from faxe_spark.dfs import DFSCompiler
    from faxe_spark.sources.s7 import S7Client, S7Server

    text = pathlib.Path(
        "/root/reference/dfs/other/s7_test.dfs").read_text()
    c = DFSCompiler(spark)
    c.run(text)
    plan = next(p for p in c.plc_plans if p["node"] == "s7read")
    # .vars('DB4,R1','DB4,DWORD7','DB4,DInt22','DB4,Int42','DB4,Int106')
    db = bytearray(200)
    struct.pack_into(">f", db, 1, 3.5)
    struct.pack_into(">I", db, 7, 77777)
    struct.pack_into(">i", db, 22, -22222)
    struct.pack_into(">h", db, 42, -42)
    struct.pack_into(">h", db, 106, 106)
    srv = S7Server({4: bytes(db)})
    try:
        cl = S7Client("127.0.0.1", srv.port, rack=plan["rack"],
                      slot=plan["slot"])
        vals = cl.read_plan(plan["requests"])
        assert vals == {"StrapDrv.ActMotorTorque": 3.5,
                        "StGa.ActVal": 77777,
                        "LiftDrv.TargetPos": -22222,
                        "LiftDrv.SetpVelo": -42,
                        "LiftDrv.ActVelo": 106}
        cl.close()
    finally:
        srv.stop()


def test_s7read_df_single_tick(spark):
    import struct

    from faxe_spark.sources.s7 import S7Server, s7read_df

    db = bytearray(16)
    struct.pack_into(">h", db, 0, 5)
    struct.pack_into(">h", db, 2, 9)
    srv = S7Server({1: bytes(db)})
    try:
        df = s7read_df(spark, host="127.0.0.1", port=srv.port,
                       addresses=["DB1,Int0", "DB1,Int2"],
                       aliases=["a", "b"])
        [row] = df.collect()
        assert (row.a, row.b) == (5, 9) and row.ts is not None
    finally:
        srv.stop()


# -- influx_out live lane (round 5) ----------------------------------------

def test_influx_line_encoding_matches_reference():
    """influx_line.erl value rules: ints bare (or 'i' when
    encode_integer), floats compact <=12 decimals, bools t/f, strings
    raw, map/list fields dropped (filter_fields), tags comma-joined
    onto the measurement, ms timestamp last."""
    from faxe_spark.sinks.influx import encode_point

    assert encode_point("m", {"v": 42}, {}, 1700000000000) == \
        "m v=42 1700000000000"
    assert encode_point("m", {"v": 42}, encode_integer=True) == "m v=42i"
    assert encode_point("m", {"v": 2.5}) == "m v=2.5"
    assert encode_point("m", {"v": 1.0 / 3}) == "m v=0.333333333333"
    assert encode_point("m", {"a": True, "b": False}) == "m a=t,b=f"
    assert encode_point("m", {"s": "text"}) == "m s=text"
    assert encode_point("m", {"v": 1, "drop": {"x": 1}, "l": [1]}) == \
        "m v=1"
    assert encode_point("cpu", {"load": 0.5},
                        {"host": "h1", "dc": "eu"}, 5) == \
        "cpu,host=h1,dc=eu load=0.5 5"


def test_influx_write_url_build_path():
    """build_path (esp_influx_out.erl:163-175): db + ms precision,
    optional query auth, optional retention policy."""
    from faxe_spark.sinks.influx import influx_write_url

    assert influx_write_url("h", 8086, "db1") == \
        "http://h:8086/write?db=db1&precision=ms"
    assert influx_write_url("h", 8086, "db1", user="u", password="p",
                            retention_policy="rp1") == \
        "http://h:8086/write?db=db1&precision=ms&u=u&p=p&rp=rp1"


def test_influx_sink_round_trip_and_retry(spark):
    """Live lane: a DataFrame lands as line-protocol points on the
    embedded endpoint; a 503 burst shorter than FAILED_RETRIES is
    absorbed by the retry loop (esp_influx_out.erl:144-161)."""
    import datetime

    from faxe_spark.sinks.influx import InfluxHTTPServer, influx_sink

    srv = InfluxHTTPServer()
    try:
        df = spark.createDataFrame(
            [(datetime.datetime(2024, 1, 1, 0, 0, 0), "h1", 1.5, 7),
             (datetime.datetime(2024, 1, 1, 0, 0, 1), "h2", 2.5, 8)],
            "ts timestamp, host string, load double, n long")
        influx_sink(df, host="127.0.0.1", port=srv.port, database="d1",
                    measurement="cpu", tag_cols=["host"])
        got = sorted(srv.points["d1"])
        assert got == ["cpu,host=h1 load=1.5,n=7 1704067200000",
                       "cpu,host=h2 load=2.5,n=8 1704067201000"]

        srv.fail_next = 2                  # < FAILED_RETRIES: absorbed
        influx_sink(df.limit(1), host="127.0.0.1", port=srv.port,
                    database="d2", measurement="cpu", tag_cols=["host"])
        assert len(srv.points.get("d2", [])) == 1
    finally:
        srv.stop()


# -- PG-wire live lane: postgre_statement / crate_query / postgre_out ------

def test_pgwire_round_trip_types_and_errors():
    """Live v3-protocol conversation against the embedded DuckDB-backed
    server: startup/auth, RowDescription/DataRow decode per type OID,
    NULLs, and ErrorResponse propagation."""
    import datetime

    import duckdb
    import pytest

    from faxe_spark.sources.pgwire import PGWireClient, PGWireServer

    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, f DOUBLE, s VARCHAR, "
                "b BOOLEAN, ts TIMESTAMP)")
    con.execute("INSERT INTO t VALUES (7, 2.5, 'x', TRUE, "
                "TIMESTAMP '2024-01-01 10:00:00'), "
                "(NULL, NULL, NULL, NULL, NULL)")
    srv = PGWireServer(con)
    try:
        c = PGWireClient("127.0.0.1", srv.port)
        cols, rows = c.query("SELECT * FROM t ORDER BY i NULLS LAST")
        assert cols == ["i", "f", "s", "b", "ts"]
        assert rows[0] == [7, 2.5, "x", True,
                           datetime.datetime(2024, 1, 1, 10, 0, 0)]
        assert rows[1] == [None] * 5
        with pytest.raises(RuntimeError, match="pgwire"):
            c.query("SELECT * FROM missing_table")
        # the connection survives an error (ReadyForQuery resync)
        assert c.query("SELECT 1 AS one")[1] == [[1]]
        c.close()
    finally:
        srv.stop()
        con.close()


def test_postgre_statement_df_one_shot(spark):
    """esp_postgre_statement.erl one-shot mode: the statement's result
    set lands as a typed DataFrame."""
    import duckdb

    from faxe_spark.sources.pgwire import PGWireServer, postgre_statement_df

    con = duckdb.connect()
    con.execute("CREATE TABLE m(name VARCHAR, v DOUBLE)")
    con.execute("INSERT INTO m VALUES ('a', 1.5), ('b', 2.5)")
    srv = PGWireServer(con)
    try:
        df = postgre_statement_df(
            spark, host="127.0.0.1", port=srv.port,
            statement="SELECT name, v * 2 AS v2 FROM m ORDER BY name")
        assert [tuple(r) for r in df.collect()] == [("a", 3.0), ("b", 5.0)]
        assert dict(df.dtypes) == {"name": "string", "v2": "double"}
    finally:
        srv.stop()
        con.close()


def test_crate_query_rewrite_executes_over_the_wire():
    """End-to-end crate_query: the group_by_time SQL rewrite
    (esp_crate_query.erl:170-194) executes against a live PG-wire
    endpoint and returns the same buckets the engine computes
    directly."""
    import duckdb

    from faxe_spark.sources import time_bucket_query
    from faxe_spark.sources.pgwire import PGWireClient, PGWireServer

    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                "'/root/testdata/sf0.001/events.parquet'")
    q = time_bucket_query("SELECT count(*) AS n FROM events",
                          group_by_time="5m", time_field="ts")
    lo, hi = "TIMESTAMP '2024-01-01'", "TIMESTAMP '2026-01-01'"
    bound = q.replace("$1", lo).replace("$2", hi)
    srv = PGWireServer(con)
    try:
        c = PGWireClient("127.0.0.1", srv.port)
        cols, rows = c.query(bound)
        assert cols == ["ts_gb", "n"]
        want = con.execute(bound).fetchall()
        assert [tuple(r) for r in rows] == [tuple(w) for w in want]
        assert len(rows) > 1 and sum(r[1] for r in rows) == \
            con.execute("SELECT count(*) FROM events").fetchone()[0]
        c.close()
    finally:
        srv.stop()
        con.close()


def test_postgre_out_insert_round_trip(spark):
    """postgre_out over the wire: multi-row batched INSERTs land
    content-exact (NULLs, quotes, timestamps)."""
    import datetime

    import duckdb

    from faxe_spark.sources.pgwire import (PGWireClient, PGWireServer,
                                           postgre_out_insert)

    con = duckdb.connect()
    con.execute("CREATE TABLE sink_t(id BIGINT, txt VARCHAR, "
                "ts TIMESTAMP)")
    srv = PGWireServer(con)
    df = spark.createDataFrame(
        [(1, "it's quoted", datetime.datetime(2024, 1, 1, 8, 0)),
         (2, None, datetime.datetime(2024, 1, 1, 9, 0)),
         (3, "plain", None)],
        "id long, txt string, ts timestamp")
    try:
        c = PGWireClient("127.0.0.1", srv.port)
        n = postgre_out_insert(c, "sink_t", df, batch_size=2)
        assert n == 3
        got = con.execute(
            "SELECT id, txt, ts FROM sink_t ORDER BY id").fetchall()
        assert got == [
            (1, "it's quoted", datetime.datetime(2024, 1, 1, 8, 0)),
            (2, None, datetime.datetime(2024, 1, 1, 9, 0)),
            (3, "plain", None)]
        c.close()
    finally:
        srv.stop()
        con.close()


def test_pg_dfs_query_executes_against_live_server(spark):
    """Bridge: the connector spec a DFS postgresql_query script
    compiles to (with the group_by_time rewrite) executes against the
    embedded PG-wire endpoint — the modbus/s7 bridge, database
    edition. Table/columns adapted from the reference's pg_query.dfs
    (data_obj['x'] object paths are Crate-specific SQL)."""
    import duckdb

    from faxe_spark.dfs import DFSCompiler
    from faxe_spark.sources.pgwire import PGWireClient, PGWireServer

    script = """
def host = '127.0.0.1'
|postgresql_query()
.host(host)
.port(5432)
.database('doc')
.user('crate')
.query(<<< SELECT AVG(value) AS avg_v FROM events >>>)
.group_by_time(6h)
.every(5s)
.align()
"""
    c = DFSCompiler(spark)
    c.run(script)
    [spec] = [s for s in c.connector_specs
              if s["node"] == "postgresql_query"]
    assert "floor(EXTRACT(epoch FROM ts)/21600)*21600" in spec["query"]

    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                "'/root/testdata/sf0.001/events.parquet'")
    srv = PGWireServer(con)
    try:
        cl = PGWireClient("127.0.0.1", srv.port, user="crate",
                          database="doc")
        bound = (spec["query"].replace("$1", "TIMESTAMP '2024-01-01'")
                 .replace("$2", "TIMESTAMP '2026-01-01'"))
        cols, rows = cl.query(bound)
        assert cols == ["ts_gb", "avg_v"] and len(rows) > 1
        want = con.execute(bound).fetchall()
        assert [tuple(r) for r in rows] == [tuple(w) for w in want]
        cl.close()
    finally:
        srv.stop()
        con.close()


# -- mongo_query live lane (round 5) ---------------------------------------

def test_bson_round_trip():
    """BSON subset encode/decode: nested docs, arrays, all scalar
    types, and datetimes (ms precision)."""
    import datetime

    from faxe_spark.sources.mongo import bson_decode, bson_encode

    doc = {"i32": 7, "i64": 2 ** 40, "f": 2.5, "s": "text", "b": True,
           "n": None, "nested": {"a": [1, "two", {"x": 3.0}]},
           "ts": datetime.datetime(2024, 1, 1, 10, 0, 0)}
    got, end = bson_decode(bson_encode(doc))
    assert got == doc and end == len(bson_encode(doc))


def test_mongo_selector_semantics():
    from faxe_spark.sources.mongo import match_selector

    d = {"id": 5, "tag": "a", "obj": {"x": {"cur": 7}}}
    assert match_selector(d, {})
    assert match_selector(d, {"tag": "a", "id": {"$lt": 33}})
    assert not match_selector(d, {"id": {"$gte": 6}})
    assert match_selector(d, {"obj.x.cur": {"$in": [7, 8]}})
    assert match_selector(d, {"$or": [{"id": 1}, {"tag": "a"}]})
    assert not match_selector(d, {"missing": {"$gt": 0}})


def test_mongo_find_round_trip_and_df(spark):
    """Live OP_MSG conversation: the JSON selector of esp_mongo_query
    runs as a real find; results land one-row-per-doc under the .as()
    column."""
    import json

    import pytest

    from faxe_spark.sources.mongo import (MongoClient, MongoServer,
                                          mongo_query_df)

    docs = [{"id": i, "tag": "a" if i % 2 else "b",
             "obj": {"x": {"cur": float(i)}}} for i in range(10)]
    srv = MongoServer({("doc", "events"): docs})
    try:
        c = MongoClient("127.0.0.1", srv.port)
        got = c.find("doc", "events", {"id": {"$lt": 3}})
        assert [d["id"] for d in got] == [0, 1, 2]
        with pytest.raises(ConnectionError, match="unsupported operator"):
            c.find("doc", "events", {"id": {"$regex": "x"}})
        # connection survives a command error
        assert len(c.find("doc", "events")) == 10
        c.close()

        df = mongo_query_df(spark, host="127.0.0.1", port=srv.port,
                            database="doc", collection="events",
                            query='{"tag": "a", "id": {"$lt": 6}}')
        vals = sorted(json.loads(r.data)["id"] for r in df.collect())
        assert vals == [1, 3, 5]
        assert df.columns == ["ts", "data"]
    finally:
        srv.stop()


def test_mongo_dfs_spec_executes_against_live_server(spark):
    """Bridge: the connector spec a DFS mongo_query script compiles to
    executes against the embedded server."""
    from faxe_spark.dfs import DFSCompiler
    from faxe_spark.sources.mongo import MongoServer, mongo_query_df

    script = """
|mongo_query()
.host('127.0.0.1')
.port(27017)
.database('doc')
.collection('readings')
.query(<<< {"state": {"$gte": 2}} >>>)
.every(5s)
.as('point')
"""
    c = DFSCompiler(spark)
    c.run(script)
    [spec] = [s for s in c.connector_specs if s["node"] == "mongo_query"]
    srv = MongoServer({("doc", "readings"):
                       [{"state": 1}, {"state": 2}, {"state": 3}]})
    try:
        df = mongo_query_df(spark, host=spec["host"], port=srv.port,
                            database=spec["database"],
                            collection=spec["collection"],
                            query=spec["query"], as_path=spec["as"])
        assert df.count() == 2 and spec["as"] == "point"
    finally:
        srv.stop()


def test_pg_poll_source_continuous_query(spark):
    """crate_query_cont: the advancing-range query re-executes per tick
    against the live PG-wire endpoint; each tick's range is a pure
    function of the tick timestamp ($1/$2 bound to [t-offset-period,
    t-offset])."""
    import json
    import time

    import duckdb

    from faxe_spark.sources.pgwire import PGWireServer, pg_poll_source

    con = duckdb.connect()
    con.execute("CREATE TABLE live(v BIGINT)")
    con.execute("INSERT INTO live VALUES (1), (2)")
    srv = PGWireServer(con)
    # the range binds must reach the query: echo them back as strings
    q = ("SELECT count(*) AS n, strftime($1, '%M:%S') AS lo, "
         "strftime($2, '%M:%S') AS hi FROM live")
    out = pg_poll_source(spark, host="127.0.0.1", port=srv.port,
                         query=q, every="1s", period="5s", offset="2s")
    qy = (out.writeStream.format("memory").queryName("pg_poll")
          .outputMode("append").trigger(processingTime="1 second").start())
    try:
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM pg_poll "
                             "WHERE payload IS NOT NULL").collect()
            if len(rows) >= 2:
                break
            time.sleep(1)
        assert len(rows) >= 2, "poller never produced results"
        for r in rows:
            d = json.loads(r.payload)
            assert d["n"] == 2
            # period=5s: lo is exactly 5 seconds behind hi
            lo_m, lo_s = map(int, d["lo"].split(":"))
            hi_m, hi_s = map(int, d["hi"].split(":"))
            assert (hi_m * 60 + hi_s) - (lo_m * 60 + lo_s) in (5, -3595)
    finally:
        qy.stop()
        srv.stop()
        con.close()


# -- http_post_crate live lane (round 5) -----------------------------------

def test_http_post_crate_round_trip(spark):
    """Live /_sql bulk insert: the crate_out statement + bulk_args
    layout (ts first, db_fields, remaining-fields JSON) lands
    content-exact via HTTP, with the Default-Schema header and Basic
    auth; a 503 burst is absorbed by the retry loop."""
    import json

    import duckdb

    from faxe_spark.sinks.crate_http import CrateSQLServer, http_post_crate

    con = duckdb.connect()
    con.execute("CREATE SCHEMA doc")
    con.execute("CREATE TABLE doc.readings(ts BIGINT, id BIGINT, "
                "val DOUBLE, data_obj VARCHAR)")
    srv = CrateSQLServer(con)
    df = spark.createDataFrame(
        [(1000, 7, 2.5, "a", 1), (2000, 8, 0.5, "b", 2)],
        "ts long, id long, val double, tag string, extra long")
    try:
        ok = http_post_crate(
            df, host="127.0.0.1", port=srv.port, table="readings",
            db_fields=["id", "val"], faxe_fields=["id", "val"],
            remaining_fields_as="data_obj",
            user="crate", password="pw")
        assert ok
        got = con.execute("SELECT ts, id, val, data_obj FROM doc.readings"
                          " ORDER BY ts").fetchall()
        assert [(r[0], r[1], r[2]) for r in got] == \
            [(1000, 7, 2.5), (2000, 8, 0.5)]
        assert json.loads(got[0][3]) == {"tag": "a", "extra": 1}
        [hdrs] = [h for h in srv.headers][:1]
        assert hdrs.get("Default-Schema") == "doc"
        assert hdrs.get("Authorization", "").startswith("Basic ")
        [req] = srv.requests[:1]
        assert req["stmt"].startswith(
            "INSERT INTO doc.readings (ts, id, val, data_obj) VALUES")

        srv.fail_next = 2
        assert http_post_crate(
            df.limit(1), host="127.0.0.1", port=srv.port,
            table="readings", db_fields=["id", "val"],
            faxe_fields=["id", "val"], remaining_fields_as="data_obj")
    finally:
        srv.stop()
        con.close()


def test_influx_all_null_fields_skipped_and_exhausted_retries_raise(spark):
    """Round-5 review finds: a row whose every field filters out emits
    NO line (an empty field set would 400 the whole body), and an
    exhausted retry ladder RAISES instead of silently dropping the
    batch (streaming: the epoch must not commit)."""
    import datetime

    import pytest

    from faxe_spark.sinks.influx import (InfluxHTTPServer, encode_point,
                                         influx_sink)

    assert encode_point("m", {"a": None, "b": {"x": 1}, "c": [1]}) is None

    srv = InfluxHTTPServer()
    try:
        df = spark.createDataFrame(
            [(datetime.datetime(2024, 1, 1), "h1", None),
             (datetime.datetime(2024, 1, 1, 0, 0, 1), "h2", 1.5)],
            "ts timestamp, host string, load double")
        influx_sink(df, host="127.0.0.1", port=srv.port, database="d3",
                    measurement="cpu", tag_cols=["host"])
        assert srv.points["d3"] == ["cpu,host=h2 load=1.5 1704067201000"]

        srv.fail_next = 10                     # > FAILED_RETRIES
        with pytest.raises(RuntimeError, match="failed after"):
            influx_sink(df.limit(1).fillna(0.0),
                        host="127.0.0.1", port=srv.port, database="d4",
                        measurement="cpu", tag_cols=["host"])
    finally:
        srv.stop()


def test_http_post_crate_exhausted_retries_raise(spark):
    import duckdb
    import pytest

    from faxe_spark.sinks.crate_http import CrateSQLServer, http_post_crate

    con = duckdb.connect()
    con.execute("CREATE SCHEMA doc")
    con.execute("CREATE TABLE doc.t2(ts BIGINT, v BIGINT)")
    srv = CrateSQLServer(con)
    df = spark.createDataFrame([(1, 2)], "ts long, v long")
    try:
        srv.fail_next = 10
        with pytest.raises(RuntimeError, match="failed after"):
            http_post_crate(df, host="127.0.0.1", port=srv.port,
                            table="t2", db_fields=["v"])
    finally:
        srv.stop()
        con.close()


def test_pgwire_sql_literal_nan_inf(spark):
    """Round-5 review find: bare nan/inf are not SQL; the quoted-cast
    form must land through the wire insert."""
    import math

    import duckdb

    from faxe_spark.sources.pgwire import (PGWireClient, PGWireServer,
                                           postgre_out_insert, sql_literal)

    assert sql_literal(float("nan")) == "CAST('NaN' AS DOUBLE PRECISION)"
    assert sql_literal(float("inf")) == \
        "CAST('Infinity' AS DOUBLE PRECISION)"
    con = duckdb.connect()
    con.execute("CREATE TABLE nt(id BIGINT, v DOUBLE)")
    srv = PGWireServer(con)
    df = spark.createDataFrame([(1, float("nan")), (2, float("-inf"))],
                               "id long, v double")
    try:
        c = PGWireClient("127.0.0.1", srv.port)
        assert postgre_out_insert(c, "nt", df) == 2
        got = dict(con.execute("SELECT id, v FROM nt").fetchall())
        assert math.isnan(got[1]) and got[2] == float("-inf")
        c.close()
    finally:
        srv.stop()
        con.close()


def test_mongo_poll_source_periodic_find(spark):
    """esp_mongo_query's periodic mode: the selector re-runs per tick
    against the live embedded server; docs land under the .as()
    column."""
    import json
    import time

    from faxe_spark.sources.mongo import MongoServer, mongo_poll_source

    srv = MongoServer({("doc", "r"): [{"id": 1, "on": True},
                                      {"id": 2, "on": False}]})
    out = mongo_poll_source(spark, host="127.0.0.1", port=srv.port,
                            database="doc", collection="r",
                            query='{"on": true}', every="1s",
                            as_path="point")
    q = (out.writeStream.format("memory").queryName("mongo_poll")
         .outputMode("append").trigger(processingTime="1 second").start())
    try:
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM mongo_poll "
                             "WHERE point IS NOT NULL").collect()
            if len(rows) >= 2:
                break
            time.sleep(1)
        assert len(rows) >= 2
        assert all(json.loads(r.point)["id"] == 1 for r in rows)
        assert len({r.poll_ts for r in rows}) >= 2   # distinct ticks
    finally:
        q.stop()
        srv.stop()


def test_modbus_poll_source_periodic(spark):
    """esp_modbus_read's periodic mode: the coalesced plan re-executes
    per tick against the live embedded device."""
    import json
    import time

    from faxe_spark.sources.modbus import ModbusServer, modbus_poll_source

    srv = ModbusServer(hregs={5: 7, 6: 9})
    out = modbus_poll_source(
        spark, host="127.0.0.1", port=srv.port,
        functions=["hregs", "hregs"], starts=[5, 6], counts=[1, 1],
        aliases=["a", "b"], outputs=["int16", "int16"], every="1s")
    q = (out.writeStream.format("memory").queryName("mb_poll")
         .outputMode("append").trigger(processingTime="1 second").start())
    try:
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM mb_poll "
                             "WHERE values IS NOT NULL").collect()
            if len(rows) >= 2:
                break
            time.sleep(1)
        assert len(rows) >= 2
        assert all(json.loads(r.values) == {"a": 7, "b": 9} for r in rows)
    finally:
        q.stop()
        srv.stop()


def test_s7_poll_source_periodic(spark):
    """esp_s7read's periodic mode: one coalesced bulk-read conversation
    per tick against the live embedded PLC."""
    import json
    import struct
    import time

    from faxe_spark.sources.s7 import S7Server, s7_poll_source

    db = bytearray(8)
    struct.pack_into(">h", db, 0, 5)
    struct.pack_into(">h", db, 2, 9)
    srv = S7Server({1: bytes(db)})
    out = s7_poll_source(spark, host="127.0.0.1", port=srv.port,
                         addresses=["DB1,Int0", "DB1,Int2"],
                         aliases=["a", "b"], every="1s")
    q = (out.writeStream.format("memory").queryName("s7_poll")
         .outputMode("append").trigger(processingTime="1 second").start())
    try:
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM s7_poll "
                             "WHERE values IS NOT NULL").collect()
            if len(rows) >= 2:
                break
            time.sleep(1)
        assert len(rows) >= 2
        assert all(json.loads(r.values) == {"a": 5, "b": 9} for r in rows)
    finally:
        q.stop()
        srv.stop()


def test_poll_ticks_subsecond_cadence(spark):
    """Round-5 review find: sub-second `every` used to floor to 1 s.
    The shared clock honors 500ms (rate at 2 rps, every row kept)."""
    import time

    from faxe_spark.sources._poll import poll_ticks

    tick = poll_ticks(spark, "500ms")
    q = (tick.writeStream.format("memory").queryName("halfsec")
         .outputMode("append").trigger(processingTime="500 milliseconds")
         .start())
    try:
        deadline = time.time() + 45
        n = 0
        while time.time() < deadline:
            rows = spark.sql("SELECT timestamp FROM halfsec").collect()
            n = len(rows)
            if n >= 6:
                break
            time.sleep(1)
        assert n >= 6                      # ~2 ticks/second arrived
        ts = sorted(r.timestamp for r in rows)
        gaps = [(b - a).total_seconds() for a, b in zip(ts, ts[1:])]
        assert min(gaps) < 0.75, gaps      # genuinely sub-second
    finally:
        q.stop()


def test_pgwire_numeric_decodes_losslessly(spark):
    """ADVICE r5: NUMERIC/DECIMAL must survive the wire exactly —
    epgsql returns numerics losslessly, so float() on OID 1700 was a
    precision bug (0.1 accumulations, money). Server advertises
    OID_NUMERIC for Decimal values; client decodes via
    decimal.Decimal; postgre_statement_df lands a decimal column."""
    import decimal

    import duckdb

    from faxe_spark.sources.pgwire import (PGWireClient, PGWireServer,
                                           postgre_statement_df)

    con = duckdb.connect()
    con.execute("CREATE TABLE money(amt DECIMAL(18,2))")
    # 0.10 summed 3x = 0.30 exactly in decimal; 0.30000000000000004 in float
    con.execute("INSERT INTO money VALUES (0.10), (0.10), (0.10), "
                "(12345678901234.56)")
    srv = PGWireServer(con)
    try:
        c = PGWireClient("127.0.0.1", srv.port)
        _, rows = c.query("SELECT sum(amt) AS total FROM money")
        assert rows[0][0] == decimal.Decimal("12345678901234.86")
        assert isinstance(rows[0][0], decimal.Decimal)
        c.close()

        df = postgre_statement_df(
            spark, host="127.0.0.1", port=srv.port,
            statement="SELECT sum(amt) AS total FROM money")
        assert dict(df.dtypes)["total"].startswith("decimal")
        assert df.collect()[0][0] == decimal.Decimal("12345678901234.86")
    finally:
        srv.stop()
        con.close()


def test_pgwire_numeric_scale_sizing_and_nonfinite_literals(spark):
    """Review round 6: (a) the Spark decimal type is sized to the
    data, so scale>18 survives (the old fixed decimal(38,18) silently
    rounded); (b) sql_literal quote-casts non-finite Decimals — bare
    NaN is not a SQL literal."""
    import decimal

    import duckdb

    from faxe_spark.sources.pgwire import (PGWireServer, sql_literal,
                                           postgre_statement_df)

    assert sql_literal(decimal.Decimal("NaN")) == \
        "CAST('NaN' AS DOUBLE PRECISION)"
    assert sql_literal(decimal.Decimal("Infinity")) == \
        "CAST('Infinity' AS DOUBLE PRECISION)"
    assert sql_literal(decimal.Decimal("-Infinity")) == \
        "CAST('-Infinity' AS DOUBLE PRECISION)"
    assert sql_literal(decimal.Decimal("0.10")) == "0.10"

    con = duckdb.connect()
    con.execute("CREATE TABLE deep(v DECIMAL(38,30))")
    deep = "0.123456789012345678901234567890"
    con.execute(f"INSERT INTO deep VALUES ({deep})")
    srv = PGWireServer(con)
    try:
        df = postgre_statement_df(
            spark, host="127.0.0.1", port=srv.port,
            statement="SELECT v FROM deep")
        dt = dict(df.dtypes)["v"]
        assert dt.startswith("decimal") and ",30)" in dt, dt
        assert df.collect()[0][0] == decimal.Decimal(deep)
    finally:
        srv.stop()
        con.close()


# -- r11 wire-lane review pins ----------------------------------------------

def test_pgwire_insert_quotes_reserved_word_columns(spark):
    """r11 wire review: DataFrame column names are arbitrary — a
    reserved word (or a space) in the INSERT column list broke both
    insert paths; identifiers are now double-quoted."""
    import duckdb

    from faxe_spark.sources.pgwire import (PGWireClient, PGWireServer,
                                           postgre_out_insert)

    con = duckdb.connect()
    con.execute('CREATE TABLE q("from" BIGINT, "my col" VARCHAR)')
    srv = PGWireServer(con)
    try:
        df = spark.createDataFrame([(1, "a"), (2, "b")],
                                   "`from` long, `my col` string")
        c = PGWireClient("127.0.0.1", srv.port)
        try:
            n = postgre_out_insert(c, "q", df)
        finally:
            c.close()
        assert n == 2
        assert con.execute('SELECT "from", "my col" FROM q ORDER BY 1') \
            .fetchall() == [(1, "a"), (2, "b")]
    finally:
        srv.stop()
        con.close()


def test_pgwire_bytea_round_trip():
    """r11 wire review: OID_BYTEA was defined but undecoded — BLOB
    columns came back as the raw '\\x..' hex string; now bytes round
    trip through the live server."""
    import duckdb

    from faxe_spark.sources.pgwire import PGWireClient, PGWireServer

    con = duckdb.connect()
    con.execute("CREATE TABLE bl(b BLOB)")
    con.execute("INSERT INTO bl VALUES ('\\x01AB'::BLOB), (NULL)")
    srv = PGWireServer(con)
    try:
        c = PGWireClient("127.0.0.1", srv.port)
        try:
            _, rows = c.query("SELECT b FROM bl ORDER BY b NULLS LAST")
        finally:
            c.close()
        # DuckDB's BLOB literal: \xHH escapes one byte, the rest are
        # literal chars — '\x01AB' is 0x01 then "AB"
        assert rows == [[b"\x01AB"], [None]]
    finally:
        srv.stop()
        con.close()


def test_pgwire_bind_range_longest_match():
    """r11 wire review: $1 must not eat the prefix of $10+ (plain
    str.replace corrupted queries using higher placeholder numbers)."""
    import datetime

    from faxe_spark.sources.pgwire import bind_range

    q = "SELECT $1 a, $2 b, $10 c, $21 d"
    b = bind_range(q, datetime.datetime(2024, 1, 1),
                   datetime.datetime(2024, 1, 2))
    assert "$10 c" in b and "$21 d" in b
    assert b.count("TIMESTAMP '2024-01-01 00:00:00'") == 1
    assert b.count("TIMESTAMP '2024-01-02 00:00:00'") == 1


def test_bson_datetime_is_utc_regardless_of_host_zone():
    """r11 wire review: BSON 0x09 is UTC ms since epoch; naive
    datetimes encode AS UTC (not host-local) and decode back naive —
    the stamped ms value is pinned so a non-UTC host cannot pass by
    symmetric error."""
    import calendar
    import datetime
    import struct

    from faxe_spark.sources.mongo import bson_decode, bson_encode

    d = datetime.datetime(2024, 1, 1, 12, 0, 0)
    buf = bson_encode({"t": d})
    # element: type(1) 't\0'(2) int64 ms
    (ms,) = struct.unpack_from("<q", buf, 4 + 1 + 2)
    assert ms == calendar.timegm(d.timetuple()) * 1000
    got, _ = bson_decode(buf)
    assert got == {"t": d}


def test_mongo_server_partial_header_drops_not_desyncs():
    """r11 wire review: a timeout after a PARTIAL header read used to
    discard the consumed bytes and keep the connection — every later
    message parsed desynced. Idle-tolerance now applies only before
    byte 0; a stalled mid-header peer is dropped (recv -> b'') instead
    of answered with garbage."""
    import socket
    import struct
    import time

    from faxe_spark.sources.mongo import (MongoClient, MongoServer,
                                          _op_msg)

    srv = MongoServer({("db", "c"): [{"x": 1}]})
    try:
        # a fast client works
        c = MongoClient("127.0.0.1", srv.port)
        assert c.find("db", "c") == [{"x": 1}]
        c.close()

        # a trickling client: 8 header bytes, stall past the server's
        # 0.5s read timeout, then the rest — must get DROPPED
        raw = socket.create_connection(("127.0.0.1", srv.port), timeout=5)
        msg = _op_msg(1, 0, {"find": "c", "filter": {}, "$db": "db"})
        raw.sendall(msg[:8])
        time.sleep(1.2)
        try:
            raw.sendall(msg[8:])
            raw.settimeout(5)
            got = raw.recv(16)
        except OSError:
            got = b""
        assert got == b"", "desynced reply instead of a clean drop"
        raw.close()

        # the server survives and serves new connections
        c = MongoClient("127.0.0.1", srv.port)
        assert c.find("db", "c") == [{"x": 1}]
        c.close()
    finally:
        srv.stop()


def test_influx_nan_inf_fields_filter_out():
    """r11 wire review: line protocol has no NaN/Inf literal — 'v=nan'
    400s the whole request body on a real endpoint. Non-finite floats
    filter like map/list fields; an all-non-finite point skips."""
    from faxe_spark.sinks.influx import encode_point

    line = encode_point("m", {"a": float("nan"), "b": 2.0,
                              "c": float("inf")}, {}, 1000)
    assert line == "m b=2.0 1000"
    assert encode_point("m", {"a": float("-inf")}, {}, 1000) is None
