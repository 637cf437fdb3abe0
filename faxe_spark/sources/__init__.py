"""Batch/stream source connectors (SURVEY.md §2.1 mapping).

Reference ingest nodes -> Spark sources:

| faxe node            | here                                   |
|----------------------|----------------------------------------|
| mqtt_subscribe,      | `kafka_source` (broker ingestion; an   |
| amqp_consume         | MQTT/AMQP->Kafka bridge owns protocol) |
| http_get, *_query    | `jdbc_source` / `http_poll_source`;    |
| crate/postgre/mongo  | live wire lanes: `pgwire.py` (v3       |
|                      | protocol on DuckDB), `mongo.py`        |
|                      | (OP_MSG find), both embedded-tested    |
| modbus_read / s7read | live wire lanes: `modbus.py`, `s7.py`  |
| blobstream           | `file_source` (csv/json/parquet, batch |
|                      | or readStream — native cloud FS URIs)  |
| tcp_recv(_line)      | `socket_source` (line-framed push edge)|
| value_emitter        | streaming.rate_source                  |
| json_emitter         | `json_rows_source` (literal rows)      |

Connector jars (Kafka, JDBC drivers) may be absent in a dev container:
constructors only *declare* options; failures surface at stream start
with a clear message.
"""

from __future__ import annotations

import json as _json

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def file_source(spark: SparkSession, path: str, *, format: str = "parquet",
                schema=None, streaming: bool = False, **options) -> DataFrame:
    """blobstream analog (esp_blobstream.erl:68): line/row-wise file
    ingest; any Hadoop-compatible URI (abfss://, s3a://, file:)."""
    if streaming:
        reader = spark.readStream
        if schema is None:
            schema = spark.read.format(format).options(**options).load(path).schema
        reader = reader.schema(schema)
    else:
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
    return reader.format(format).options(**options).load(path)


def kafka_source(spark: SparkSession, *, brokers: str, topic: str,
                 streaming: bool = True, starting_offsets: str = "latest",
                 value_schema=None, dt_field: str = "ts") -> DataFrame:
    """mqtt_subscribe/amqp_consume analog (esp_mqtt_subscribe.erl:47,
    esp_amqp_consume.erl:68): JSON payload decode + event-time column.
    Flow-ack/dtag semantics are subsumed by checkpointed offsets."""
    reader = (spark.readStream if streaming else spark.read).format("kafka") \
        .option("kafka.bootstrap.servers", brokers) \
        .option("subscribe", topic) \
        .option("startingOffsets", starting_offsets)
    raw = reader.load()
    out = raw.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("payload"),
        F.col("timestamp").alias("_arrival_ts"),
    )
    if value_schema is not None:
        out = out.withColumn("data", F.from_json("payload", value_schema))
        if dt_field:
            out = out.withColumn("ts", F.col(f"data.{dt_field}"))
    return out


def time_bucket_query(query: str, *, group_by_time: str, time_field: str = "ts",
                      group_by: list[str] | None = None) -> str:
    """crate_query's distinctive feature: rewrite a user SELECT into a
    time-bucketed GROUP BY with time-range bind params
    (esp_crate_query.erl:170-194, golden shape :218-225).

    `SELECT COUNT(*) FROM t WHERE tag='x'` with group_by_time='5m',
    time_field='time', group_by=['a'] becomes:

        SELECT floor(EXTRACT(epoch FROM time)/300)*300 AS time_gb,
               COUNT(*) FROM t WHERE tag='x'
               AND time >= $1 AND time <= $2
        GROUP BY time_gb, a ORDER BY time_gb DESC

    The result feeds jdbc_source's `query` option, so the bucketing and
    filtering execute inside the database (the reference pushes the same
    SQL to CrateDB) — Spark only receives pre-aggregated rows."""
    import re as _re

    from faxe_spark.durations import parse_duration_ms

    if not query[:6].upper() == "SELECT":
        raise ValueError("time_bucket_query expects a SELECT statement")
    body = query[6:].strip()
    # the textual rewrite appends the range predicate and GROUP BY after
    # the whole SELECT body — a query that already has GROUP BY / ORDER
    # BY / LIMIT / subqueries would produce invalid SQL, so reject those
    # shapes explicitly (the reference constrains its input the same
    # way: esp_crate_query feeds a plain filtered SELECT)
    upper = body.upper()
    for kw in ("GROUP BY", "ORDER BY", "LIMIT", "HAVING"):
        if _re.search(r"\b" + kw.replace(" ", r"\s+") + r"\b", upper):
            raise ValueError(
                f"time_bucket_query cannot rewrite a query containing {kw}; "
                "pass a plain 'SELECT ... FROM t [WHERE ...]' — the bucket "
                "GROUP BY and time range are appended by the rewrite")
    if "(" in body and _re.search(r"\(\s*SELECT\b", upper):
        raise ValueError(
            "time_bucket_query cannot rewrite a query containing a "
            "subquery; pass a plain 'SELECT ... FROM t [WHERE ...]'")
    secs = round(parse_duration_ms(group_by_time) / 1000)
    bucket = (f"floor(EXTRACT(epoch FROM {time_field})/{secs})*{secs} "
              f"AS {time_field}_gb")
    # WHERE as a word, not a substring (a column named warehouse_where_id
    # must not flip the conjunction)
    conj = "AND" if _re.search(r"\bWHERE\b", upper) else "WHERE"
    range_clause = f" {conj} {time_field} >= $1 AND {time_field} <= $2"
    group_clause = "".join(f", {g}" for g in (group_by or []))
    return (f"SELECT {bucket}, {body}{range_clause}"
            f" GROUP BY {time_field}_gb{group_clause}"
            f" ORDER BY {time_field}_gb DESC")


def jdbc_source(spark: SparkSession, *, url: str, query: str, user: str = "",
                password: str = "", partition_column: str | None = None,
                num_partitions: int = 8, lower_bound=None, upper_bound=None,
                **options) -> DataFrame:
    """crate_query/postgre_statement/oracle_query analog
    (esp_crate_query.erl:45): the reference's time-bucket SQL rewrite
    (:170-194) becomes a pushed-down dbtable subquery; partitioned reads
    replace its periodic pagination."""
    reader = (spark.read.format("jdbc")
              .option("url", url)
              .option("query", query)
              .option("user", user)
              .option("password", password))
    if partition_column is not None:
        reader = (reader.option("partitionColumn", partition_column)
                  .option("numPartitions", str(num_partitions))
                  .option("lowerBound", str(lower_bound))
                  .option("upperBound", str(upper_bound)))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def socket_source(spark: SparkSession, *, host: str, port: int,
                  json_schema: str | None = None,
                  min_length: int = 0) -> DataFrame:
    """tcp_recv / tcp_recv_line analog (esp_tcp_recv_line.erl:40
    `{packet, line}`, :57 min_length filter): line-framed push ingest
    via Spark's built-in socket stream source. Each line is one item;
    `json_schema` parses lines into typed columns (the `parser` option),
    otherwise the raw `value` string column streams through.

    Scale note: the socket source is single-connection by design (like
    the reference node); production push ingest at 100 TB goes through
    the broker path (`kafka_source`) — this is the edge-adapter."""
    df = (spark.readStream.format("socket")
          .option("host", host).option("port", port).load())
    if min_length > 0:
        df = df.filter(F.length("value") >= min_length)
    if json_schema is not None:
        df = df.select(F.from_json("value", json_schema).alias("_j")).select("_j.*")
    return df


def http_get_source(spark: SparkSession, url: str, *,
                    json_schema: str | None = None, headers: dict | None = None,
                    retries: int = 2, timeout_sec: float = 10.0) -> DataFrame:
    """http_get one-shot (esp_http_get.erl:38): GET the URL once, return
    the body as a 1-row batch DataFrame (fetch_ts, payload) — with
    `json_schema`, parse into typed columns. Driver-side by design (one
    request, point config fetch); the periodic form is
    `http_poll_source`."""
    import urllib.request

    req = urllib.request.Request(url, headers={
        "Accept": "application/json,text/plain", **(headers or {})})
    last = None
    for _ in range(retries + 1):
        try:
            with urllib.request.urlopen(req, timeout=timeout_sec) as r:
                body = r.read().decode("utf-8")
            break
        except Exception as e:  # noqa: BLE001 - retry then surface
            last = e
            body = None
    if body is None:
        raise ConnectionError(f"http_get_source: GET {url} failed "
                              f"after {retries + 1} attempts: {last}")
    df = spark.createDataFrame([(body,)], "payload string") \
        .withColumn("fetch_ts", F.current_timestamp())
    if json_schema is not None:
        df = df.select("fetch_ts",
                       F.from_json("payload", json_schema).alias("_j")).select(
            "fetch_ts", "_j.*")
    return df


def http_poll_source(spark: SparkSession, url: str, *, every: str = "10s",
                     align: bool = False, json_schema: str | None = None,
                     retries: int = 2, timeout_sec: float = 10.0) -> DataFrame:
    """http_get periodic polling (esp_http_get.erl:38, `every`/`align`
    options): a streaming DataFrame that GETs the URL once per interval.

    Spark-first shape: the rate source provides the clock (one tick per
    second); ticks are filtered to the poll cadence (`align=True` snaps
    to wall-clock multiples of `every`, the faxe_time:align semantics)
    and each surviving tick runs ONE executor-side GET in an
    Arrow-batched mapInPandas — retried like the reference's
    failed_retries, null payload after final failure (the conn_status
    'down' analog, filterable downstream)."""
    import pandas as pd

    from faxe_spark.sources._poll import poll_ticks

    tick = poll_ticks(spark, every, align)

    def fetch(batches):
        import urllib.request

        for pdf in batches:
            payloads = []
            for _ in range(len(pdf)):
                body = None
                for _attempt in range(retries + 1):
                    try:
                        req = urllib.request.Request(url, headers={
                            "Accept": "application/json,text/plain"})
                        with urllib.request.urlopen(req, timeout=timeout_sec) as r:
                            body = r.read().decode("utf-8")
                        break
                    except Exception:  # noqa: BLE001 - retry, then null
                        body = None
                payloads.append(body)
            yield pd.DataFrame({"poll_ts": pdf["timestamp"],
                                "payload": payloads})

    out = tick.mapInPandas(fetch, "poll_ts timestamp, payload string")
    if json_schema is not None:
        out = out.select("poll_ts",
                         F.from_json("payload", json_schema).alias("_j")) \
            .select("poll_ts", "_j.*")
    return out


class UdpListener:
    """udp_recv (esp_udp_recv.erl:45): datagram ingest. Spark has no UDP
    source, so this is the edge adapter a cluster deployment would run:
    a listener thread receives datagrams and spools them as atomically-
    renamed text files; `.df` is a normal file-stream DataFrame over the
    spool (checkpointable, at-least-once — stronger than raw UDP).
    `changed=True` drops consecutive duplicate datagrams (the reference's
    crc32 dedup, :92-99). Single-listener by design, like the reference
    node; scale ingest goes through the broker path (kafka_source)."""

    def __init__(self, spark: SparkSession, *, port: int = 0,
                 host: str = "127.0.0.1", spool_dir: str | None = None,
                 json_schema: str | None = None, changed: bool = False,
                 flush_every: float = 0.2):
        import os
        import socket
        import tempfile
        import threading
        import zlib

        self._spool = spool_dir or tempfile.mkdtemp(prefix="faxe_udp_")
        os.makedirs(self._spool, exist_ok=True)
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((host, port))
        self._sock.settimeout(flush_every)
        self.port = self._sock.getsockname()[1]
        self._stop = threading.Event()
        self._seq = 0

        def loop():
            buf, prev_crc = [], None
            while not self._stop.is_set():
                try:
                    data, _ = self._sock.recvfrom(65536)
                    if changed:
                        crc = zlib.crc32(data)
                        if crc == prev_crc:
                            continue
                        prev_crc = crc
                    buf.append(data.decode("utf-8", errors="replace"))
                except OSError:
                    pass  # timeout -> flush chance
                if buf:
                    tmp = os.path.join(self._spool, f"._{self._seq}.txt")
                    dst = os.path.join(self._spool, f"batch_{self._seq}.txt")
                    with open(tmp, "w") as f:
                        f.write("\n".join(buf) + "\n")
                    os.rename(tmp, dst)  # atomic: stream never sees partials
                    self._seq += 1
                    buf = []
            self._sock.close()

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

        df = spark.readStream.format("text").load(self._spool)
        df = df.withColumnRenamed("value", "data")
        if json_schema is not None:
            df = df.select(F.from_json("data", json_schema).alias("_j")).select("_j.*")
        self.df = df

    def stop(self):
        self._stop.set()
        self._thread.join(timeout=5)


def udp_source(spark: SparkSession, **kwargs) -> UdpListener:
    """udp_recv analog — see UdpListener. Returns the listener; stream
    from `listener.df`, and call `listener.stop()` on shutdown."""
    return UdpListener(spark, **kwargs)


class HttpListener:
    """http_listen (esp_http_listen.erl:30): inbound HTTP push ingest.
    Same edge-adapter shape as UdpListener: an embedded HTTP server
    accepts POST/PUT bodies on `path` (one item per request, newline-
    split for ndjson), optionally basic-auth-gated, and spools them as
    atomically-renamed text files feeding a checkpointable file-stream
    DataFrame. Single listener by design; scale ingest goes through the
    broker path."""

    def __init__(self, spark: SparkSession, *, port: int = 0,
                 host: str = "127.0.0.1", path: str = "/",
                 spool_dir: str | None = None, json_schema: str | None = None,
                 user: str | None = None, password: str | None = None):
        import base64
        import os
        import tempfile
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        self._spool = spool_dir or tempfile.mkdtemp(prefix="faxe_httpl_")
        os.makedirs(self._spool, exist_ok=True)
        seq_lock = threading.Lock()
        state = {"seq": 0}
        want_auth = None
        if user is not None:
            creds = base64.b64encode(f"{user}:{password or ''}".encode()).decode()
            want_auth = f"Basic {creds}"
        spool = self._spool
        accept_path = path

        class Handler(BaseHTTPRequestHandler):
            def _ingest(self):
                if self.path != accept_path:
                    self.send_response(404); self.end_headers()
                    return
                if want_auth is not None and \
                        self.headers.get("Authorization") != want_auth:
                    self.send_response(401); self.end_headers()
                    return
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n).decode("utf-8", errors="replace")
                lines = [ln for ln in body.splitlines() if ln.strip()]
                with seq_lock:
                    seq = state["seq"]
                    state["seq"] += 1
                tmp = os.path.join(spool, f"._{seq}.txt")
                dst = os.path.join(spool, f"req_{seq}.txt")
                with open(tmp, "w") as f:
                    f.write("\n".join(lines) + "\n")
                os.rename(tmp, dst)
                self.send_response(200)
                self.end_headers()

            do_POST = _ingest
            do_PUT = _ingest

            def log_message(self, *a):  # noqa: D102 - quiet
                pass

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.port = self._server.server_port
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)
        self._thread.start()

        df = spark.readStream.format("text").load(self._spool)
        df = df.withColumnRenamed("value", "data")
        if json_schema is not None:
            df = df.select(F.from_json("data", json_schema).alias("_j")).select("_j.*")
        self.df = df

    def stop(self):
        self._server.shutdown()
        self._server.server_close()
        self._thread.join(timeout=5)


def http_listen_source(spark: SparkSession, **kwargs) -> HttpListener:
    """http_listen analog — see HttpListener."""
    return HttpListener(spark, **kwargs)


def json_rows_source(spark: SparkSession, rows: list[dict] | list[str],
                     ts_field: str = "ts") -> DataFrame:
    """json_emitter analog (esp_json_emitter.erl:37): literal JSON rows
    as a DataFrame (the test-emitter of the reference's dfs corpus)."""
    dicts = [_json.loads(r) if isinstance(r, str) else r for r in rows]
    df = spark.createDataFrame(dicts)
    if ts_field in df.columns and dict(df.dtypes)[ts_field] == "bigint":
        df = df.withColumn(ts_field, F.timestamp_millis(F.col(ts_field)))
    return df


def tcp_poll_source(spark: SparkSession, *, host: str, port: int,
                    every: str = "1s", request: str = "get1",
                    prefix: str = "val_",
                    timeout_sec: float = 5.0) -> DataFrame:
    """tcppoll (esp_tcppoll.erl:30-90): periodic request/response
    polling of a TCP device — send a request string every interval,
    read one line back, split numeric values into prefix-numbered
    columns (the reference's convert/3 val_1..val_N fields).

    Same streaming shape as http_poll_source: the rate source is the
    clock, each surviving tick runs one executor-side exchange; a
    failed poll yields a null payload (conn_status 'down' analog)
    instead of killing the stream — the reference reconnects, we
    retry next tick (short-lived connection per poll; the persistent-
    socket optimization belongs to a custom data source at scale)."""
    import pandas as pd

    from faxe_spark.durations import parse_duration_ms

    every_s = max(1, parse_duration_ms(every) // 1000)
    rate = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    tick = rate.filter(F.col("value") % every_s == 0)

    def poll(batches):
        import socket

        for pdf in batches:
            payloads = []
            for _ in range(len(pdf)):
                try:
                    with socket.create_connection((host, port),
                                                  timeout=timeout_sec) as s:
                        s.sendall(request.encode() + b"\n")
                        buf = b""
                        while not buf.endswith(b"\n"):
                            chunk = s.recv(4096)
                            if not chunk:
                                break
                            buf += chunk
                    payloads.append(buf.decode("utf-8", errors="replace").strip())
                except OSError:
                    payloads.append(None)
            yield pd.DataFrame({"poll_ts": pdf["timestamp"],
                                "payload": payloads})

    out = tick.mapInPandas(poll, "poll_ts timestamp, payload string")
    # convert/3 analog: CSV payload -> prefix-numbered typed columns
    parts = F.split(F.col("payload"), ",")
    out = out.withColumn("_p", parts)
    n_probe = 4  # fixed width like the reference's count option
    cols = [F.col("_p").getItem(i).cast("double").alias(f"{prefix}{i + 1}")
            for i in range(n_probe)]
    return out.select("poll_ts", "payload", *cols)
