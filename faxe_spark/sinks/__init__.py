"""Sink connectors (SURVEY.md §2.2 mapping).

| faxe node                  | here                                  |
|----------------------------|---------------------------------------|
| crate_out / postgre_out    | `jdbc_sink` (bulk) + live PG-wire     |
|                            | insert lane (sources/pgwire.py)       |
| influx_out                 | `influx.influx_sink` (line protocol   |
|                            | over HTTP, embedded-endpoint tested)  |
| mqtt_publish, amqp_publish | `kafka_sink`                          |
| http_post                  | `http_post_sink` (foreachBatch+urllib)|
| tcp_send / udp_send        | `tcp_send_sink` / `udp_send_sink`     |
| email                      | `email_sink` (smtplib, alert fan-in)  |
| log / debug                | `file_sink` / `console_sink`          |

The reference's `safe` on-disk queues + flow-ack retry chains
(esp_crate_out.erl deque/retries) are replaced by checkpointing +
idempotent batch writes (exactly-once, strictly stronger).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def file_sink(df: DataFrame, path: str, *, format: str = "parquet",
              mode: str = "append", partition_by: tuple[str, ...] = (),
              streaming: bool = False, checkpoint: str | None = None, **options):
    """log-file / parquet-lake sink (esp_log.erl:20). Partitioning by
    low-cardinality keys (date, type) is the 100 TB layout lever."""
    if streaming:
        w = df.writeStream.format(format).options(**options)
        if checkpoint:
            w = w.option("checkpointLocation", checkpoint)
        if partition_by:
            w = w.partitionBy(*partition_by)
        return w.start(path)
    w = df.write.format(format).mode(mode).options(**options)
    if partition_by:
        w = w.partitionBy(*partition_by)
    return w.save(path)


def console_sink(df: DataFrame, *, streaming: bool = False, num_rows: int = 20):
    """debug node (esp_debug.erl:24)."""
    if streaming:
        return df.writeStream.format("console").option("numRows", num_rows).start()
    df.show(num_rows, truncate=False)
    return None


def memory_sink(df: DataFrame, name: str, *, output_mode: str = "append",
                trigger_available_now: bool = True):
    """test sink: named in-memory table (the debug/golden-test surface)."""
    w = df.writeStream.format("memory").queryName(name).outputMode(output_mode)
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def kafka_sink(df: DataFrame, *, brokers: str, topic: str | None = None,
               topic_field: str | None = None,
               topic_expr=None,
               streaming: bool = True, checkpoint: str | None = None):
    """mqtt_publish/amqp_publish analog (esp_mqtt_publish.erl:46): JSON
    payload per row; `retained`/`safe` -> Kafka log + checkpoint.

    Topic routing mirrors the reference's three forms (:55-67,
    one_of_params): static `topic`, per-row `topic_field` (a column
    holding the topic), or `topic_expr` (any Column — the topic_lambda
    analog). Per-row routing uses Kafka's native `topic` column, so one
    sink fans out to many topics with no extra pass."""
    if sum(x is not None for x in (topic, topic_field, topic_expr)) != 1:
        raise ValueError("exactly one of topic / topic_field / topic_expr "
                         "(esp_mqtt_publish one_of_params)")
    cols = [F.to_json(F.struct(*df.columns)).alias("value")]
    if topic_field is not None:
        cols.append(F.col(topic_field).cast("string").alias("topic"))
    elif topic_expr is not None:
        cols.append(topic_expr.cast("string").alias("topic"))
    payload = df.select(*cols)
    if streaming:
        w = (payload.writeStream.format("kafka")
             .option("kafka.bootstrap.servers", brokers))
        if topic is not None:
            w = w.option("topic", topic)
        if checkpoint:
            w = w.option("checkpointLocation", checkpoint)
        return w.start()
    w = (payload.write.format("kafka")
         .option("kafka.bootstrap.servers", brokers))
    if topic is not None:
        w = w.option("topic", topic)
    return w.save()


def broker_bridge(spark, *, source_brokers: str, source_topic: str,
                  sink_brokers: str, topic_field: str = "key",
                  checkpoint: str | None = None):
    """mqtt_amqp_bridge analog (esp_mqtt_amqp_bridge.erl: subscribe one
    broker, publish each message to the other keyed by its topic,
    order-preserving, content-unaware). Composition of kafka_source ->
    kafka_sink with per-row topic routing; ordering within a source
    partition and at-least-once delivery come from the checkpointed
    stream (exactly-once with idempotent producer config)."""
    from faxe_spark.sources import kafka_source

    src = kafka_source(spark, brokers=source_brokers, topic=source_topic,
                       streaming=True)
    return kafka_sink(src, brokers=sink_brokers, topic_field=topic_field,
                      checkpoint=checkpoint)


def embedded_broker_bridge(spark, *, source, source_topic: str, sink,
                           sink_topic: str | None = None):
    """mqtt_amqp_bridge LIVE lane (esp_mqtt_amqp_bridge.erl): subscribe
    the source broker's topic as a stream and republish every raw
    payload to the sink broker, content-unaware and order-preserving —
    the embedded-broker analog of broker_bridge, so the bridge
    semantics are round-trip-testable in-container. Returns the
    StreamingQuery (caller stops it)."""
    from faxe_spark.sources import socket_source

    host, port = source.serve_topic(source_topic)
    raw = socket_source(spark, host=host, port=port)
    dst = sink_topic or source_topic

    def forward(batch_df: DataFrame, _epoch_id: int):
        for r in batch_df.collect():   # bounded: one micro-batch
            sink.publish(dst, r["value"])

    return (raw.writeStream.foreachBatch(forward)
            .trigger(processingTime="200 milliseconds").start())


def embedded_broker_sink_exactly_once(df: DataFrame, *, broker,
                                      topic: str, checkpoint: str,
                                      scope: str | None = None,
                                      fail_after_publish=None,
                                      fail_before_publish=None):
    """Exactly-once publish of a streaming DataFrame to the embedded
    broker: each micro-batch commits as ONE transaction keyed by its
    epoch id (broker.publish_batch), so a batch replayed after a crash
    — whether the crash hit before or after the broker write — lands
    exactly once. This is the executable form of the kafka_sink
    'flow-ack <-> checkpoint' claim (Kafka transactions / idempotent
    producer), provable in-container.

    fail_after_publish / fail_before_publish inject ONE forced failure
    at the named point (an Event-like object with is_set/set), for the
    kill-and-resume contract test. Returns the started query.

    The txn id is scoped by (topic, checkpoint) — epoch ids restart at
    0 per stream, so a bare epoch key would make a SECOND stream (or a
    restart on a fresh checkpoint) collide with an already-committed
    txn and silently drop its batch. Same contract as
    pgwire.postgre_out_exactly_once's scope parameter."""
    txn_scope = scope if scope is not None else f"{topic}@{checkpoint}"

    def write(batch_df: DataFrame, epoch_id: int):
        if fail_before_publish is not None and not fail_before_publish.is_set():
            fail_before_publish.set()
            raise RuntimeError("injected failure BEFORE publish")
        rows = [r["value"] for r in
                batch_df.select(F.to_json(F.struct(*batch_df.columns))
                                .alias("value")).collect()]
        broker.publish_batch(topic, rows, txn_id=f"{txn_scope}|{epoch_id}")
        if fail_after_publish is not None and not fail_after_publish.is_set():
            fail_after_publish.set()
            raise RuntimeError("injected failure AFTER publish")

    return (df.writeStream.foreachBatch(write)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True).start())


def jdbc_sink(df: DataFrame, *, url: str, table: str, user: str = "",
              password: str = "", mode: str = "append",
              streaming: bool = False, checkpoint: str | None = None,
              batchsize: int = 10_000):
    """crate_out/postgre_out analog (esp_crate_out.erl:79): bulk insert;
    db_fields column mapping = a select() upstream. Streaming variant
    wraps the batch writer in foreachBatch (per-epoch idempotency via
    epoch_id-keyed staging is the production pattern)."""
    def write_batch(batch_df: DataFrame, _epoch_id: int):
        (batch_df.write.format("jdbc")
         .option("url", url).option("dbtable", table)
         .option("user", user).option("password", password)
         .option("batchsize", str(batchsize))
         .mode(mode).save())

    if streaming:
        w = df.writeStream.foreachBatch(write_batch)
        if checkpoint:
            w = w.option("checkpointLocation", checkpoint)
        return w.start()
    write_batch(df, 0)
    return None


def crate_out_statement(table: str, db_fields: list[str], *,
                        database: str = "doc",
                        remaining_fields_as: str | None = None) -> str:
    """The exact INSERT statement esp_crate_out builds
    (esp_crate_out.erl:434-447 build_query): ts first, then db_fields,
    then the optional remaining-fields column, positional ? binds."""
    cols = ["ts", *db_fields]
    if remaining_fields_as is not None:
        cols.append(remaining_fields_as)
    marks = ", ".join(["?"] * len(cols))
    return (f"INSERT INTO {database}.{table} ({', '.join(cols)}) "
            f"VALUES ({marks})")


def crate_out_args(df: DataFrame, faxe_fields: list[str], *,
                   remaining_fields_as: str | None = None,
                   ts_col: str = "ts", dedup: bool = True) -> DataFrame:
    """Reshape a frame into the bulk_args row layout the statement
    binds (esp_crate_out.erl:374-380 build_value_stmt2): ts, each
    faxe_field read null-safe (missing path -> NULL, flowdata:fields/3),
    then — when remaining_fields_as is set — every OTHER top-level
    field as one JSON object (flowdata:to_map_except). dedup=True
    mirrors the batch content-dedup (phash memory queue :384-395):
    identical value rows collapse before the wire."""
    from faxe_spark.paths import get_path_safe

    cols = [F.col(ts_col).alias("ts")]
    cols += [get_path_safe(df, f).alias(f"arg_{i}")
             for i, f in enumerate(faxe_fields)]
    if remaining_fields_as is not None:
        roots = {f.split(".")[0].split("[")[0] for f in faxe_fields}
        rem = [c for c in df.columns if c != ts_col and c not in roots]
        cols.append(F.to_json(F.struct(*[F.col(c) for c in sorted(rem)]))
                    .alias("arg_rem"))
    out = df.select(*cols)
    return out.dropDuplicates() if dedup else out


def crate_out(df: DataFrame, *, host: str, port: int = 5432,
              table: str, database: str = "doc",
              db_fields: list[str] | None = None,
              faxe_fields: list[str] | None = None,
              remaining_fields_as: str | None = None,
              user: str = "crate", password: str = "",
              streaming: bool = False, checkpoint: str | None = None):
    """crate_out (esp_crate_out.erl:79): the db_fields/faxe_fields
    mapping + remaining-fields JSON column reshape feed the JDBC bulk
    writer (the reference posts the same statement over CrateDB's
    HTTP _sql bulk_args endpoint; JDBC is the Spark-native transport
    for the identical statement shape)."""
    faxe_fields = faxe_fields or db_fields or []
    db_fields = db_fields or faxe_fields
    args = crate_out_args(df, faxe_fields,
                          remaining_fields_as=remaining_fields_as)
    named = args.toDF("ts", *db_fields,
                      *([remaining_fields_as] if remaining_fields_as else []))
    return jdbc_sink(named,
                     url=f"jdbc:postgresql://{host}:{port}/{database}",
                     table=f"{database}.{table}", user=user,
                     password=password, streaming=streaming,
                     checkpoint=checkpoint)


def tcp_send_sink(df: DataFrame, *, host: str, port: int,
                  streaming: bool = False, framing: str = "line",
                  timeout_s: int = 10):
    """tcp_send analog (esp_tcp_send.erl:24,47: packet framing
    1|2|4-byte length prefix or 'line'): newline-delimited or
    length-prefixed JSON, one persistent connection PER PARTITION opened
    executor-side (foreachPartition) — never a driver collect, so
    throughput scales with partitions. framing: "line" | "1" | "2" | "4"."""
    import json as _json

    def send_partition(rows):
        import socket
        import struct as _struct

        sock = socket.create_connection((host, port), timeout=timeout_s)
        try:
            for r in rows:
                payload = _json.dumps(r.asDict(recursive=True), default=str).encode()
                if framing == "line":
                    sock.sendall(payload + b"\n")
                else:
                    fmt = {"1": ">B", "2": ">H", "4": ">I"}[framing]
                    sock.sendall(_struct.pack(fmt, len(payload)) + payload)
        finally:
            sock.close()

    if streaming:
        return df.writeStream.foreachBatch(
            lambda b, _e: b.foreachPartition(send_partition)).start()
    df.foreachPartition(send_partition)
    return None


def udp_send_sink(df: DataFrame, *, host: str, port: int,
                  streaming: bool = False):
    """udp_send analog (esp_udp_send.erl:5: "sends incoming data-items
    as json over udp"): one datagram per row, socket per partition,
    executor-side."""
    import json as _json

    def send_partition(rows):
        import socket

        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        try:
            for r in rows:
                sock.sendto(_json.dumps(r.asDict(recursive=True), default=str).encode(),
                            (host, port))
        finally:
            sock.close()

    if streaming:
        return df.writeStream.foreachBatch(
            lambda b, _e: b.foreachPartition(send_partition)).start()
    df.foreachPartition(send_partition)
    return None


def email_sink(df: DataFrame, *, smtp_relay: str, from_address: str,
               to: list[str], subject: str | None = None,
               body_field: str | None = None, subject_field: str | None = None,
               smtp_port: int = 25, smtp_user: str | None = None,
               smtp_pass: str | None = None, smtp_tls: bool = False,
               max_rows: int = 100, streaming: bool = False,
               smtp_factory=None):
    """email analog (esp_email.erl:37-49: from_address/smtp_relay/to/
    subject|subject_field/body|body_field). Alert-style sink: one message
    per batch, body = NDJSON of the (bounded) batch rows or the
    body_field of each. Driver-side by design — alert fan-in, not a
    data path. `smtp_factory` injects the transport (tests); default
    stdlib smtplib."""
    import json as _json
    from email.message import EmailMessage

    def send_batch(batch_df: DataFrame, _epoch_id: int):
        rows = [r.asDict(recursive=True) for r in batch_df.limit(max_rows).collect()]
        if not rows:
            return
        msg = EmailMessage()
        msg["From"] = from_address
        msg["To"] = ", ".join(to)
        first = rows[0]
        msg["Subject"] = (str(first.get(subject_field)) if subject_field
                          else (subject or "faxe_spark alert"))
        if body_field:
            body = "\n".join(str(r.get(body_field)) for r in rows)
        else:
            body = "\n".join(_json.dumps(r, default=str) for r in rows)
        msg.set_content(body)
        if smtp_factory is not None:
            smtp = smtp_factory(smtp_relay, smtp_port)
        else:
            import smtplib

            smtp = smtplib.SMTP(smtp_relay, smtp_port, timeout=10)
        try:
            if smtp_tls:
                smtp.starttls()
            if smtp_user:
                smtp.login(smtp_user, smtp_pass or "")
            smtp.send_message(msg)
        finally:
            smtp.quit()

    if streaming:
        return df.writeStream.foreachBatch(send_batch).start()
    send_batch(df, 0)
    return None


def http_post_sink(df: DataFrame, *, url: str, streaming: bool = False,
                   timeout_s: int = 10, max_rows_per_post: int = 1000):
    """http_post analog (esp_http_post.erl:34): POST JSON batches via
    stdlib urllib (no external deps); foreachBatch in streaming mode."""
    import json as _json
    import urllib.request

    def post_batch(batch_df: DataFrame, _epoch_id: int):
        rows = [r.asDict(recursive=True) for r in batch_df.limit(max_rows_per_post).collect()]
        req = urllib.request.Request(
            url, data=_json.dumps(rows, default=str).encode(),
            headers={"Content-Type": "application/json"})
        urllib.request.urlopen(req, timeout=timeout_s)

    if streaming:
        return df.writeStream.foreachBatch(post_batch).start()
    post_batch(df, 0)
    return None


class TcpServeSink:
    """tcp_serve (esp_tcp_serve.erl:50-86): SERVE flow data to clients
    that connect to us — the inverse of tcp_send. An acceptor thread
    (driver-side edge adapter, like the reference's ranch listener with
    max_connections=3) tracks connected clients; `push(df)` (or the
    foreachBatch callable from `updater()`) broadcasts each row as
    line-framed JSON to every connected client; rows arriving with no
    client connected are dropped, keeping only the last item — exactly
    the reference's `open = false` behavior."""

    def __init__(self, *, port: int = 0, host: str = "127.0.0.1",
                 max_connections: int = 3):
        import socket
        import threading

        self._clients: list = []
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self.last_item: dict | None = None
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind((host, port))
        srv.listen(max_connections)
        srv.settimeout(0.2)
        self.port = srv.getsockname()[1]
        self._srv = srv

        def accept_loop():
            while not self._stop.is_set():
                try:
                    conn, _ = srv.accept()
                except OSError:
                    continue
                with self._lock:
                    if len(self._clients) >= max_connections:
                        conn.close()
                        continue
                    self._clients.append(conn)
            srv.close()

        self._thread = threading.Thread(target=accept_loop, daemon=True)
        self._thread.start()

    def push(self, df: DataFrame, *, max_rows: int = 10_000) -> int:
        """Broadcast a batch to all connected clients. Driver-side,
        bounded collect — this is an alert/telemetry egress adapter,
        not a bulk-data path (same stance as http_post_sink)."""
        import json as _json

        rows = [r.asDict(recursive=True) for r in df.limit(max_rows).collect()]
        sent = 0
        for r in rows:
            self.last_item = r
            data = _json.dumps(r, default=str).encode() + b"\r\n"
            with self._lock:
                alive = []
                for c in self._clients:
                    try:
                        c.sendall(data)
                        alive.append(c)
                    except OSError:
                        c.close()  # client went away: drop it (DOWN msg)
                self._clients = alive
                if alive:
                    sent += 1
        return sent

    def updater(self):
        """foreachBatch callable for streaming flows."""
        return lambda batch_df, _id: self.push(batch_df)

    def stop(self):
        self._stop.set()
        self._thread.join(timeout=5)
        with self._lock:
            for c in self._clients:
                c.close()
            self._clients = []


def tcp_serve_sink(**kwargs) -> TcpServeSink:
    """tcp_serve analog — see TcpServeSink."""
    return TcpServeSink(**kwargs)


def run_sink_spec(df: DataFrame, spec: dict, **overrides):
    """Bind one DFS deferred-sink spec (DFSCompiler.sinks entries) to
    its live implementation and execute it on a BATCH DataFrame — the
    flow-start step the DFS front-end defers. `overrides` patch spec
    fields (tests point host/port at embedded endpoints; a deployment
    injects real addresses the same way). Kinds without an in-container
    transport raise with the spec intact."""
    s = {**spec, **overrides}
    kind = s["kind"]
    streaming = bool(df.isStreaming)           # forward the mode: the
    # deferred spec is bound at flow start, batch or stream alike
    if kind == "influx_write":
        from faxe_spark.sinks.influx import influx_sink

        return influx_sink(
            df, host=s["host"], port=int(s["port"]),
            database=s["database"],
            measurement=s["measurement"],
            tag_cols=s.get("tag_cols"),
            user=s.get("user"), password=s.get("password") or "",
            streaming=streaming, checkpoint=s.get("checkpoint"))
    if kind == "http_post_crate":
        from faxe_spark.sinks.crate_http import http_post_crate

        return http_post_crate(
            df, host=s["host"], port=int(s["port"]), table=s["table"],
            db_fields=s["db_fields"], faxe_fields=s.get("faxe_fields"),
            database=s.get("database", "doc"),
            remaining_fields_as=s.get("remaining_fields_as"),
            user=s.get("user"), password=s.get("password") or "",
            streaming=streaming, checkpoint=s.get("checkpoint"))
    if kind == "http_post":
        return http_post_sink(df, url=s["url"], streaming=streaming)
    if kind == "jdbc_write":
        raise NotImplementedError(
            "jdbc_write binds at deployment (needs a JDBC driver jar); "
            f"spec: {s}")
    raise NotImplementedError(f"unbound sink kind {kind!r}: {s}")
