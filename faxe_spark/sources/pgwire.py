"""PostgreSQL v3 wire-protocol lane: a minimal client, an embedded
DuckDB-backed server, and the one-shot statement DataFrame.

The reference's postgre_statement node is explicitly "a one shot
statement against a postgreSQL compatible db, (PostGre, Crate, ...)"
(esp_postgre_statement.erl:2) and its crate_query node pushes its
time-bucket SQL to CrateDB over the same protocol — both speak the
PUBLIC PostgreSQL frontend/backend protocol v3 (documented in the
PostgreSQL manual, "Frontend/Backend Protocol"): a StartupMessage,
AuthenticationOk, simple Query ('Q'), RowDescription ('T') /
DataRow ('D') / CommandComplete ('C') / ReadyForQuery ('Z'), text
format values. That is simple enough to speak from the stdlib, so the
postgre/crate family gets a LIVE lane like modbus (sources/modbus.py)
and s7 (sources/s7.py): the embedded server executes received SQL on
a DuckDB connection — real result sets over the real wire format —
and the client is what the one-shot statement node and the postgre_out
insert path run on.

Production deployments would keep jdbc_source/jdbc_sink (partitioned
parallel reads); this lane proves the NODE semantics — statement
execution, result decode, insert layout, error propagation,
connection-status transitions — against a live server in-container.
"""

from __future__ import annotations

import socket
import struct
import threading

# text-format decode by type OID (PostgreSQL catalog constants)
OID_BOOL, OID_BYTEA, OID_INT8, OID_INT4, OID_INT2 = 16, 17, 20, 23, 21
OID_TEXT, OID_FLOAT4, OID_FLOAT8, OID_NUMERIC = 25, 700, 701, 1700
OID_DATE, OID_TIMESTAMP = 1082, 1114


def _msg(tag: bytes, payload: bytes) -> bytes:
    return tag + struct.pack(">I", len(payload) + 4) + payload


def decode_text(oid: int, text: str):
    if oid == OID_BOOL:
        return text == "t"
    if oid == OID_BYTEA:
        # PG hex output format: \x6162... (r11 wire review: the OID
        # was defined but undecoded — BLOB columns came back as the
        # raw hex string)
        return bytes.fromhex(text[2:]) if text.startswith("\\x") \
            else text.encode()
    if oid in (OID_INT2, OID_INT4, OID_INT8):
        return int(text)
    if oid in (OID_FLOAT4, OID_FLOAT8):
        return float(text)
    if oid == OID_NUMERIC:
        # NUMERIC/DECIMAL is arbitrary-precision; float() would lose
        # precision (0.1 accumulations, money) where the reference's
        # epgsql decodes losslessly. Keep it exact.
        import decimal

        return decimal.Decimal(text)
    if oid == OID_TIMESTAMP:
        import datetime

        return datetime.datetime.fromisoformat(text)
    if oid == OID_DATE:
        import datetime

        return datetime.date.fromisoformat(text)
    return text


def encode_text(v) -> str:
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, (bytes, bytearray)):
        return "\\x" + bytes(v).hex()
    import datetime

    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    return str(v)


def infer_oid(v) -> int:
    import datetime
    import decimal

    if isinstance(v, bool):
        return OID_BOOL
    if isinstance(v, (bytes, bytearray)):
        return OID_BYTEA
    if isinstance(v, int):
        return OID_INT8
    if isinstance(v, decimal.Decimal):
        return OID_NUMERIC          # lossless: decoded as Decimal
    if isinstance(v, float):
        return OID_FLOAT8
    if isinstance(v, datetime.datetime):
        return OID_TIMESTAMP
    if isinstance(v, datetime.date):
        return OID_DATE
    return OID_TEXT


def sql_literal(v) -> str:
    """Literal for the insert path (simple-query protocol has no binds;
    the reference's epgsql binds become literals here)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        import math

        # bare nan/inf are not SQL literals; the quoted-cast form is
        # accepted by PostgreSQL, CrateDB and DuckDB alike
        if math.isnan(v):
            return "CAST('NaN' AS DOUBLE PRECISION)"
        if math.isinf(v):
            s = "Infinity" if v > 0 else "-Infinity"
            return f"CAST('{s}' AS DOUBLE PRECISION)"
        return repr(v)
    if isinstance(v, int):
        return str(v)
    import decimal

    if isinstance(v, decimal.Decimal):
        # PostgreSQL NUMERIC admits NaN (and +-Infinity since v14);
        # bare NaN is not a SQL literal, so quote-cast like the float
        # branch — there is no precision to preserve in a non-finite
        if not v.is_finite():
            s = ("NaN" if v.is_nan()
                 else ("Infinity" if v > 0 else "-Infinity"))
            return f"CAST('{s}' AS DOUBLE PRECISION)"
        return str(v)               # exact decimal text, no float round
    import datetime

    if isinstance(v, datetime.datetime):
        return "TIMESTAMP '" + v.isoformat(sep=" ") + "'"
    if isinstance(v, datetime.date):
        return "DATE '" + v.isoformat() + "'"
    return "'" + str(v).replace("'", "''") + "'"


class PGWireClient:
    """Minimal v3-protocol client: trust-auth startup + simple query.
    One request in flight (the reference's connection is sequential)."""

    def __init__(self, host: str, port: int, *, user: str = "faxe",
                 database: str = "db", timeout: float = 5.0,
                 flow_id: str = "default", node_id: str = "postgre"):
        from faxe_spark.streaming.metrics import CONN_STATUS

        self._ctx = {"flow_id": flow_id, "node_id": node_id,
                     "conn_type": "pgsql", "peer": f"{host}:{port}"}
        self._lock = threading.Lock()
        CONN_STATUS.report(status="connecting", **self._ctx)
        try:
            self._sock = socket.create_connection((host, port),
                                                  timeout=timeout)
            params = (f"user\0{user}\0database\0{database}\0\0").encode()
            pkt = struct.pack(">II", len(params) + 8, 196608) + params
            self._sock.sendall(pkt)
            self._await_ready()
        except OSError:
            CONN_STATUS.report(status="disconnected", **self._ctx)
            raise
        CONN_STATUS.report(status="connected", **self._ctx)

    def query(self, sql: str) -> tuple[list[str], list[list]]:
        """Simple-query round trip: returns (column names, rows of
        decoded Python values). DDL/DML return ([], [])."""
        with self._lock:
            self._sock.sendall(_msg(b"Q", sql.encode() + b"\0"))
            cols: list[str] = []
            oids: list[int] = []
            rows: list[list] = []
            err = None
            while True:
                tag, payload = self._recv_msg()
                if tag == b"T":
                    (nf,) = struct.unpack(">H", payload[:2])
                    pos = 2
                    cols, oids = [], []
                    for _ in range(nf):
                        end = payload.index(b"\0", pos)
                        cols.append(payload[pos:end].decode())
                        _tbl, _att, oid, _tl, _tm, _fmt = struct.unpack(
                            ">IHIhih", payload[end + 1:end + 19])
                        oids.append(oid)
                        pos = end + 19
                elif tag == b"D":
                    (nf,) = struct.unpack(">H", payload[:2])
                    pos = 2
                    row = []
                    for i in range(nf):
                        (ln,) = struct.unpack(">i", payload[pos:pos + 4])
                        pos += 4
                        if ln < 0:
                            row.append(None)
                        else:
                            row.append(decode_text(
                                oids[i], payload[pos:pos + ln].decode()))
                            pos += ln
                    rows.append(row)
                elif tag == b"E":
                    parts = payload.split(b"\0")
                    err = "; ".join(p[1:].decode() for p in parts
                                    if p and p[0:1] in (b"M", b"C"))
                elif tag == b"Z":
                    break
                # 'C' CommandComplete / 'S' ParameterStatus etc.: skip
            if err:
                raise RuntimeError(f"pgwire: {err}")
            return cols, rows

    def close(self) -> None:
        from faxe_spark.streaming.metrics import CONN_STATUS

        try:
            self._sock.sendall(_msg(b"X", b""))
        except OSError:
            pass
        self._sock.close()
        CONN_STATUS.report(status="disconnected", **self._ctx)

    def _await_ready(self) -> None:
        while True:
            tag, payload = self._recv_msg()
            if tag == b"R":
                (code,) = struct.unpack(">I", payload[:4])
                if code != 0:
                    raise ConnectionError(
                        f"pgwire: unsupported auth method {code}")
            elif tag == b"E":
                raise ConnectionError("pgwire: startup rejected")
            elif tag == b"Z":
                return

    def _recv_msg(self) -> tuple[bytes, bytes]:
        hdr = self._recv_exact(5)
        tag, length = hdr[:1], struct.unpack(">I", hdr[1:5])[0]
        return tag, self._recv_exact(length - 4)

    def _recv_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self._sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("pgwire: connection closed")
            buf += chunk
        return buf


class PGWireServer:
    """Embedded PostgreSQL-compatible endpoint for tests, executing
    received SQL on a DuckDB connection (CrateDB plays the same role
    for the reference: a PG-wire speaker with its own engine). Trust
    auth; text format; one connection per thread with its own DuckDB
    cursor (duckdb connections are not thread-safe to share)."""

    def __init__(self, duck_con, *, port: int = 0):
        self._con = duck_con
        self._lock = threading.Lock()
        self._srv = socket.create_server(("127.0.0.1", port))
        self.port = self._srv.getsockname()[1]
        self._stop = threading.Event()
        threading.Thread(target=self._serve, daemon=True).start()

    def _serve(self):
        self._srv.settimeout(0.2)
        while not self._stop.is_set():
            try:
                c, _ = self._srv.accept()
                c.settimeout(5.0)
                threading.Thread(target=self._handle, args=(c,),
                                 daemon=True).start()
            except socket.timeout:
                continue
            except OSError:
                break

    def _handle(self, conn: socket.socket):
        # ONE DuckDB cursor (= connection) per wire connection, so
        # session state — in particular a BEGIN/COMMIT transaction
        # spanning several Query messages, which the exactly-once sink
        # relies on — behaves like a real server's backend session
        cur = self._con.cursor()
        try:
            # startup: length + version + params
            hdr = self._recv_exact(conn, 8)
            length, version = struct.unpack(">II", hdr)
            self._recv_exact(conn, length - 8)
            if version == 80877103:          # SSLRequest: decline
                conn.sendall(b"N")
                hdr = self._recv_exact(conn, 8)
                length, version = struct.unpack(">II", hdr)
                self._recv_exact(conn, length - 8)
            conn.sendall(_msg(b"R", struct.pack(">I", 0)))   # AuthOk
            conn.sendall(_msg(b"Z", b"I"))
            while not self._stop.is_set():
                tag = self._recv_exact(conn, 1)
                (length,) = struct.unpack(">I", self._recv_exact(conn, 4))
                payload = self._recv_exact(conn, length - 4)
                if tag == b"X":
                    return
                if tag != b"Q":
                    conn.sendall(_msg(b"E", b"SERROR\0Munsupported\0\0"))
                    conn.sendall(_msg(b"Z", b"I"))
                    continue
                sql = payload.rstrip(b"\0").decode()
                self._execute(conn, cur, sql)
                conn.sendall(_msg(b"Z", b"I"))
        except (ConnectionError, OSError, struct.error):
            pass
        finally:
            try:
                cur.close()
            except Exception:  # noqa: BLE001 - teardown best-effort
                pass
            try:
                conn.close()
            except OSError:
                pass

    def _execute(self, conn: socket.socket, cur, sql: str):
        try:
            with self._lock:
                cur.execute(sql)
                desc = cur.description
                rows = cur.fetchall() if desc else []
        except Exception as e:  # noqa: BLE001 - any engine error -> 'E'
            conn.sendall(_msg(
                b"E", b"SERROR\0C42000\0M" + str(e).encode() + b"\0\0"))
            return
        if desc:
            # infer an OID per column from the first non-null value
            oids = []
            for i, d in enumerate(desc):
                sample = next((r[i] for r in rows if r[i] is not None),
                              None)
                oids.append(infer_oid(sample))
            body = struct.pack(">H", len(desc))
            for d, oid in zip(desc, oids):
                body += d[0].encode() + b"\0"
                body += struct.pack(">IHIhih", 0, 0, oid, -1, -1, 0)
            conn.sendall(_msg(b"T", body))
            for r in rows:
                body = struct.pack(">H", len(r))
                for v in r:
                    if v is None:
                        body += struct.pack(">i", -1)
                    else:
                        t = encode_text(v).encode()
                        body += struct.pack(">i", len(t)) + t
                conn.sendall(_msg(b"D", body))
        tag = f"SELECT {len(rows)}" if desc else "OK"
        conn.sendall(_msg(b"C", tag.encode() + b"\0"))

    @staticmethod
    def _recv_exact(conn: socket.socket, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("closed")
            buf += chunk
        return buf

    def stop(self):
        self._stop.set()
        try:
            self._srv.close()
        except OSError:
            pass


def postgre_statement_df(spark, *, host: str, port: int, statement: str,
                         user: str = "faxe", database: str = "db"):
    """One-shot statement as a DataFrame (esp_postgre_statement.erl:2
    one-shot mode; result_type=batch — every result row becomes one
    Spark row). Driver-side read, like modbus_read_df/s7read_df: one
    shot is one connection conversation; bulk parallel ingest is
    jdbc_source's job."""
    client = PGWireClient(host, port, user=user, database=database)
    try:
        cols, rows = client.query(statement)
    finally:
        client.close()
    if not cols:
        return spark.createDataFrame([], "ok boolean")
    return spark.createDataFrame(
        [tuple(r) for r in rows] or [], ", ".join(
            f"`{c}` {_spark_type(rows, i)}" for i, c in enumerate(cols)))


def _spark_type(rows: list[list], i: int) -> str:
    import datetime
    import decimal

    sample = next((r[i] for r in rows if r[i] is not None), None)
    if isinstance(sample, bool):
        return "boolean"
    if isinstance(sample, int):
        return "bigint"
    if isinstance(sample, decimal.Decimal):
        # lossless NUMERIC: size the Spark decimal to the DATA (the
        # wire typmod isn't threaded here) — a fixed decimal(38,18)
        # silently rounds scale>18 values, the opposite of the point.
        # Non-finite (NaN/Inf) or >38-digit values fall back to string:
        # Spark decimals can represent neither, and string keeps every
        # digit.
        max_s, max_i = 0, 1
        for r in rows:
            v = r[i]
            if not isinstance(v, decimal.Decimal):
                continue
            if not v.is_finite():
                return "string"
            t = v.as_tuple()
            max_s = max(max_s, max(0, -t.exponent))
            max_i = max(max_i, len(t.digits) + t.exponent)
        if max_i + max_s <= 38:
            return f"decimal({max_i + max_s},{max_s})"
        return "string"
    if isinstance(sample, float):
        return "double"
    if isinstance(sample, datetime.datetime):
        return "timestamp"
    if isinstance(sample, datetime.date):
        return "date"
    return "string"


def quote_ident(name: str) -> str:
    """Double-quote an SQL identifier (r11 wire review: DataFrame
    column names are arbitrary — a reserved word or a space broke the
    INSERT column list; values were already literal-escaped)."""
    return '"' + name.replace('"', '""') + '"'


def postgre_out_insert(client: PGWireClient, table: str, df,
                       *, batch_size: int = 500) -> int:
    """postgre_out insert path over the wire: multi-row INSERTs in
    bounded batches (the reference's epgsql bulk binds become
    literals — simple-query protocol has no binds). Returns rows
    written. Driver-side like the one-shot statement; the scale path
    stays jdbc_sink."""
    cols = df.columns
    collist = ", ".join(quote_ident(c) for c in cols)
    total = 0
    batch: list[str] = []
    for r in df.toLocalIterator():
        batch.append("(" + ", ".join(sql_literal(r[c]) for c in cols) + ")")
        if len(batch) >= batch_size:
            client.query(f"INSERT INTO {table} ({collist}) VALUES "
                         + ", ".join(batch))
            total += len(batch)
            batch = []
    if batch:
        client.query(f"INSERT INTO {table} ({collist}) VALUES "
                     + ", ".join(batch))
        total += len(batch)
    return total


def bind_range(query: str, lo, hi) -> str:
    """Bind $1/$2 placeholders (what time_bucket_query emits) to the
    range ends as timestamp literals. (?!\d) guards longest-match:
    plain str.replace corrupted any query that also used higher
    placeholder numbers — $1 ate the prefix of $10 (r11 wire
    review)."""
    import re

    bound = re.sub(r"\$1(?!\d)",
                   "TIMESTAMP '" + lo.isoformat(sep=" ") + "'", query)
    return re.sub(r"\$2(?!\d)",
                  "TIMESTAMP '" + hi.isoformat(sep=" ") + "'", bound)


def pg_poll_source(spark, *, host: str, port: int, query: str,
                   every: str = "10s", period: str | None = None,
                   offset: str = "0s", align: bool = False,
                   user: str = "faxe", database: str = "db"):
    """crate_query_cont (esp_crate_query_cont.erl): re-run a
    time-bucketed query continuously over an advancing range. The
    reference keeps a query_mark and queries [mark - period, mark]
    each tick, `offset` behind now so late rows have landed; here the
    clock is Spark's rate source (the http_poll_source shape) and the
    range is a PURE FUNCTION of the tick timestamp — [tick - offset -
    period, tick - offset] — so replays and restarts recompute the
    same ranges (the streaming-safe form of the advancing mark).

    $1/$2 placeholders in `query` (what time_bucket_query emits) bind
    to the range ends as timestamp literals. Each tick's result rows
    emit as JSON strings (schema-on-read, like mongo_query_df)."""
    import pandas as pd
    import pyspark.sql.functions as F

    from faxe_spark.durations import parse_duration_ms

    from faxe_spark.sources._poll import poll_ticks

    period_ms = parse_duration_ms(period if period is not None else every)
    offset_ms = parse_duration_ms(offset)
    tick = poll_ticks(spark, every, align)

    def poll(batches):
        import datetime
        import json

        for pdf in batches:
            out_ts, out_rows = [], []
            for t in pdf["timestamp"]:
                t = t.to_pydatetime()
                hi = t - datetime.timedelta(milliseconds=offset_ms)
                lo = hi - datetime.timedelta(milliseconds=period_ms)
                bound = bind_range(query, lo, hi)
                try:
                    client = PGWireClient(host, port, user=user,
                                          database=database)
                    try:
                        cols, rows = client.query(bound)
                    finally:
                        client.close()
                    for r in rows:
                        out_ts.append(t)
                        out_rows.append(json.dumps(
                            dict(zip(cols, r)), default=str))
                except Exception:  # noqa: BLE001 - ANY tick failure
                    # (connect, wire decode, engine error) -> one null
                    # payload row, the conn_status 'down' analog
                    # (http_poll_source shape); a poller must outlive
                    # a bad tick
                    out_ts.append(t)
                    out_rows.append(None)
            yield pd.DataFrame({"poll_ts": out_ts, "payload": out_rows})

    return tick.mapInPandas(poll, "poll_ts timestamp, payload string")


def postgre_out_exactly_once(client: PGWireClient, table: str, df, *,
                             epoch: int | str, scope: str = "",
                             txn_table: str = "faxe_txn_log",
                             batch_size: int = 500) -> bool:
    """Exactly-once insert of one micro-batch: the inserts and an
    epoch marker in `txn_table` commit inside ONE transaction — a
    replayed epoch (crash after the DB write, before the stream
    checkpoint committed) finds its marker and inserts nothing. The
    transaction spans several Query messages (BEGIN, one bounded
    INSERT per `batch_size` rows, the marker, COMMIT) — protocol-legal
    and memory-bounded: rows stream through toLocalIterator and never
    materialize as one list or one giant SQL string. A crash
    mid-transaction rolls back data AND marker, so the replay starts
    clean. Returns False when the epoch was already committed.

    `scope` namespaces the marker (round-5 review find): epoch ids
    restart at 0 for every stream, so two sinks sharing a txn_table —
    or one sink restarted on a FRESH checkpoint — would otherwise
    swallow each other's batches. postgre_sink_exactly_once scopes by
    table + checkpoint path; deleting a checkpoint while keeping the
    txn_table is a new stream and needs a new scope."""
    e = (f"{scope}|{epoch}" if scope else str(epoch)).replace("'", "''")
    cols = df.columns
    collist = ", ".join(quote_ident(c) for c in cols)
    already = client.query(
        f"SELECT count(*) AS n FROM {txn_table} WHERE epoch = '{e}'")
    if already[1][0][0]:
        return False
    client.query("BEGIN TRANSACTION")
    try:
        batch: list[str] = []

        def flush():
            if batch:
                client.query(
                    f"INSERT INTO {table} ({collist}) VALUES "
                    + ", ".join(batch))
                batch.clear()

        for r in df.toLocalIterator():
            batch.append(
                "(" + ", ".join(sql_literal(r[c]) for c in cols) + ")")
            if len(batch) >= batch_size:
                flush()
        flush()
        client.query(f"INSERT INTO {txn_table} VALUES ('{e}')")
        client.query("COMMIT")
    except Exception:
        try:
            client.query("ROLLBACK")
        except Exception:  # noqa: BLE001 - connection may be gone
            pass
        raise
    return True


def postgre_sink_exactly_once(df, *, host: str, port: int, table: str,
                              checkpoint: str, user: str = "faxe",
                              database: str = "db",
                              txn_table: str = "faxe_txn_log",
                              fail_after_write=None,
                              fail_before_write=None):
    """Streaming exactly-once DB sink: foreachBatch wraps
    postgre_out_exactly_once with the micro-batch's epoch id — the DB
    analog of embedded_broker_sink_exactly_once (same kill-and-resume
    contract: no-dup when the crash lands after the DB transaction,
    no-loss when it lands before). The txn_table must exist (one
    `CREATE TABLE ... (epoch VARCHAR)` at deploy time)."""
    def write(batch_df, epoch_id: int):
        if fail_before_write is not None and not fail_before_write.is_set():
            fail_before_write.set()
            raise RuntimeError("injected failure BEFORE write")
        client = PGWireClient(host, port, user=user, database=database)
        try:
            postgre_out_exactly_once(client, table, batch_df,
                                     epoch=epoch_id,
                                     scope=f"{table}@{checkpoint}",
                                     txn_table=txn_table)
        finally:
            client.close()
        if fail_after_write is not None and not fail_after_write.is_set():
            fail_after_write.set()
            raise RuntimeError("injected failure AFTER write")

    return (df.writeStream.foreachBatch(write)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True).start())
