"""MongoDB wire lane: minimal BSON, an OP_MSG client, and an embedded
queryable server.

The reference's mongo_query node (esp_mongo_query.erl:2 "Mongo DB
find") periodically runs `find(Collection, Selector)` with a JSON
selector and emits each result document under the `.as()` path. The
modern MongoDB wire protocol is public (OP_MSG, opcode 2013, MongoDB
docs "MongoDB Wire Protocol"; BSON per bsonspec.org): a 16-byte
message header, uint32 flagBits, one kind-0 section holding a BSON
command document. The subset a find node needs is small enough for
the stdlib, so mongo_query gets a LIVE lane like modbus/s7/pgwire:
the embedded server stores documents in memory and evaluates the
standard query operators ($eq implicit, $gt/$gte/$lt/$lte/$ne/$in,
dotted paths), the client issues real `find` commands and decodes the
cursor batch.

BSON subset: double(0x01) string(0x02) document(0x03) array(0x04)
bool(0x08) utc-datetime(0x09) null(0x0A) int32(0x10) int64(0x12) —
what JSON-shaped telemetry documents use. Production-scale ingest
stays on a connector (jdbc_source analog); this lane proves the node
semantics end-to-end in-container.
"""

from __future__ import annotations

import socket
import struct
import threading

OP_MSG = 2013


# ---------------------------------------------------------------------------
# BSON (subset)
# ---------------------------------------------------------------------------

def bson_encode(doc: dict) -> bytes:
    body = b""
    for k, v in doc.items():
        body += _bson_elem(k, v)
    return struct.pack("<i", len(body) + 5) + body + b"\x00"


def _bson_elem(key: str, v) -> bytes:
    k = key.encode() + b"\x00"
    if isinstance(v, bool):
        return b"\x08" + k + (b"\x01" if v else b"\x00")
    if isinstance(v, float):
        return b"\x01" + k + struct.pack("<d", v)
    if isinstance(v, int):
        if -(2 ** 31) <= v < 2 ** 31:
            return b"\x10" + k + struct.pack("<i", v)
        return b"\x12" + k + struct.pack("<q", v)
    if isinstance(v, str):
        s = v.encode() + b"\x00"
        return b"\x02" + k + struct.pack("<i", len(s)) + s
    if v is None:
        return b"\x0a" + k
    if isinstance(v, dict):
        return b"\x03" + k + bson_encode(v)
    if isinstance(v, (list, tuple)):
        return b"\x04" + k + bson_encode(
            {str(i): x for i, x in enumerate(v)})
    import datetime

    if isinstance(v, datetime.datetime):
        # BSON 0x09 is UTC ms since epoch; a NAIVE datetime is taken
        # as UTC (r11 wire review: .timestamp() on a naive value uses
        # the LOCAL zone, so the same document encoded differently on
        # differently-configured hosts — mongo_query's deployment
        # surface)
        if v.tzinfo is None:
            v = v.replace(tzinfo=datetime.timezone.utc)
        ms = int(v.timestamp() * 1000)
        return b"\x09" + k + struct.pack("<q", ms)
    raise TypeError(f"bson: unsupported type {type(v).__name__}")


def bson_decode(buf: bytes, pos: int = 0) -> tuple[dict, int]:
    (total,) = struct.unpack_from("<i", buf, pos)
    end = pos + total - 1                      # trailing \x00
    pos += 4
    doc: dict = {}
    while pos < end:
        t = buf[pos]
        pos += 1
        zero = buf.index(b"\x00", pos)
        key = buf[pos:zero].decode()
        pos = zero + 1
        if t == 0x01:
            (doc[key],) = struct.unpack_from("<d", buf, pos)
            pos += 8
        elif t == 0x02:
            (ln,) = struct.unpack_from("<i", buf, pos)
            doc[key] = buf[pos + 4:pos + 4 + ln - 1].decode()
            pos += 4 + ln
        elif t == 0x03:
            doc[key], pos = bson_decode(buf, pos)
        elif t == 0x04:
            arr, pos = bson_decode(buf, pos)
            doc[key] = [arr[k] for k in sorted(arr, key=int)]
        elif t == 0x08:
            doc[key] = buf[pos] == 1
            pos += 1
        elif t == 0x09:
            import datetime

            (ms,) = struct.unpack_from("<q", buf, pos)
            # decode to a NAIVE UTC datetime (see _bson_elem: the pair
            # round-trips on any host timezone)
            doc[key] = datetime.datetime.fromtimestamp(
                ms / 1000.0, tz=datetime.timezone.utc).replace(tzinfo=None)
            pos += 8
        elif t == 0x0A:
            doc[key] = None
        elif t == 0x10:
            (doc[key],) = struct.unpack_from("<i", buf, pos)
            pos += 4
        elif t == 0x12:
            (doc[key],) = struct.unpack_from("<q", buf, pos)
            pos += 8
        else:
            raise ValueError(f"bson: unsupported element type {t:#x}")
    return doc, end + 1


# ---------------------------------------------------------------------------
# selector evaluation (the embedded server's query engine)
# ---------------------------------------------------------------------------

def _get_path(doc, path: str):
    cur = doc
    for part in path.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return None
        cur = cur[part]
    return cur


_CMP = {
    "$gt": lambda a, b: a is not None and a > b,
    "$gte": lambda a, b: a is not None and a >= b,
    "$lt": lambda a, b: a is not None and a < b,
    "$lte": lambda a, b: a is not None and a <= b,
    "$ne": lambda a, b: a != b,
    "$eq": lambda a, b: a == b,
    "$in": lambda a, b: a in b,
}


def match_selector(doc: dict, selector: dict) -> bool:
    """Standard find-selector semantics for the supported operators:
    top-level keys AND together; a dict value holds $-operators,
    anything else is equality; dotted keys walk nested documents."""
    for key, cond in selector.items():
        if key == "$and":
            if not all(match_selector(doc, c) for c in cond):
                return False
            continue
        if key == "$or":
            if not any(match_selector(doc, c) for c in cond):
                return False
            continue
        val = _get_path(doc, key)
        if isinstance(cond, dict) and any(k.startswith("$") for k in cond):
            for op, rhs in cond.items():
                fn = _CMP.get(op)
                if fn is None:
                    raise ValueError(f"mongo: unsupported operator {op}")
                if not fn(val, rhs):
                    return False
        elif val != cond:
            return False
    return True


# ---------------------------------------------------------------------------
# wire
# ---------------------------------------------------------------------------

def _op_msg(request_id: int, response_to: int, body: dict) -> bytes:
    payload = struct.pack("<I", 0) + b"\x00" + bson_encode(body)
    hdr = struct.pack("<iiii", len(payload) + 16, request_id,
                      response_to, OP_MSG)
    return hdr + payload


class MongoClient:
    """Blocking OP_MSG client: `find` only (the node's whole surface)."""

    def __init__(self, host: str, port: int = 27017, *,
                 timeout: float = 5.0, flow_id: str = "default",
                 node_id: str = "mongo"):
        from faxe_spark.streaming.metrics import CONN_STATUS

        self._ctx = {"flow_id": flow_id, "node_id": node_id,
                     "conn_type": "mongodb", "peer": f"{host}:{port}"}
        self._rid = 0
        self._lock = threading.Lock()
        CONN_STATUS.report(status="connecting", **self._ctx)
        try:
            self._sock = socket.create_connection((host, port),
                                                  timeout=timeout)
        except OSError:
            CONN_STATUS.report(status="disconnected", **self._ctx)
            raise
        CONN_STATUS.report(status="connected", **self._ctx)

    def find(self, database: str, collection: str,
             selector: dict | None = None) -> list[dict]:
        with self._lock:
            self._rid += 1
            sent_rid = self._rid   # local copy: another thread may bump
            # self._rid the moment the lock releases (modbus.py pattern)
            cmd = {"find": collection, "filter": selector or {},
                   "$db": database}
            self._sock.sendall(_op_msg(sent_rid, 0, cmd))
            hdr = self._recv_exact(16)
            length, _rid, resp_to, opcode = struct.unpack("<iiii", hdr)
            body = self._recv_exact(length - 16)
        if opcode != OP_MSG or resp_to != sent_rid:
            raise ConnectionError("mongo: unexpected reply framing")
        if body[4:5] != b"\x00":
            raise ConnectionError("mongo: expected kind-0 section")
        doc, _ = bson_decode(body, 5)
        if doc.get("ok") != 1.0:
            raise ConnectionError(
                f"mongo: command failed: {doc.get('errmsg', doc)}")
        return doc["cursor"]["firstBatch"]

    def close(self) -> None:
        from faxe_spark.streaming.metrics import CONN_STATUS

        self._sock.close()
        CONN_STATUS.report(status="disconnected", **self._ctx)

    def _recv_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self._sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("mongo: connection closed")
            buf += chunk
        return buf


class MongoServer:
    """Embedded document store speaking OP_MSG `find`: collections are
    {(db, collection): [docs]}; selectors evaluate via
    match_selector."""

    def __init__(self, collections: dict[tuple[str, str], list[dict]]
                 | None = None, *, port: int = 0):
        self.collections = {k: list(v)
                            for k, v in (collections or {}).items()}
        self._srv = socket.create_server(("127.0.0.1", port))
        self.port = self._srv.getsockname()[1]
        self._stop = threading.Event()
        threading.Thread(target=self._serve, daemon=True).start()

    def _serve(self):
        self._srv.settimeout(0.2)
        while not self._stop.is_set():
            try:
                c, _ = self._srv.accept()
                c.settimeout(0.5)
                threading.Thread(target=self._handle, args=(c,),
                                 daemon=True).start()
            except socket.timeout:
                continue
            except OSError:
                break

    def _handle(self, conn: socket.socket):
        try:
            while not self._stop.is_set():
                # idle-tolerance ONLY before byte 0 of a message: the
                # old `recv_exact(16)`-with-timeout-continue could time
                # out after a PARTIAL header read and silently discard
                # the consumed bytes — every later message then parsed
                # desynced (r11 wire review). recv(1) consumes nothing
                # on timeout; a timeout PAST byte 0 is a broken peer
                # and drops the connection (outer except).
                try:
                    first = conn.recv(1)
                except socket.timeout:
                    continue
                if not first:
                    break                      # client closed cleanly
                hdr = first + self._recv_exact(conn, 15)
                length, rid, _rt, opcode = struct.unpack("<iiii", hdr)
                body = self._recv_exact(conn, length - 16)
                if opcode != OP_MSG:
                    break
                cmd, _ = bson_decode(body, 5)
                if "find" in cmd:
                    key = (cmd.get("$db", ""), cmd["find"])
                    try:
                        docs = [d for d in self.collections.get(key, [])
                                if match_selector(d, cmd.get("filter", {}))]
                        reply = {"cursor": {"firstBatch": docs, "id": 0,
                                            "ns": f"{key[0]}.{key[1]}"},
                                 "ok": 1.0}
                    except ValueError as e:
                        reply = {"ok": 0.0, "errmsg": str(e)}
                else:
                    reply = {"ok": 0.0, "errmsg": "unsupported command"}
                conn.sendall(_op_msg(0, rid, reply))
        except (ConnectionError, OSError, struct.error):
            pass
        finally:
            try:
                conn.close()
            except OSError:
                pass

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


def mongo_query_df(spark, *, host: str, port: int, database: str,
                   collection: str, query: str = "{}",
                   as_path: str = "data"):
    """One tick of esp_mongo_query: run the JSON selector as a real
    `find`, one row per result document, the document as a JSON string
    under the `.as()` column (the reference nests the doc under that
    path; dotted reads fall through get_path_safe's JSON extraction
    like the DFS stub schema)."""
    import json

    import pyspark.sql.functions as F

    selector = json.loads(query)
    client = MongoClient(host, port)
    try:
        docs = client.find(database, collection, selector)
    finally:
        client.close()
    rows = [(json.dumps(d, default=str),) for d in docs]
    df = spark.createDataFrame(rows or [], f"`{as_path}` string")
    return df.select(F.current_timestamp().alias("ts"), f"`{as_path}`")


def mongo_poll_source(spark, *, host: str, port: int, database: str,
                      collection: str, query: str = "{}",
                      every: str = "5s", align: bool = False,
                      as_path: str = "data"):
    """The PERIODIC form of esp_mongo_query (its `every` option, the
    default mode — the node re-runs the find on a timer): Spark's rate
    source provides the clock (the http_poll_source / pg_poll_source
    shape), each surviving tick runs one executor-side find, and every
    result document emits as one row with the JSON payload under the
    `.as()` column. A failed tick emits one null-payload row (the
    conn_status 'down' analog, filterable downstream)."""
    import json

    import pandas as pd
    import pyspark.sql.functions as F

    from faxe_spark.durations import parse_duration_ms

    selector = json.loads(query)
    from faxe_spark.sources._poll import poll_ticks

    tick = poll_ticks(spark, every, align)

    def poll(batches):
        for pdf in batches:
            out_ts, out_doc = [], []
            for t in pdf["timestamp"]:
                try:
                    client = MongoClient(host, port)
                    try:
                        docs = client.find(database, collection, selector)
                    finally:
                        client.close()
                    for d in docs:
                        out_ts.append(t)
                        out_doc.append(json.dumps(d, default=str))
                except Exception:  # noqa: BLE001 - ANY tick failure
                    # (connect, wire decode, reply shape) -> one
                    # null-payload row; a poller must outlive a bad
                    # tick (round-5 review find)
                    out_ts.append(t)
                    out_doc.append(None)
            yield pd.DataFrame({"poll_ts": out_ts, as_path: out_doc})

    return tick.mapInPandas(poll, f"poll_ts timestamp, `{as_path}` string")
