"""S7comm wire lane: a minimal ISO-on-TCP client, payload decoding,
and an embedded test device.

The reference's s7read node (esp_s7read.erl:63) polls a Siemens PLC via
the snap7 library; the actual protocol underneath is public: ISO
transport over TCP (RFC 1006 TPKT + ISO 8073/COTP class 0) carrying
S7comm PDUs (protocol id 0x32; job/ack_data, setup-communication 0xF0,
read-var 0x04 with S7ANY item specs — the layout documented by the
Wireshark s7comm dissector and the snap7 sources). That is simple
enough to speak from the stdlib, so s7read gets a LIVE lane like
modbus_read (sources/modbus.py): the client executes the coalesced
wire plans produced by plc.plan_bulk_reads (the ported
esp_s7read.erl:356-455 optimizer) and splits each run's payload back
per alias exactly the way the reference's bld/decode does
(esp_s7read.erl:488-540) — byte-run bools bit-indexed LSB-first within
each byte, strings filtered to printable bytes, big-endian integer and
float words.

One deliberate divergence, kept consistent with the stub lane's typed
schema (plc.SPARK_TYPE): the reference decodes d_word as a 32-bit
FLOAT (esp_s7read.erl:537, an Erlang `:32/float-unsigned` that looks
unintended); here d_word decodes as an unsigned 32-bit integer, which
is what a DWORD is on the wire.
"""

from __future__ import annotations

import socket
import struct
import threading

from faxe_spark.plc import WORD_LEN_SIZE, BulkRead

# S7ANY transport sizes (snap7 S7WL* constants)
_WL_CODE = {"bit": 0x01, "byte": 0x02, "word": 0x04, "d_word": 0x06}
_WL_BYTES = {"byte": 1, "word": 2, "d_word": 4}

_ISO_DT = b"\x02\xf0\x80"  # COTP: len 2, DT TPDU, last fragment


def _tpkt(payload: bytes) -> bytes:
    return struct.pack(">BBH", 3, 0, len(payload) + 4) + payload


def decode_payload(dtype: str, data: bytes):
    """Decode one run's payload to a value list, mirroring
    esp_s7read.erl:515-540 decode/2 (except d_word, see module doc)."""
    if dtype == "bool_byte":
        # <<X:1>> extraction is MSB-first; prepare_byte_list reverses
        # each 8-chunk, so bit index i within the run reads byte i//8,
        # bit i%8 counted from the LSB (esp_s7read.erl:542-549)
        return [(b >> k) & 1 for b in data for k in range(8)]
    if dtype in ("byte", "usint"):
        return list(data)
    if dtype == "sint":
        return [b - 256 if b > 127 else b for b in data]
    if dtype == "char":
        return [bytes([b]).decode("latin-1") for b in data]
    if dtype == "string":
        # strip nulls / control chars, one string (esp_s7read.erl:524)
        return ["".join(chr(b) for b in data if b > 31)]
    if dtype == "int":
        return [v for (v,) in struct.iter_unpack(">h", data)]
    if dtype == "word":
        return [v for (v,) in struct.iter_unpack(">H", data)]
    if dtype == "d_int":
        return [v for (v,) in struct.iter_unpack(">i", data)]
    if dtype in ("d_word", "timer", "counter"):
        return [v for (v,) in struct.iter_unpack(">I", data)]
    if dtype == "float":
        return [v for (v,) in struct.iter_unpack(">f", data)]
    return [data]


def split_aliases(run: BulkRead, data: bytes) -> dict:
    """Map one run's payload back to {alias: value} — the bld/3 step
    (esp_s7read.erl:498-513): bool runs index a bit list, a lone
    string alias swallows the run, everything else zips decoded values
    with aliases in payload order."""
    if run.dtype == "bool":
        bits = decode_payload("bool_byte", data)
        return {name: bits[off] for name, _tag, off in run.aliases}
    names = [a[0] for a in run.aliases]
    if len(names) == 1 and run.aliases[0][1] == "string":
        return {names[0]: decode_payload("string", data)[0]}
    vals = decode_payload(run.dtype, data)
    return dict(zip(names, vals))


def chunk_plan(runs: list[BulkRead], *, max_items: int = 18,
               pdu_size: int = 240) -> list[list[BulkRead]]:
    """Split a plan across request frames: at most `max_items` S7ANY
    items per PDU and a response-payload budget of pdu_size - 32
    header/item bytes — the role of the reference's bit_count budget
    (esp_s7read.erl:472-486)."""
    budget = max(pdu_size - 32, 16)
    chunks: list[list[BulkRead]] = []
    cur: list[BulkRead] = []
    used = 0
    for r in runs:
        nbytes = _WL_BYTES[r.word_len] * r.amount + 5
        if cur and (len(cur) >= max_items or used + nbytes > budget):
            chunks.append(cur)
            cur, used = [], 0
        cur.append(r)
        used += nbytes
    if cur:
        chunks.append(cur)
    return chunks


class S7Client:
    """Blocking ISO-on-TCP / S7comm client (one request in flight, like
    the reference's s7worker). connect = COTP CR/CC + S7
    setup-communication; read_plan executes plc.plan_bulk_reads runs."""

    def __init__(self, host: str, port: int = 102, *, rack: int = 0,
                 slot: int = 1, timeout: float = 5.0,
                 flow_id: str = "default", node_id: str = "s7read"):
        from faxe_spark.streaming.metrics import CONN_STATUS

        self._ctx = {"flow_id": flow_id, "node_id": node_id,
                     "conn_type": "s7", "peer": f"{host}:{port}"}
        self._lock = threading.Lock()
        self._pdu_ref = 0
        CONN_STATUS.report(status="connecting", **self._ctx)
        try:
            self._sock = socket.create_connection((host, port),
                                                  timeout=timeout)
            self._connect(rack, slot)
        except OSError:
            CONN_STATUS.report(status="disconnected", **self._ctx)
            raise
        CONN_STATUS.report(status="connected", **self._ctx)

    def _connect(self, rack: int, slot: int) -> None:
        # COTP connection request: dst ref 0, src ref 1, class 0, with
        # calling/called TSAP parameters (0xC1/0xC2) as snap7 sends them
        tsap_dst = struct.pack(">H", 0x0100 + rack * 0x20 + slot)
        cotp_cr = (b"\xe0" + struct.pack(">HHB", 0, 1, 0)
                   + b"\xc1\x02\x01\x00" + b"\xc2\x02" + tsap_dst)
        self._sock.sendall(_tpkt(bytes([len(cotp_cr)]) + cotp_cr))
        resp = self._recv_tpkt()
        if len(resp) < 2 or resp[1] != 0xD0:
            raise ConnectionError("s7: COTP connection refused")
        # S7 setup communication (function 0xF0): AMQ 1/1, PDU 480
        param = struct.pack(">BBHHH", 0xF0, 0, 1, 1, 480)
        self._request(param, b"")
        self.pdu_size = 480

    def _request(self, param: bytes, data: bytes) -> tuple[bytes, bytes]:
        """Send one S7 job PDU, return (param, data) of the ack_data."""
        self._pdu_ref = (self._pdu_ref + 1) & 0xFFFF
        hdr = struct.pack(">BBHHHH", 0x32, 0x01, 0, self._pdu_ref,
                          len(param), len(data))
        self._sock.sendall(_tpkt(_ISO_DT + hdr + param + data))
        resp = self._recv_tpkt()
        if resp[:2] != b"\x02\xf0":
            raise ConnectionError("s7: expected COTP DT")
        s7 = resp[3:]
        if s7[0] != 0x32 or s7[1] != 0x03:        # ack_data
            raise ConnectionError(f"s7: unexpected ROSCTR {s7[1]:#x}")
        _pid, _ros, _res, ref, parlen, datlen, errcls, errcode = \
            struct.unpack(">BBHHHHBB", s7[:12])
        if ref != self._pdu_ref:
            raise ConnectionError(f"s7: pdu ref mismatch ({ref})")
        if errcls or errcode:
            raise ConnectionError(
                f"s7: error class {errcls:#x} code {errcode:#x}")
        return s7[12:12 + parlen], s7[12 + parlen:12 + parlen + datlen]

    def read_runs(self, runs: list[BulkRead]) -> list[bytes]:
        """One read-var request (function 0x04) for <= max_items runs;
        returns the raw payload per run."""
        with self._lock:
            param = struct.pack(">BB", 0x04, len(runs))
            for r in runs:
                code = _WL_CODE[r.word_len]
                addr = r.start * 8            # S7ANY address is in bits
                param += struct.pack(">BBBBHHB", 0x12, 0x0A, 0x10, code,
                                     r.amount, r.db_number, 0x84)
                param += bytes([(addr >> 16) & 0xFF, (addr >> 8) & 0xFF,
                                addr & 0xFF])
            rp, rd = self._request(param, b"")
        if rp[:2] != struct.pack(">BB", 0x04, len(runs)):
            raise ConnectionError(
                f"s7: read-var ack for {rp[1] if len(rp) > 1 else '?'} "
                f"items, expected {len(runs)}")
        payloads, pos = [], 0
        for i, r in enumerate(runs):
            retcode, tsize = rd[pos], rd[pos + 1]
            nbits = struct.unpack(">H", rd[pos + 2:pos + 4])[0]
            if retcode != 0xFF:
                raise ConnectionError(
                    f"s7: item {i} failed with return code {retcode:#x}")
            nbytes = nbits // 8 if tsize in (0x03, 0x04) else nbits
            payloads.append(rd[pos + 4:pos + 4 + nbytes])
            pos += 4 + nbytes
            if nbytes % 2 and i < len(runs) - 1:   # pad to even
                pos += 1
        return payloads

    def read_plan(self, plan: list[BulkRead]) -> dict:
        """Execute a full coalesced plan (chunked across PDUs by the
        byte budget) and return {alias: decoded value}."""
        values: dict = {}
        for chunk in chunk_plan(plan, pdu_size=getattr(self, "pdu_size",
                                                       240)):
            for run, payload in zip(chunk, self.read_runs(chunk)):
                values.update(split_aliases(run, payload))
        return values

    def close(self) -> None:
        from faxe_spark.streaming.metrics import CONN_STATUS

        self._sock.close()
        CONN_STATUS.report(status="disconnected", **self._ctx)

    def _recv_tpkt(self) -> bytes:
        hdr = self._recv_exact(4)
        _ver, _res, length = struct.unpack(">BBH", hdr)
        return self._recv_exact(length - 4)

    def _recv_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self._sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("s7: connection closed mid-frame")
            buf += chunk
        return buf


class S7Server:
    """Embedded S7 device for tests: serves DB areas from plain
    bytearrays {db_number: bytes}. Out-of-range bytes read as 0 (the
    sparse-map convention of ModbusServer)."""

    def __init__(self, dbs: dict[int, bytes] | None = None, *,
                 port: int = 0):
        self.dbs = {k: bytearray(v) for k, v in (dbs or {}).items()}
        self._srv = socket.create_server(("127.0.0.1", port))
        self.port = self._srv.getsockname()[1]
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self):
        self._srv.settimeout(0.2)
        while not self._stop.is_set():
            try:
                c, _ = self._srv.accept()
                c.settimeout(0.2)
                threading.Thread(target=self._handle, args=(c,),
                                 daemon=True).start()
            except socket.timeout:
                continue
            except OSError:
                break

    def _read_area(self, db: int, byte_start: int, nbytes: int) -> bytes:
        area = self.dbs.get(db, bytearray())
        out = bytearray(nbytes)
        for i in range(nbytes):
            j = byte_start + i
            if 0 <= j < len(area):
                out[i] = area[j]
        return bytes(out)

    def _handle(self, conn: socket.socket):
        try:
            while not self._stop.is_set():
                try:
                    hdr = self._recv_exact(conn, 4)
                except socket.timeout:
                    continue
                length = struct.unpack(">H", hdr[2:4])[0]
                body = self._recv_exact(conn, length - 4)
                if body[1] == 0xE0:                   # COTP CR -> CC
                    cc = b"\xd0" + body[2:4] + b"\x00\x01\x00"
                    conn.sendall(_tpkt(bytes([len(cc)]) + cc))
                    continue
                s7 = body[3:]                         # skip COTP DT
                _pid, _ros, _res, ref, parlen, _datlen = \
                    struct.unpack(">BBHHHH", s7[:10])
                param = s7[10:10 + parlen]
                if param[0] == 0xF0:                  # setup comm
                    self._reply(conn, ref, param, b"")
                elif param[0] == 0x04:                # read var
                    n = param[1]
                    items, pos = [], 2
                    for _ in range(n):
                        # spec layout: [12 0A 10 code][amount][db][84][addr3]
                        spec = param[pos:pos + 12]
                        code = spec[3]
                        amount = struct.unpack(">H", spec[4:6])[0]
                        db = struct.unpack(">H", spec[6:8])[0]
                        addr = int.from_bytes(spec[9:12], "big")
                        unit = {0x02: 1, 0x04: 2, 0x06: 4}[code]
                        data = self._read_area(db, addr // 8,
                                               amount * unit)
                        items.append(data)
                        pos += 12
                    rdata = b""
                    for i, data in enumerate(items):
                        rdata += struct.pack(">BBH", 0xFF, 0x04,
                                             len(data) * 8) + data
                        if len(data) % 2 and i < len(items) - 1:
                            rdata += b"\x00"
                    self._reply(conn, ref, struct.pack(">BB", 0x04,
                                                       len(items)), rdata)
                else:
                    self._reply(conn, ref, param[:1], b"", errcls=0x81,
                                errcode=0x04)
        except (ConnectionError, OSError, struct.error, IndexError):
            pass
        finally:
            try:
                conn.close()
            except OSError:
                pass

    def _reply(self, conn, ref: int, param: bytes, data: bytes, *,
               errcls: int = 0, errcode: int = 0):
        hdr = struct.pack(">BBHHHHBB", 0x32, 0x03, 0, ref, len(param),
                          len(data), errcls, errcode)
        conn.sendall(_tpkt(_ISO_DT + hdr + param + data))

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


def s7read_df(spark, *, host: str, port: int, rack: int = 0,
              slot: int = 1, addresses: list[str], aliases: list[str]):
    """One-shot poll as a single-row DataFrame (ts + one column per
    alias) — the batch analog of one esp_s7read tick; wire plan via
    plc.plan_bulk_reads, the modbus_read_df shape."""
    import pyspark.sql.functions as F

    from faxe_spark.plc import plan_bulk_reads

    plan = plan_bulk_reads(addresses, aliases)
    client = S7Client(host, port, rack=rack, slot=slot)
    try:
        values = client.read_plan(plan)
    finally:
        client.close()
    row = {a: values[a] for a in aliases}
    df = spark.createDataFrame([row])
    return df.select(F.current_timestamp().alias("ts"),
                     *[F.col(f"`{a}`") for a in aliases])


def s7_poll_source(spark, *, host: str, port: int, rack: int = 0,
                   slot: int = 1, addresses: list[str],
                   aliases: list[str], every: str = "1s",
                   align: bool = False):
    """The PERIODIC form of esp_s7read (its `every`/`align` options):
    one COALESCED bulk-read conversation per tick, executor-side, over
    the plc.plan_bulk_reads wire plan — the modbus_poll_source shape.
    Values land as one JSON payload per tick; failed ticks emit a null
    payload (conn_status 'down' analog)."""
    import json

    import pandas as pd
    import pyspark.sql.functions as F

    from faxe_spark.durations import parse_duration_ms
    from faxe_spark.plc import plan_bulk_reads

    plan = plan_bulk_reads(addresses, aliases)
    from faxe_spark.sources._poll import poll_ticks

    tick = poll_ticks(spark, every, align)

    def poll(batches):
        for pdf in batches:
            out_ts, out_vals = [], []
            for t in pdf["timestamp"]:
                try:
                    client = S7Client(host, port, rack=rack, slot=slot)
                    try:
                        values = client.read_plan(plan)
                    finally:
                        client.close()
                    out_vals.append(json.dumps(values, default=str))
                except Exception:  # noqa: BLE001 - any tick failure
                    out_vals.append(None)
                out_ts.append(t)
            yield pd.DataFrame({"poll_ts": out_ts, "values": out_vals})

    return tick.mapInPandas(poll, "poll_ts timestamp, values string")
