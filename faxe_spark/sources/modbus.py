"""Modbus-TCP wire lane: a minimal client, register decoding, and an
embedded test server.

The reference's esp_modbus_read.erl:81 polls a Modbus device over the
public Modbus-TCP application protocol (MBAP header + PDU, Modbus
Application Protocol Spec V1.1b3): function codes 1/2 read bit banks
(coils / discrete inputs), 3/4 read 16-bit register banks (holding /
input). The protocol is simple enough to speak from the stdlib, so —
unlike S7, whose snap7 transport stays out of scope — the modbus node
gets a LIVE lane here, tested against the embedded server the way the
broker nodes test against the embedded broker.

Decode formats mirror the reference's OUT_TYPES (esp_modbus_read.erl:
77): int16 / int32 / float32 / double / coils / ascii / binary,
big-endian register order (the modbus convention its Erlang modbus
library uses).
"""

from __future__ import annotations

import socket
import struct
import threading

FC_READ_COILS = 1
FC_READ_DISCRETE = 2
FC_READ_HOLDING = 3
FC_READ_INPUT = 4

# reference function names -> (function code, bit-addressed?)
FUNCTION_CODES = {
    "coils": (FC_READ_COILS, True),
    "inputs": (FC_READ_DISCRETE, True),
    "hregs": (FC_READ_HOLDING, False),
    "iregs": (FC_READ_INPUT, False),
    "memory": (FC_READ_HOLDING, False),  # the reference maps memory -> fc3
}


def decode_registers(regs: list[int], output: str = "",
                     signed: bool | None = None):
    """Decode a per-alias register slice like the reference's output
    option (esp_modbus_read.erl:255-264): registers are 16-bit
    big-endian words; multi-register values take the first register as
    the most significant word."""
    out = (output or "").lower()
    raw = b"".join(struct.pack(">H", r & 0xFFFF) for r in regs)
    if out in ("", "int16"):
        vals = [struct.unpack(">h" if signed else ">H",
                              raw[i:i + 2])[0]
                for i in range(0, len(raw), 2)]
        return vals[0] if len(vals) == 1 else vals
    if out == "int32":
        fmt = ">i" if signed else ">I"
        vals = [struct.unpack(fmt, raw[i:i + 4])[0]
                for i in range(0, len(raw), 4)]
        return vals[0] if len(vals) == 1 else vals
    if out == "float32":
        vals = [struct.unpack(">f", raw[i:i + 4])[0]
                for i in range(0, len(raw), 4)]
        return vals[0] if len(vals) == 1 else vals
    if out == "double":
        vals = [struct.unpack(">d", raw[i:i + 8])[0]
                for i in range(0, len(raw), 8)]
        return vals[0] if len(vals) == 1 else vals
    if out == "ascii":
        return raw.rstrip(b"\x00").decode("ascii", errors="replace")
    if out == "binary":
        return raw
    if out == "coils":
        return [bool(r) for r in regs]
    raise ValueError(f"unknown modbus output format {output!r}")


class ModbusClient:
    """Blocking Modbus-TCP client (one request in flight — the
    reference's reader is sequential per connection too)."""

    def __init__(self, host: str, port: int = 502, *, unit: int = 255,
                 timeout: float = 5.0, flow_id: str = "default",
                 node_id: str = "modbus"):
        from faxe_spark.streaming.metrics import CONN_STATUS

        self.unit = unit
        self._ctx = {"flow_id": flow_id, "node_id": node_id,
                     "conn_type": "modbus_tcp", "peer": f"{host}:{port}"}
        # connection_registry:reg + connecting/connected transitions
        # (esp_modbus_read.erl:113-115)
        CONN_STATUS.report(status="connecting", **self._ctx)
        try:
            self._sock = socket.create_connection((host, port),
                                                  timeout=timeout)
        except OSError:
            CONN_STATUS.report(status="disconnected", **self._ctx)
            raise
        CONN_STATUS.report(status="connected", **self._ctx)
        self._tid = 0
        self._lock = threading.Lock()

    def read(self, function: str, start: int, count: int) -> list[int]:
        """Read `count` registers (fc 3/4) or bits (fc 1/2) at `start`.
        Returns a list of ints (bit reads give 0/1)."""
        fc, is_bits = FUNCTION_CODES[function]
        with self._lock:
            self._tid = (self._tid + 1) & 0xFFFF
            sent_tid = self._tid  # compare against a local copy: another
            # thread may bump self._tid the moment the lock releases
            pdu = struct.pack(">BHH", fc, start, count)
            mbap = struct.pack(">HHHB", sent_tid, 0, len(pdu) + 1,
                               self.unit)
            self._sock.sendall(mbap + pdu)
            hdr = self._recv_exact(7)
            tid, _proto, length, _unit = struct.unpack(">HHHB", hdr)
            body = self._recv_exact(length - 1)
        if tid != sent_tid:
            raise ConnectionError(
                f"modbus: transaction id mismatch ({tid} != {sent_tid})")
        if body[0] & 0x80:
            raise ConnectionError(f"modbus exception code {body[1]}")
        if body[0] != fc:
            raise ConnectionError(f"modbus: unexpected fc {body[0]}")
        nbytes = body[1]
        data = body[2:2 + nbytes]
        if is_bits:
            return [(data[i // 8] >> (i % 8)) & 1 for i in range(count)]
        return [struct.unpack(">H", data[i:i + 2])[0]
                for i in range(0, nbytes, 2)]

    def read_plan(self, plan, *, outputs: dict | None = None) -> dict:
        """Execute a coalesced plan (plc.plan_modbus_reads BulkReads)
        and split each run's payload back per alias. Returns
        {alias: decoded value}. `outputs` maps alias ->
        (output_format, signed) — the run's word_len repr carries the
        shared opts when not given."""
        import ast

        values = {}
        for run in plan:
            regs = self.read(run.dtype, run.start, run.amount)
            opts = (None, None)
            if run.word_len and run.word_len.startswith("("):
                opts = ast.literal_eval(run.word_len)
            width = run.amount // len(run.aliases)
            for i, alias in enumerate(run.aliases):
                fmt, sgn = (outputs or {}).get(alias, opts)
                values[alias] = decode_registers(
                    regs[i * width:(i + 1) * width], fmt or "", sgn)
        return values

    def close(self):
        from faxe_spark.streaming.metrics import CONN_STATUS

        self._sock.close()
        CONN_STATUS.report(status="disconnected", **self._ctx)

    def _recv_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self._sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("modbus: connection closed mid-frame")
            buf += chunk
        return buf


class ModbusServer:
    """Embedded Modbus-TCP device for tests: serves four banks from
    plain dicts {address: value}. Unknown addresses read as 0 (the
    common device behavior for sparse maps)."""

    def __init__(self, *, hregs: dict | None = None,
                 iregs: dict | None = None, coils: dict | None = None,
                 discrete: dict | None = None, port: int = 0):
        self.banks = {
            FC_READ_HOLDING: dict(hregs or {}),
            FC_READ_INPUT: dict(iregs or {}),
            FC_READ_COILS: dict(coils or {}),
            FC_READ_DISCRETE: dict(discrete or {}),
        }
        self._srv = socket.create_server(("127.0.0.1", port))
        self.port = self._srv.getsockname()[1]
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self):
        self._srv.settimeout(0.2)
        conns = []
        while not self._stop.is_set():
            try:
                c, _ = self._srv.accept()
                c.settimeout(0.2)
                t = threading.Thread(target=self._handle, args=(c,),
                                     daemon=True)
                t.start()
                conns.append(c)
            except socket.timeout:
                continue
            except OSError:
                break
        for c in conns:
            try:
                c.close()
            except OSError:
                pass

    def _handle(self, conn: socket.socket):
        try:
            while not self._stop.is_set():
                try:
                    hdr = self._recv_exact(conn, 7)
                except socket.timeout:
                    continue
                tid, proto, length, unit = struct.unpack(">HHHB", hdr)
                body = self._recv_exact(conn, length - 1)
                fc, start, count = struct.unpack(">BHH", body[:5])
                bank = self.banks.get(fc)
                if bank is None:
                    resp = struct.pack(">BB", fc | 0x80, 1)  # illegal fn
                elif fc in (FC_READ_COILS, FC_READ_DISCRETE):
                    bits = bytearray((count + 7) // 8)
                    for i in range(count):
                        if bank.get(start + i):
                            bits[i // 8] |= 1 << (i % 8)
                    resp = struct.pack(">BB", fc, len(bits)) + bytes(bits)
                else:
                    regs = b"".join(
                        struct.pack(">H", bank.get(start + i, 0) & 0xFFFF)
                        for i in range(count))
                    resp = struct.pack(">BB", fc, len(regs)) + regs
                conn.sendall(struct.pack(">HHHB", tid, proto,
                                         len(resp) + 1, unit) + resp)
        except (ConnectionError, OSError):
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


def set_float32(bank: dict, start: int, value: float) -> None:
    """Store a float32 across two big-endian registers (test helper)."""
    hi, lo = struct.unpack(">HH", struct.pack(">f", value))
    bank[start], bank[start + 1] = hi, lo


def _decode_opts(aliases, outputs, signed) -> dict:
    """alias -> (output_format, signed) map shared by the one-shot tick
    and the periodic poller."""
    opts = {}
    for a, o, s in zip(aliases, outputs or [""] * len(aliases),
                       signed or [None] * len(aliases)):
        opts[a] = (o, s)
    return opts


def _json_tick(values: dict) -> str:
    """One tick's values as JSON; bytes ('binary' output format)
    encode as hex strings (json.dumps(default=str) would emit the
    Python repr — round-5 review find)."""
    import json

    return json.dumps({k: v.hex() if isinstance(v, (bytes, bytearray))
                       else v for k, v in values.items()}, default=str)


def modbus_read_df(spark, *, host: str, port: int, device: int = 255,
                   functions, starts, counts, aliases,
                   outputs=None, signed=None):
    """One-shot poll as a single-row DataFrame (ts + one column per
    alias) — the batch analog of one esp_modbus_read tick, wire plan
    via plc.plan_modbus_reads. Driver-side read (one tick is one
    device conversation; the streaming poller owns periodic reads)."""
    import pyspark.sql.functions as F

    from faxe_spark.plc import plan_modbus_reads

    plan = plan_modbus_reads(functions, starts, counts, aliases,
                             outputs=outputs, signed=signed)
    opts = _decode_opts(aliases, outputs, signed)
    client = ModbusClient(host, port, unit=device)
    try:
        values = client.read_plan(plan, outputs=opts)
    finally:
        client.close()
    row = {a: values[a] for a in aliases}
    df = spark.createDataFrame([row])
    return df.select(F.current_timestamp().alias("ts"),
                     *[F.col(f"`{a}`") for a in aliases])


def modbus_poll_source(spark, *, host: str, port: int, device: int = 255,
                       functions, starts, counts, aliases,
                       outputs=None, signed=None,
                       every: str = "1s", align: bool = False):
    """The PERIODIC form of esp_modbus_read (its `every`/`align`
    options — the node's default mode): the rate source provides the
    clock (http_poll_source shape), each surviving tick opens one
    device conversation executor-side and executes the coalesced
    plc.plan_modbus_reads wire plan; values land as one JSON payload
    per tick (schema-on-read; the alias columns are typed by the DFS
    stub lane). A failed tick emits a null payload — the conn_status
    'down' analog."""
    import json

    import pandas as pd
    import pyspark.sql.functions as F

    from faxe_spark.durations import parse_duration_ms
    from faxe_spark.plc import plan_modbus_reads

    plan = plan_modbus_reads(functions, starts, counts, aliases,
                             outputs=outputs, signed=signed)
    opts = _decode_opts(aliases, outputs, signed)
    from faxe_spark.sources._poll import poll_ticks

    tick = poll_ticks(spark, every, align)

    def poll(batches):
        for pdf in batches:
            out_ts, out_vals = [], []
            for t in pdf["timestamp"]:
                try:
                    client = ModbusClient(host, port, unit=device)
                    try:
                        values = client.read_plan(plan, outputs=opts)
                    finally:
                        client.close()
                    out_vals.append(_json_tick(values))
                except Exception:  # noqa: BLE001 - any tick failure
                    out_vals.append(None)
                out_ts.append(t)
            yield pd.DataFrame({"poll_ts": out_ts, "values": out_vals})

    return tick.mapInPandas(poll, "poll_ts timestamp, values string")
