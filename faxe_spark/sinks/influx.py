"""InfluxDB line-protocol sink: faithful encoder, HTTP writer, and an
embedded test endpoint.

The reference's influx_out (esp_influx_out.erl) POSTs line-protocol
bodies to Influx's HTTP write API: path `/write?db=<db>&precision=ms`
(+ optional `&u=&p=` query auth and `&rp=<retention policy>`,
esp_influx_out.erl:163-175), expects 204, retries server errors up to
FAILED_RETRIES times (:144-161). The line encoder mirrors
influx_line.erl:

    measurement[,tag=v...] field=v[,field=v...] <ts>\n

with the reference's value rules (influx_line.erl:228-257): integers
bare (suffixed `i` only when encode_integer is set), floats printed
compact with up to 12 decimals, booleans `t`/`f`, strings passed RAW
(the reference writes binaries unquoted — kept for parity; note the
official line protocol would quote them), and map/list-valued fields
dropped before encoding (filter_fields, esp_influx_out.erl:212).
"""

from __future__ import annotations

import threading
import urllib.error
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import DataFrame

FAILED_RETRIES = 3  # esp_influx_out.erl ?FAILED_RETRIES


def _format_float(x: float) -> str:
    """float_to_list(F, [compact, {decimals, 12}]): fixed 12 decimals,
    then trailing zeros dropped (but at least one decimal digit)."""
    s = f"{x:.12f}"
    s = s.rstrip("0")
    if s.endswith("."):
        s += "0"
    return s


def encode_value(v, encode_integer: bool = False) -> str | None:
    if isinstance(v, bool):                    # before int (bool is int)
        return "t" if v else "f"
    if isinstance(v, int):
        return f"{v}i" if encode_integer else str(v)
    if isinstance(v, float):
        import math

        if math.isnan(v) or math.isinf(v):
            # line protocol has no NaN/Inf literal — `v=nan` 400s the
            # WHOLE request body on a real endpoint, dropping every
            # other point in the batch (r11 wire review). The
            # reference never hits this (Erlang floats have no NaN);
            # Spark doubles do, so the field filters out like the
            # map/list cases.
            return None
        return _format_float(v)
    if isinstance(v, str):
        return v                               # raw, see module doc
    if isinstance(v, (dict, list)):
        return None                            # filter_fields drops these
    return str(v)


def encode_point(measurement: str, fields: dict, tags: dict | None = None,
                 ts: int | None = None, *,
                 encode_integer: bool = False) -> str | None:
    """One line-protocol line (no trailing newline). Returns None when
    every field value filters out (None/dict/list): line protocol
    requires at least one field, and one empty-field line would 400
    the whole request body on a real endpoint (round-5 review find) —
    callers skip such rows."""
    parts = [measurement]
    for k, v in (tags or {}).items():
        if v is None or isinstance(v, (dict, list)):
            continue
        parts.append(f",{k}={v}")
    fparts = []
    for k, v in fields.items():
        ev = None if v is None else encode_value(v, encode_integer)
        if ev is not None:
            fparts.append(f"{k}={ev}")
    if not fparts:
        return None
    line = "".join(parts) + " " + ",".join(fparts)
    if ts is not None:
        line += f" {ts}"
    return line


def influx_write_url(host: str, port: int, db: str, *,
                     user: str | None = None, password: str | None = None,
                     retention_policy: str | None = None,
                     tls: bool = False) -> str:
    """build_path (esp_influx_out.erl:163-175): db + ms precision +
    optional query auth + optional retention policy."""
    url = (f"{'https' if tls else 'http'}://{host}:{port}"
           f"/write?db={db}&precision=ms")
    if user is not None:
        url += f"&u={user}&p={password or ''}"
    if retention_policy is not None:
        url += f"&rp={retention_policy}"
    return url


def post_lines(url: str, lines: list[str], *,
               retries: int = FAILED_RETRIES) -> bool:
    """POST a batch; 2xx ok (True), 4xx invalid — dropped without
    retry, False (a replay cannot fix a bad payload; the reference
    logs {error, invalid} the same way) — and 5xx/connect errors
    retried up to `retries` times (esp_influx_out.erl:144-161), then
    RAISED: the reference logs-and-drops after its retry ladder, but
    here an exhausted ladder must fail the (foreachBatch) epoch so
    the checkpoint never commits and the batch replays — silent loss
    otherwise (round-5 review find)."""
    body = ("".join(ln + "\n" for ln in lines)).encode()
    for _attempt in range(retries + 1):
        req = urllib.request.Request(
            url, data=body, headers={"content-type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=10) as resp:
                if 200 <= resp.status < 300:
                    return True
                return False
        except urllib.error.HTTPError as e:
            if 400 <= e.code < 500:
                return False                   # invalid: do not retry
            continue                           # 5xx: retry
        except OSError:
            continue
    raise RuntimeError(
        f"influx: write of {len(lines)} lines to {url} failed after "
        f"{retries} retries")


def influx_sink(df: DataFrame, *, host: str, port: int, database: str,
                measurement: str, tag_cols: list[str] | None = None,
                ts_col: str = "ts", user: str | None = None,
                password: str | None = None,
                retention_policy: str | None = None,
                encode_integer: bool = False,
                streaming: bool = False, checkpoint: str | None = None):
    """influx_out: every row becomes one line-protocol point — tags
    from `tag_cols`, the event time (ms) from `ts_col`, every other
    column a field. Batch mode posts once; streaming wraps the same
    writer in foreachBatch."""
    import pyspark.sql.functions as F

    url = influx_write_url(host, port, database, user=user,
                           password=password,
                           retention_policy=retention_policy)
    tag_cols = list(tag_cols or [])
    field_cols = [c for c in df.columns if c != ts_col
                  and c not in tag_cols]

    def write_batch(batch_df: DataFrame, _epoch_id: int | None = None):
        prepped = batch_df
        if ts_col in batch_df.columns and \
                dict(batch_df.dtypes)[ts_col].startswith("timestamp"):
            prepped = batch_df.withColumn(ts_col,
                                          F.unix_millis(F.col(ts_col)))

        # post_lines raises on an exhausted retry ladder — that is
        # what makes the streaming variant at-least-once (the failed
        # epoch never commits, the batch replays); a 4xx returns
        # False and the invalid payload drops, as the reference does
        flush = lambda lines: post_lines(url, lines)  # noqa: E731

        lines = []
        for r in prepped.toLocalIterator():
            d = r.asDict()
            line = encode_point(
                measurement,
                {c: d[c] for c in field_cols},
                {c: d[c] for c in tag_cols},
                d.get(ts_col),
                encode_integer=encode_integer)
            if line is not None:               # all-NULL fields: skip
                lines.append(line)
            if len(lines) >= 5000:             # bounded request bodies
                flush(lines)
                lines = []
        if lines:
            flush(lines)

    if streaming:
        w = df.writeStream.foreachBatch(write_batch)
        if checkpoint:
            w = w.option("checkpointLocation", checkpoint)
        return w.start()
    write_batch(df)
    return None


class InfluxHTTPServer:
    """Embedded Influx-write endpoint for tests: stores parsed lines
    per database, answers 204 like the real API, and can be armed to
    fail the next N requests with 503 (the retry-path test)."""

    def __init__(self, *, port: int = 0):
        self.points: dict[str, list[str]] = {}
        self.requests: list[str] = []
        self.fail_next = 0
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):            # noqa: N802 (stdlib casing)
                u = urlparse(self.path)
                body = self.rfile.read(
                    int(self.headers.get("content-length", 0)))
                outer.requests.append(self.path)
                if u.path != "/write":
                    self.send_response(404)
                    self.end_headers()
                    return
                if outer.fail_next > 0:
                    outer.fail_next -= 1
                    self.send_response(503)
                    self.end_headers()
                    return
                db = parse_qs(u.query).get("db", [""])[0]
                lines = [ln for ln in body.decode().split("\n") if ln]
                outer.points.setdefault(db, []).extend(lines)
                self.send_response(204)
                self.end_headers()

            def log_message(self, *a):    # silence test output
                pass

        self._srv = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self.port = self._srv.server_address[1]
        self._thread = threading.Thread(target=self._srv.serve_forever,
                                        daemon=True)
        self._thread.start()

    def stop(self):
        self._srv.shutdown()
        self._srv.server_close()
