"""Flow observability — the `node_metrics` / `conn_status` analog.

Reference: every faxe node carries items_in / items_out meters and a
processing-time histogram, collected every 5 s
(apps/faxe/src/lib/node_metrics.erl:28-60; interval
apps/faxe/src/flow/df_graph.erl:68,287). faxe exposes them per node;
Spark's unit of execution is the QUERY (operators are fused by
Catalyst), so the equivalent surface is per-query progress:

- streaming: `FlowMetricsListener` (StreamingQueryListener) tracks
  rows-in / rows-per-second / batch durations / watermark per query —
  the same numbers `query.lastProgress` carries, retained as a bounded
  history with counters.
- batch: `observed()` wraps a DataFrame with `df.observe()` metric
  expressions — collected ON THE EXECUTORS during the action, zero
  extra passes (the Spark-native items_out meter).

conn_status (broker up/down events) maps to the listener's
onQueryProgress/onQueryTerminated callbacks: a terminated query with an
exception IS the disconnected signal; reconnect policy belongs to the
restart loop, as in the reference's reconnector.
"""

from __future__ import annotations

import collections
import threading
import time

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql.streaming import StreamingQueryListener


class FlowMetricsListener(StreamingQueryListener):
    """Per-query meters with a bounded progress history.

    `snapshot()` -> {query_name: {"items_in": total rows ingested,
    "rate": last input rows/sec, "batches": micro-batch count,
    "proc_ms": last batch duration, "watermark": str, "status": ...}}.
    """

    def __init__(self, history: int = 32):
        self._lock = threading.Lock()
        self._stats: dict[str, dict] = {}
        self._history = history

    def _entry(self, qid, name=None):
        return self._stats.setdefault(str(qid), {
            "name": name, "items_in": 0, "batches": 0, "rate": 0.0,
            "proc_ms": None, "watermark": None, "status": "running",
            "started_at": time.time(),
            "recent": collections.deque(maxlen=self._history),
        })

    # StreamingQueryListener interface ------------------------------
    def onQueryStarted(self, event):
        with self._lock:
            self._entry(event.id, event.name)

    def onQueryProgress(self, event):
        p = event.progress
        with self._lock:
            s = self._entry(p.id, p.name)
            s["name"] = s["name"] or p.name
            s["items_in"] += p.numInputRows
            s["batches"] += 1
            s["rate"] = p.inputRowsPerSecond
            s["proc_ms"] = p.batchDuration
            s["watermark"] = p.eventTime.get("watermark") if p.eventTime else None
            s["recent"].append((p.batchId, p.numInputRows, p.batchDuration))

    def onQueryTerminated(self, event):
        with self._lock:
            s = self._entry(event.id)
            s["status"] = ("error: " + str(event.exception)
                           if event.exception else "terminated")

    def onQueryIdle(self, event):  # pragma: no cover - optional callback
        pass

    # user surface ---------------------------------------------------
    def snapshot(self) -> dict[str, dict]:
        with self._lock:
            return {k: {**v, "recent": list(v["recent"])}
                    for k, v in self._stats.items()}


def attach(spark) -> FlowMetricsListener:
    """Register a FlowMetricsListener on the session and return it."""
    listener = FlowMetricsListener()
    spark.streams.addListener(listener)
    return listener


def observed(df: DataFrame, name: str = "flow",
             *extra: Column) -> tuple[DataFrame, Observation]:
    """Batch-side meters via df.observe(): items_out + any extra metric
    expressions, computed during the action itself (no second pass).

    >>> out, obs = observed(df, "sink")
    >>> out.write...; obs.get  # {"items_out": N, ...}
    """
    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("items_out"), *extra), obs


# ---------------------------------------------------------------------------
# conn_status event bus (esp_conn_status.erl:35-50)
# ---------------------------------------------------------------------------

class ConnStatusRegistry:
    """The `conn_status` gen_event bus analog: connectors report
    status transitions (connection_registry:connecting/connected/
    disconnected in the reference); esp_conn_status subscribes with
    flow/node/conn_type filters and re-emits the status points.

    Here: connectors call `report(...)`; `frame(spark, ...)` is the
    batch view and `stream(spark, ...)` the file-spool stream (same
    checkpointable-spool pattern as the udp/http listeners)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._events: list[tuple] = []
        self._spool = None
        self._seq = 0

    def report(self, *, flow_id: str, node_id: str, conn_type: str,
               status: str, peer: str = "") -> None:
        """status: 'connecting' | 'connected' | 'disconnected'
        (connection_registry.erl states)."""
        import json as _json
        import os
        import time as _time

        ev = (int(_time.time() * 1000), flow_id, node_id, conn_type,
              status, peer)
        with self._lock:
            self._events.append(ev)
            if self._spool:
                self._seq += 1
                tmp = os.path.join(self._spool, f"._{self._seq}.json")
                dst = os.path.join(self._spool, f"ev_{self._seq}.json")
                with open(tmp, "w") as f:
                    f.write(_json.dumps(dict(zip(
                        ("ts_ms", "flow_id", "node_id", "conn_type",
                         "status", "peer"), ev))))
                os.replace(tmp, dst)

    _SCHEMA = ("ts_ms long, flow_id string, node_id string, "
               "conn_type string, status string, peer string")

    @staticmethod
    def _filter(df, flow_id, node_id, conn_type):
        if flow_id is not None:
            df = df.filter(F.col("flow_id") == flow_id)
        if node_id is not None:  # undefined node = all nodes (:44)
            df = df.filter(F.col("node_id") == node_id)
        if conn_type is not None:
            df = df.filter(F.col("conn_type") == conn_type)
        return df.withColumn("ts", F.timestamp_millis("ts_ms")).drop("ts_ms")

    def frame(self, spark, *, flow_id=None, node_id=None,
              conn_type=None) -> DataFrame:
        with self._lock:
            rows = list(self._events)
        df = spark.createDataFrame(rows, self._SCHEMA)
        return self._filter(df, flow_id, node_id, conn_type)

    def stream(self, spark, *, flow_id=None, node_id=None,
               conn_type=None) -> DataFrame:
        import json as _json
        import os
        import tempfile

        with self._lock:
            if self._spool is None:
                self._spool = tempfile.mkdtemp(prefix="faxe_connstatus_")
                # replay history into the spool so late subscribers see
                # transitions that already happened (stronger than the
                # reference's gen_event subscription, which only
                # delivers from add_sup_handler onward)
                for ev in self._events:
                    self._seq += 1
                    dst = os.path.join(self._spool, f"ev_{self._seq}.json")
                    with open(dst, "w") as f:
                        f.write(_json.dumps(dict(zip(
                            ("ts_ms", "flow_id", "node_id", "conn_type",
                             "status", "peer"), ev))))
        df = (spark.readStream.schema(self._SCHEMA)
              .option("maxFilesPerTrigger", 64).json(self._spool))
        return self._filter(df, flow_id, node_id, conn_type)


CONN_STATUS = ConnStatusRegistry()
