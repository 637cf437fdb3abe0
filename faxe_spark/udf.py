"""User-defined Python nodes — parity with faxe's `@PythonClass` DFS
nodes (c_python3.erl:9-61 hosts a Python class per node via erlport; SDK
apps/faxe/priv/python/faxe.py: options()/init/handle_point/handle_batch,
emitting dicts; 350-point chunking at c_python3.erl:46).

Spark mapping: the class contract is preserved; execution rides on
mapInPandas (Arrow batches replace the 350-point chunks — columnar,
zero-copy) or applyInPandas for per-key batch semantics. The reference's
`persist_state` hook maps to the streaming state store
(faxe_spark.streaming.stateful) — here nodes are per-batch stateful,
per-partition isolated, exactly like one faxe node process per group.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import StructField, StructType


class PythonNode:
    """Base class mirroring the faxe Python SDK surface (faxe.py:15-56).

    Subclasses implement `handle_point(point: dict) -> dict | list[dict]
    | None` (None = filter the point out) and/or
    `handle_batch(points: list[dict]) -> list[dict]`. `options()`
    declares (name, default) pairs validated at graph build
    (faxe_dfs.erl-style), delivered to `init`.
    """

    @classmethod
    def options(cls) -> list[tuple[str, Any]]:
        return []

    def init(self, **opts) -> None:  # noqa: D401
        for name, default in self.options():
            setattr(self, name, opts.get(name, default))

    def handle_point(self, point: dict) -> dict | list[dict] | None:
        raise NotImplementedError

    def handle_batch(self, points: list[dict]) -> list[dict]:
        out: list[dict] = []
        for p in points:
            r = self.handle_point(p)
            if r is None:
                continue
            out.extend(r if isinstance(r, list) else [r])
        return out

    # -- persisted state (SDK faxe.py:140-207 persist_state surface) -------
    STATE_MODE_MANUAL = "manual"   # call persist_state() yourself
    STATE_MODE_HANDLE = "handle"   # auto-persist after every handle_batch
    STATE_MODE_NONE = "none"

    _pstate: Any = None
    _pending_state: Any = None

    def state_mode(self) -> str:
        """Override to choose when state is persisted (faxe.py:145-156)."""
        return self.STATE_MODE_MANUAL

    def format_state(self) -> dict:
        """Picklable subset of instance vars (faxe.py:168-174)."""
        keep = (str, int, float, dict, list, tuple, set, complex, range,
                bool, bytes, bytearray)
        return {k: v for k, v in vars(self).items()
                if not k.startswith("_") and type(v) in keep}

    def persist_state(self, state=None) -> None:
        """Stage state for the host to persist (faxe.py:176-188): the
        streaming host writes it to Spark's state store after the batch;
        the batch host writes it to the state backend directory."""
        self._pending_state = state if state is not None else self.format_state()

    def get_state(self):
        return self._pstate

    def get_state_value(self, key, default=None):
        if isinstance(self._pstate, dict) and key in self._pstate:
            return self._pstate[key]
        return default


def _records(pdf: pd.DataFrame) -> list[dict]:
    """Rows as point dicts with the reference's value model (r11
    review): flowdata maps carry no undefined entries, so NULL/NaN
    columns become ABSENT keys (`point.get` -> None, like the SDK);
    and values are plain Python scalars — the Arrow boundary hands
    numpy types whose exact-type checks misfire silently (the SDK's
    `type(v) in (...)` format_state filter dropped numpy-typed attrs
    from persisted state; NaN passed `is None` guards and propagated
    nan through arithmetic the reference would have skipped). Array
    cells become lists, the reference's JSON-shaped form."""
    import numpy as np

    out = []
    for rec in pdf.to_dict("records"):  # noqa: the one to_dict site
        d = {}
        for k, v in rec.items():
            if v is None:
                continue
            if isinstance(v, np.ndarray):
                d[k] = v.tolist()
                continue
            try:
                if pd.isna(v):
                    continue
            except (TypeError, ValueError):
                pass
            d[k] = v.item() if isinstance(v, np.generic) else v
        out.append(d)
    return out


def _frame(out: list[dict], columns: list[str]) -> pd.DataFrame:
    """Emitted points -> pandas frame shaped to the declared schema's
    columns: absent keys (a point that never carried the field, or
    _records dropping an all-NULL column) become NULL columns instead
    of a missing-column Arrow error. `columns` is a plain list resolved
    DRIVER-side — schema parsing needs an active SparkSession, which
    executors don't have."""
    return pd.DataFrame(out).reindex(columns=columns)


def _validate_opts(node_class: type[PythonNode], opts: dict) -> None:
    import difflib

    allowed = {name for name, _ in node_class.options()}
    for k in opts:
        if k not in allowed:
            hint = difflib.get_close_matches(k, allowed, n=1)
            extra = f" Did you mean '{hint[0]}'?" if hint else ""
            raise ValueError(
                f"Unknown option '{k}' for node '{node_class.__name__}'.{extra}")


def apply_node(df: DataFrame, node_class: type[PythonNode],
               output_schema: StructType | str, **opts) -> DataFrame:
    """Run a PythonNode over the frame — `@pythonclass` node execution.

    One node instance per Arrow batch partition (mirrors one process per
    node instance); rows cross as dicts exactly like the reference's
    point dicts. Use for transforms the Column algebra can't express."""
    _validate_opts(node_class, opts)

    # literally-dotted column names (DFS dot-path writes) break the
    # mapInPandas schema resolution — encode around the Arrow boundary,
    # hand the node plain dotted keys, decode on the way out.
    out_struct = _as_struct(output_schema)
    enc = lambda c: c.replace(".", "__dot__")  # noqa: E731
    dec = lambda c: c.replace("__dot__", ".")  # noqa: E731
    has_dots = any("." in f.name for f in out_struct.fields) \
        or any("." in c for c in df.columns)
    if has_dots:
        df = df.select(*[F.col(f"`{c}`").alias(enc(c)) for c in df.columns])
        output_schema = StructType(
            [StructField(enc(f.name), f.dataType, f.nullable)
             for f in out_struct.fields])

    out_cols = [f.name for f in _as_struct(output_schema).fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        node = node_class()
        node.init(**opts)
        for pdf in batches:
            if has_dots:
                pdf = pdf.rename(columns=dec)
            points = _records(pdf)
            out = node.handle_batch(points)
            if out:
                if has_dots:
                    out = [{enc(k): v for k, v in p.items()} for p in out]
                yield _frame(out, out_cols)

    res = df.mapInPandas(run, output_schema)
    if has_dots:
        res = res.select(*[F.col(c).alias(dec(c)) for c in res.columns])
    return res


def apply_node_keyed(df: DataFrame, node_class: type[PythonNode],
                     output_schema: StructType | str, *, by: list[str],
                     sort_within_key: str | None = "ts", **opts) -> DataFrame:
    """Per-key PythonNode: one instance per key group (the analog of
    faxe's group_by cloning a @pythonclass node per group key,
    df_graph.erl:470-541). Rows arrive ts-sorted when requested."""
    _validate_opts(node_class, opts)
    out_cols = [f.name for f in _as_struct(output_schema).fields]

    def run(_key, pdf: pd.DataFrame) -> pd.DataFrame:
        node = node_class()
        node.init(**opts)
        if sort_within_key and sort_within_key in pdf.columns:
            pdf = pdf.sort_values(sort_within_key)
        out = node.handle_batch(_records(pdf))
        return _frame(out, out_cols) if out else pd.DataFrame(
            {c: pd.Series(dtype="object") for c in out_cols})

    return df.groupBy(*by).applyInPandas(run, output_schema)


def apply_node_stateful(df: DataFrame, node_class: type[PythonNode],
                        output_schema: StructType | str, *, by: list[str],
                        ts_col: str = "ts", **opts) -> DataFrame:
    """Streaming PythonNode with PERSISTED state — the Spark-first home
    of the SDK's persist_state hook (faxe.py:140-207): one logical node
    per key whose pickled state round-trips Spark's state store between
    micro-batches (RocksDB on a cluster), exactly replacing the
    reference's erlang-side state casts.

    state_mode()='handle' persists format_state() after every batch;
    'manual' persists only what persist_state() staged; restored state
    is visible via get_state()/get_state_value() before handling."""
    import pickle

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import BinaryType, StructField

    _validate_opts(node_class, opts)
    state_schema = StructType([StructField("blob", BinaryType())])
    out_cols = [f.name for f in _as_struct(output_schema).fields]

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:  # pragma: no cover - no timeouts configured
            state.remove()
            return
        node = node_class()
        # restore BEFORE init: the SDK delivers persisted state with the
        # construction args, so init() can read get_state_value()
        if state.exists and state.get[0] is not None:
            node._pstate = pickle.loads(bytes(state.get[0]))
        node.init(**opts)
        for pdf in pdfs:
            if ts_col in pdf.columns:
                pdf = pdf.sort_values(ts_col)
            out = node.handle_batch(_records(pdf))
            if node.state_mode() == PythonNode.STATE_MODE_HANDLE:
                node.persist_state()
            if out:
                yield _frame(out, out_cols)
        if node._pending_state is not None:
            state.update((pickle.dumps(node._pending_state,
                                       protocol=pickle.HIGHEST_PROTOCOL),))

    return (df.groupBy(*by)
            .applyInPandasWithState(fn, output_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def _as_struct(schema: StructType | str) -> StructType:
    if isinstance(schema, StructType):
        return schema
    from pyspark.sql.types import _parse_datatype_string

    return _parse_datatype_string(schema)
