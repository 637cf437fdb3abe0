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
from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


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

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        node = node_class()
        node.init(**opts)
        for pdf in batches:
            points = pdf.to_dict("records")
            out = node.handle_batch(points)
            if out:
                yield pd.DataFrame(out)

    return df.mapInPandas(run, output_schema)


def apply_node_keyed(df: DataFrame, node_class: type[PythonNode],
                     output_schema: StructType | str, *, by: list[str],
                     sort_within_key: str | None = "ts", **opts) -> DataFrame:
    """Per-key PythonNode: one instance per key group (the analog of
    faxe's group_by cloning a @pythonclass node per group key,
    df_graph.erl:470-541). Rows arrive ts-sorted when requested."""
    _validate_opts(node_class, opts)

    def run(_key, pdf: pd.DataFrame) -> pd.DataFrame:
        node = node_class()
        node.init(**opts)
        if sort_within_key and sort_within_key in pdf.columns:
            pdf = pdf.sort_values(sort_within_key)
        out = node.handle_batch(pdf.to_dict("records"))
        return pd.DataFrame(out) if out else pd.DataFrame(
            {f.name: pd.Series(dtype="object") for f in _as_struct(output_schema).fields})

    return df.groupBy(*by).applyInPandas(run, output_schema)


def _as_struct(schema: StructType | str) -> StructType:
    if isinstance(schema, StructType):
        return schema
    from pyspark.sql.types import _parse_datatype_string

    return _parse_datatype_string(schema)
