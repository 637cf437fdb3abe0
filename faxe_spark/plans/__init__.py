"""Plan introspection helpers — the feedback loop for scale tuning.

`.explain("formatted")` as data: assert predicates reached the parquet
scan, count exchanges (shuffles), check broadcast strategy — used by
tests/test_plans.py to pin the physical plans we want (per the project
rule: iterate until it's the plan you'd want, not the first that passes).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted")


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists from every parquet scan in the plan."""
    plan = formatted_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each scan — column-pruning check."""
    plan = formatted_plan(df)
    return re.findall(r"ReadSchema: (\S+)", plan)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan
    (counted on the detail headers — each node appears once there)."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def count_broadcasts(df: DataFrame) -> int:
    return len(re.findall(r"\(\d+\) BroadcastExchange\b", formatted_plan(df)))


def count_hash_aggregates(df: DataFrame) -> int:
    """Hash-based aggregation nodes (HashAggregate, or
    ObjectHashAggregate when an imperative agg like median is present) —
    vs the SortAggregate fallback which adds a sort per group."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) (?:Object)?HashAggregate\b", plan))


def assert_filter_pushed(df: DataFrame, fragment: str) -> None:
    filters = pushed_filters(df)
    assert any(fragment in f for f in filters), (
        f"expected pushed filter containing {fragment!r}; got {filters}")


def assert_column_pruned(df: DataFrame, column: str) -> None:
    schemas = scan_read_schemas(df)
    assert schemas and all(column not in s for s in schemas), (
        f"column {column!r} should be pruned from scans; ReadSchemas: {schemas}")
