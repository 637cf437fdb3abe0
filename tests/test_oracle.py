"""Registry-wide oracle check: run every registered Spark query and its
DuckDB oracle on the same testdata and require EXACT value equality
(mimicking the driver's order-insensitive value hash).

This is the local version of the driver's CORRECTNESS gate; anything
fragile (float accumulation order, timestamp rendering, tie-breaking)
fails here first.
"""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_ORACLE
from faxe_spark.registry import QUERIES


def _normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0 and render deterministically
        return repr(v + 0.0)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _rowset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(_normalize(r[i]) for i in order) for r in rows)


ORACLE_QUERIES = sorted(n for n, q in QUERIES.items() if q.sql is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in QUERIES.items() if q.sql is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(name, spark, duck):
    q = QUERIES[name]
    sdf = q.fn(spark, SF_ORACLE)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(q.sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}")
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}")

    s = _rowset(spark_rows, spark_cols)
    d = _rowset(duck_rows, duck_cols)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(name, spark):
    q = QUERIES[name]
    sdf = q.fn(spark, SF_ORACLE)
    assert sdf.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
