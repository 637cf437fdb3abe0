from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("FAXE_SPARK_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # python workers must resolve repo + tests modules (cloudpickled
    # PythonNode classes defined in test files)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    extra = f"{repo}:{os.path.join(repo, 'tests')}"
    prev = os.environ.get("PYTHONPATH", "")
    os.environ["PYTHONPATH"] = f"{extra}:{prev}" if prev else extra

    from faxe_spark.session import get_spark

    s = get_spark("faxe-spark-tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for name in ("region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_ORACLE}/{name}.parquet')"
        )
    yield con
    con.close()
