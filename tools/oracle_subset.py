"""Subset oracle check: the driver_sim compare loop over named queries
only (fast gate while iterating; the full sim remains the milestone
gate). Usage: python tools/oracle_subset.py q1 q2 ..."""
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")

from pyspark.sql import SparkSession  # noqa: E402

spark = (SparkSession.builder.appName("oracle-subset")
         .master(os.environ.get("SPARK_MASTER", "local[8]"))
         .config("spark.ui.enabled", "false")
         .getOrCreate())

import __spark_entry__ as E  # noqa: E402

import duckdb  # noqa: E402

duck = duckdb.connect()
for name in ("region", "nation", "customer", "supplier", "part", "orders",
             "lineitem", "events", "documents", "embeddings"):
    duck.execute(f"CREATE VIEW {name} AS SELECT * FROM "
                 f"read_parquet('{SF}/{name}.parquet')")


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v + 0.0)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def rowset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


qs = E.queries()
oracles = E.oracle_sql()
names = sys.argv[1:]
fails = []
for name in names:
    sdf = qs[name](spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    sql = oracles.get(name)
    if sql is None:
        print(f"{name}: rows-only ({len(srows)} rows)")
        continue
    res = duck.execute(sql)
    orows = res.fetchall()
    ocols = [d[0] for d in res.description]
    ok = rowset(srows, sdf.columns) == rowset(orows, ocols)
    print(f"{name}: {'OK' if ok else 'FAIL'} "
          f"(spark {len(srows)} vs oracle {len(orows)})")
    if not ok:
        fails.append(name)
if fails:
    sys.exit(f"FAILS: {fails}")
print(f"subset green: {len(names)} queries")
