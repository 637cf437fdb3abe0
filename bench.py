#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Queries are materialized with the noop writer (full execution, no sink
cost). Each query is timed cold (fresh plan), sharing one SparkSession.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: windowed agg, group agg (TPC-H), rolling count-window,
# sessionization, as-of-style ordering ops — the SURVEY §7.5 + M2/M4/M5
# representatives. Extended as operators land.
HEADLINE = [
    "win_time_agg",
    "tpch_q1",
    "aggregate_multi",
    "session_windows",
    "win_event_rolling",
    "collect_unique",
    "value_diff",
    "change_detect",
]


def main() -> None:
    from faxe_spark.session import get_spark
    from faxe_spark.registry import QUERIES

    spark = get_spark("faxe-spark-bench")
    sf_match = re.search(r"sf([\d.]+)", SF_DIR)
    sf = float(sf_match.group(1).rstrip(".")) if sf_match else None

    names = [n for n in HEADLINE if n in QUERIES]
    # warm the JVM + parquet footer caches with a trivial action
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    per_query: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = QUERIES[name].fn(spark, SF_DIR)
        df.write.mode("overwrite").format("noop").save()
        per_query[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(per_query.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
