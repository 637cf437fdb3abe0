"""Timing sweep: every registry query once at sf0.1 (cache layout)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from faxe_spark.session import get_spark
from faxe_spark.registry import QUERIES

spark = get_spark()
sf = "/root/repo/.bench_cache/root_testdata_sf0.1"
if not os.path.exists(sf):
    sf = "/root/testdata/sf0.1"
rows = []
for name, q in sorted(QUERIES.items()):
    t0 = time.perf_counter()
    try:
        n = q.fn(spark, sf).count()
        dt = time.perf_counter() - t0
        rows.append((dt, name, n, ""))
    except Exception as e:
        rows.append((float("inf"), name, -1, str(e)[:120]))
for dt, name, n, err in sorted(rows, reverse=True):
    print(f"SWEEP {dt:8.2f}s {name:28s} rows={n} {err}")
