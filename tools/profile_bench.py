"""Per-query bench profiler (optimization guide §1): isolates each
headline query with the noop sink, and splits wall time into

  build_sec — QUERIES[name].fn(spark, cache) call time: driver-side
              planning plus any EAGER work inside the query fn
              (weight-table collects, persisted index builds, crawl
              epoch folds that materialize via localCheckpoint)
  noop_sec  — df.write.format("noop") execution of the returned frame

and records the formatted plan to plans/r11/<name>_<tag>.txt so plan
claims are checkable without running Spark.

Run: python tools/profile_bench.py <tag> [queries...]
Defaults to the full bench HEADLINE list, same staged cache as bench.py.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, stage_cache, SF_DIR  # noqa: E402


def main() -> None:
    from faxe_spark.session import get_spark
    from faxe_spark.registry import QUERIES

    tag = sys.argv[1] if len(sys.argv) > 1 else "profile"
    names = sys.argv[2:] or [n for n in HEADLINE if n in QUERIES]
    spark = get_spark("faxe-spark-profile")
    cache, _ = stage_cache(spark, SF_DIR, n_files=min(
        spark.sparkContext.defaultParallelism, 16))

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r11")
    os.makedirs(plans_dir, exist_ok=True)

    # warm-up
    QUERIES["where_filter"].fn(spark, cache).write.mode(
        "overwrite").format("noop").save()

    iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3"))
    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        best_b, best_n = float("inf"), float("inf")
        df = None
        for _ in range(iters):
            t0 = time.perf_counter()
            df = QUERIES[name].fn(spark, cache)
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            best_b = min(best_b, t1 - t0)
            best_n = min(best_n, t2 - t1)
        plan = df._jdf.queryExecution().executedPlan().toString()
        exch = plan.count("Exchange")
        py = sum(plan.count(k) for k in (
            "BatchEvalPython", "ArrowEvalPython", "MapInPandas",
            "FlatMapGroupsInPandas", "FlatMapGroupsInArrow",
            "PythonMapInArrow", "MapInArrow"))
        out[name] = {"build_sec": round(best_b, 3),
                     "noop_sec": round(best_n, 3),
                     "total_sec": round(best_b + best_n, 3),
                     "exchanges": exch, "python_nodes": py}
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({name: out[name]}), flush=True)

    total = sum(v["total_sec"] for v in out.values())
    build = sum(v["build_sec"] for v in out.values())
    print(json.dumps({"tag": tag, "total": round(total, 3),
                      "build_total": round(build, 3),
                      "noop_total": round(total - build, 3)}))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), f"PROFILE_{tag}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
