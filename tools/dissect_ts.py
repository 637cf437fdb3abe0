"""Stage-level dissection of ts_motif_topk / ts_discord_topk (guide §1):
times each sub-stage of the pipeline in isolation on the staged sf0.1
cache so the remaining cost can be attributed (window build vs GEMM
kernel vs finisher/downstream) before deciding whether a batched
multi-key GEMM (OPTIMIZATION_r11.md "Not yet optimized" #1) is worth
building. Measurement-only: imports the same operators the queries use.

Run: python tools/dissect_ts.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import stage_cache, SF_DIR  # noqa: E402


def t(label, df, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:45s} {best:7.3f} s")
    return best


def main() -> None:
    from faxe_spark.session import get_spark
    from faxe_spark.tables import load_table
    from faxe_spark.operators import timeseries as ts
    from faxe_spark.operators.similarity import cosine_pairs

    spark = get_spark("dissect-ts")
    cache, _ = stage_cache(spark, SF_DIR, n_files=min(
        spark.sparkContext.defaultParallelism, 16))
    ev = load_table(spark, cache, "events")
    kw = dict(key_col="user_id", ts_col="ts", value_col="value")
    m = 4

    # warm-up
    ev.write.mode("overwrite").format("noop").save()

    t0 = time.perf_counter()
    z = ts._windows_z(ev, m=m, tiebreak="event_id", **kw)
    print(f"{'z plan construction':45s} {time.perf_counter() - t0:7.3f} s")
    t("z materialize (first noop = build+ckpt)", z, n=1)
    t("z re-read (checkpointed)", z)

    ki = ts._kernel_input(z, "user_id")
    t("kernel input (select over ckpt)", ki)

    excl = m
    for name, fin in [("no finisher", None),
                      ("discord finisher", ts._discord_tile_finisher(excl)),
                      ("motif finisher", ts._motif_tile_finisher(2, excl))]:
        pairs = cosine_pairs(ki, -1.0, id_col="_pid", vec_col="_zx",
                             block_col="user_id", emit_block=True,
                             pair_finisher=fin)
        t(f"GEMM kernel pass ({name})", pairs)

    q = ts.discord_topk(ev, m=m, k=2, tiebreak="event_id", **kw)
    t("discord_topk full (fresh z build incl.)", q, n=1)
    q2 = ts.motif_topk(ev, m=m, k=2, tiebreak="event_id", **kw)
    t("motif_topk full (fresh z build incl.)", q2, n=1)


if __name__ == "__main__":
    main()
