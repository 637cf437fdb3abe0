#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Storage layout: the driver testdata ships as one parquet file with ONE
row group per table — an unsplittable scan (one task does all the IO and
partial aggregation). A real deployment of this engine ingests into a
splittable layout (many files / row groups, the 100 TB norm), so the
bench stages exactly that once into .bench_cache/ and measures
steady-state query time against it. Staging cost is reported separately
as "ingest_sec" — nothing is hidden.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CACHE_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")

# headline set: the SURVEY §7.5 slice + M2/M4/M5 representatives + the
# LLM-pipeline operators (dedup / similarity / text).
HEADLINE = [
    "win_time_agg",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "aggregate_multi",
    "session_windows",
    "win_event_rolling",
    "asof_join_nearest",
    "state_count_duration",
    "collect_unique",
    "value_diff",
    "change_detect",
    "asof_join_merge",
    "collect_table_aged",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash_pairs",
    "embedding_neardup",
    "ann_topk",
    "ann_lsh_topk",
    "text_quality",
    "token_count",
    "training_pipeline",
    # round-3 additions
    "lambda_showcase",
    "deadman_gaps",
    # round-4 training-prep additions
    "repetition_quality",
    "decontaminate",
    "pack_greedy",
    # round-4 second wave: PII / boilerplate / mixture / semantic dedup
    "pii_scrub",
    "boilerplate_chunks",
    "domain_mix_sample",
    "semantic_dedup",
    "lm_novelty",
    "url_normalize",
    "trainprep_pipeline",
    "quality_classifier",
    "dup_spans",
    "html_extract",
    # round 5: incremental corpus dedup
    "dedup_incremental_batches",
    # round 6: the PQ/IVFPQ exactness probes (the most algorithmically
    # complex ops in the repo previously had no tracked wall-time —
    # VERDICT r5 #8) and the persisted-index lifecycle query
    "pq_adc_full_probe",
    "ivfpq_full_probe",
    "ann_index_reuse",
    # round 6 second wave: streaming-capable near-dup crawl dedup
    "dedup_minhash_incr_batches",
    "dedup_simhash_incr_batches",
    "exact_substring_dedup", "embedding_neardup_ivf",
    "substring_scrub_incr_batches", "embedding_neardup_incr_batches",
    # round 6 third wave: crawl-balance cap + Gopher format rules
    "domain_cap", "gopher_quality", "domain_cap_incr_batches",
    # round 7: the Matrix-Profile trio + SAX scale paths
    "ts_subsequence_topk", "ts_motif_topk", "ts_discord_topk",
    "ts_sax_topk", "sax_index_reuse",
    # round 8: the frame-explosion lane (VERDICT r7 #4)
    "video_frames_fake",
    # round 8 post-closing: DSIR selection + deterministic shard layout
    "dsir_resample", "global_shuffle_shard",
    # round 9: split_assign's oracle row + the two crawl-fold additions
    # (59 -> 62 queries; totals not comparable across the boundary
    # without removing these)
    "corpus_split", "shard_append_incr_batches",
    "dsir_select_incr_batches",
]

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


# Staging layout version: bump when the splitting rule changes so stale
# caches re-stage. v2 (r11): split byte-heavy tables too — the old
# rows>=50k rule left documents (5000 rows of TEXT: the corpus behind
# ~25 headline queries, where per-row cost is n-gram md5 work) and
# embeddings (2000 vectors feeding every GEMM lane) as ONE parquet file
# = one row group = ONE scan task, serializing the whole pre-exchange
# compute of those queries on 1 of 32 cores (guide §2.5 "input skew:
# one huge unsplittable file"). Splittable-at-the-source is exactly
# what this staging step exists to model.
LAYOUT_V = "v2"


def stage_cache(spark, sf_dir: str, n_files: int) -> tuple[str, float]:
    """One-time ingest into a splittable layout (n_files per big table)."""
    from faxe_spark.tables import load_table

    tag = re.sub(r"[^A-Za-z0-9.]", "_", sf_dir.strip("/"))
    cache = os.path.join(CACHE_ROOT, tag)
    marker = os.path.join(cache, "_STAGED")
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read().startswith(f"{LAYOUT_V}:"):
                return cache, 0.0
    t0 = time.perf_counter()
    shutil.rmtree(cache, ignore_errors=True)
    os.makedirs(cache, exist_ok=True)
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        rows = df.count()
        src_bytes = 0
        src = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.isdir(src):
            src_bytes = sum(os.path.getsize(os.path.join(src, f))
                            for f in os.listdir(src))
        elif os.path.isfile(src):
            src_bytes = os.path.getsize(src)
        parts = n_files if (rows >= 50_000
                            or src_bytes >= 256 * 1024) else 1
        df.repartition(parts).write.mode("overwrite").parquet(
            os.path.join(cache, f"{name}.parquet"))
    with open(marker, "w") as fh:
        fh.write(f"{LAYOUT_V}:{sf_dir}")
    return cache, round(time.perf_counter() - t0, 3)


def _plan_hash(df) -> str:
    """Stable fingerprint of the physical plan: expression ids, codegen
    ids, and plan ids change run to run — strip them so the hash moves
    only when the plan SHAPE moves. Makes bench regressions attributable
    (plan change vs environment noise — VERDICT r2 bench-hygiene item)."""
    import hashlib

    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = re.sub(r"#\d+[A-Za-z]*", "#", plan)        # exprIds
    plan = re.sub(r"\[(plan_)?id=#?\d+\]", "", plan)   # plan/stage ids
    plan = re.sub(r"\(\d+\)", "", plan)                # codegen ids
    plan = re.sub(r"@[0-9a-f]{6,}", "", plan)          # object addresses
    # higher-order-function lambda variables are named with a
    # SESSION-GLOBAL counter (lambda x_3 -> lambda x_14 after other
    # queries ran) — the r3 false "plan changed" flags on the
    # zip_with/transform queries were exactly this, not UDF identities
    plan = re.sub(r"\blambda ([A-Za-z]+)_\d+", r"lambda \1_", plan)
    # localCheckpoint leaves ExistingRDD leaves whose MapPartitionsRDD
    # ids are a session-global counter (any change in how many RDDs ran
    # EARLIER in the bench renumbers them — the r11 result_rows
    # post-pass reorder flagged ann_index_reuse spuriously this way)
    plan = re.sub(r"RDD\[\d+\]", "RDD[#]", plan)
    plan = re.sub(r"/[^\s,)\]]*\.bench_cache[^\s,)\]]*", "<cache>", plan)
    return hashlib.md5(plan.encode()).hexdigest()[:16]


def _record_plan_hashes(hashes: dict, sf) -> None:
    """Persist per-query plan hashes keyed by scale factor (plans
    legitimately differ across SF via AQE); report diffs vs the previous
    run at the SAME sf on stderr (stdout stays the driver contract)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "PLAN_HASHES.json")
    book = {}
    if os.path.exists(path):
        try:
            with open(path) as fh:
                book = json.load(fh)
        except Exception:  # noqa: BLE001 - corrupt file: overwrite
            book = {}
    prev = book.get(str(sf), {})
    changed = sorted(n for n in hashes if n in prev and prev[n] != hashes[n])
    if changed:
        print(f"bench: plan changed since last run: {changed}", file=sys.stderr)
    book[str(sf)] = hashes
    with open(path, "w") as fh:
        json.dump(book, fh, indent=1, sort_keys=True)


def main() -> None:
    from faxe_spark.session import get_spark
    from faxe_spark.registry import QUERIES

    spark = get_spark("faxe-spark-bench")
    sf_match = re.search(r"sf([\d.]+)", SF_DIR)
    sf = float(sf_match.group(1).rstrip(".")) if sf_match else None
    cpus = spark.sparkContext.defaultParallelism

    cache_dir, ingest_sec = stage_cache(spark, SF_DIR, n_files=min(cpus, 16))

    names = [n for n in HEADLINE if n in QUERIES]
    # JVM warm-up on a non-headline query (steady-state measurement)
    QUERIES["where_filter"].fn(spark, cache_dir).write.mode("overwrite").format("noop").save()

    iterations = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3"))
    per_query: dict[str, float] = {}
    plan_hashes: dict[str, str] = {}
    result_rows: dict[str, int] = {}
    load_max = os.getloadavg()[0]
    load_start = load_max
    # load guard (r3 win_event_rolling false +54% was concurrent-load
    # noise): a min-of-N taken under external load is not a steady-state
    # number — wait for the 1-min loadavg to drop below the ceiling
    # before each query, give up after 120 s and annotate instead of
    # blocking the driver forever. VERDICT r6 #4 tightened the ceiling
    # to ~6 (two consecutive rounds blamed the round's single >1.25x
    # mover on load at a near-8 loadavg — make that state impossible).
    load_ceiling = min(cpus / 4, 6.0)
    for name in names:
        deadline = time.monotonic() + 120
        while os.getloadavg()[0] > load_ceiling and time.monotonic() < deadline:
            time.sleep(5)
        load_max = max(load_max, os.getloadavg()[0])
        best = float("inf")
        for _ in range(iterations):
            t0 = time.perf_counter()
            df = QUERIES[name].fn(spark, cache_dir)
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        per_query[name] = round(best, 3)
        plan_hashes[name] = _plan_hash(df)
    # result cardinality for EVERY headline query: lets a future
    # wall-clock drift be attributed to corpus/data change (counts
    # move) vs environment (counts identical) — the r3 minhash
    # +46% and the r5 lm_novelty +29% were both unattributable for
    # want of exactly this number (extended from the dedup/ANN
    # subset per VERDICT r5 next-round #4). Runs as a POST-pass (r11):
    # this extra, untimed execution used to run BETWEEN timed queries,
    # heating the box (and draining its documented burst budget) right
    # before the next query's timed iterations — the timing methodology
    # (min-of-3 noop-sink runs per query) is unchanged.
    for name in names:
        result_rows[name] = QUERIES[name].fn(spark, cache_dir).count()

    _record_plan_hashes(plan_hashes, sf)
    total = round(sum(per_query.values()), 3)
    payload = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
        "ingest_sec": ingest_sec,
        "cpus": cpus,
        "iterations": iterations,
        "timing": "min_of_iterations (steady state)",
        "loadavg": {"start": round(load_start, 2), "max": round(load_max, 2),
                    "ceiling": round(load_ceiling, 2)},
        "result_rows": result_rows,
    }
    # durable record (VERDICT r6 #3: the driver's tail capture kept only
    # 17/51 of the r6 timings — BENCH_r06.json has parsed:null). The
    # latest full payload lives in BENCH_LOCAL.json; every run appends
    # to BENCH_LEDGER.jsonl so cross-round drift stays attributable
    # from the repo alone. BENCH_LOCAL means LATEST RUN, nothing more
    # (VERDICT r9 "what's wrong" #1: the driver running bench.py itself
    # overwrote the accepted record) — the certified/accepted record
    # lives in BENCH_RECORD.json, which ONLY an explicit
    # FAXE_SPARK_BENCH_ACCEPT=1 run rewrites; every payload carries
    # accepted:true/false so the two files are self-describing.
    accept = os.environ.get("FAXE_SPARK_BENCH_ACCEPT") == "1"
    payload["accepted"] = accept
    line = json.dumps(payload)
    here = os.path.dirname(os.path.abspath(__file__))
    stamped = dict(payload, wall_time=time.strftime("%Y-%m-%dT%H:%M:%S"))
    with open(os.path.join(here, "BENCH_LOCAL.json"), "w") as fh:
        json.dump(stamped, fh, indent=1, sort_keys=True)
        fh.write("\n")
    with open(os.path.join(here, "BENCH_LEDGER.jsonl"), "a") as fh:
        fh.write(json.dumps(stamped) + "\n")
    if accept:
        with open(os.path.join(here, "BENCH_RECORD.json"), "w") as fh:
            json.dump(stamped, fh, indent=1, sort_keys=True)
            fh.write("\n")
    print(line)


if __name__ == "__main__":
    main()
