"""Scale probe: synthesize an R x testdata copy and measure how every
headline query's wall-clock scales with data size on the same plan.

The sf ladder the driver ships stops at sf0.1 (~17 MB); the claims
this repo makes are about 100 TB. A correct partition strategy should
scale near-linearly in rows on local[32] until memory pressure — a
superlinear ratio exposes a quadratic lane or a collapse onto one
task. Replication rules keep data SHAPE realistic at R x:

- dimensions (region/nation/customer/supplier/part): unchanged.
- orders/lineitem: R copies, orderkeys offset per replica (joins to
  the fixed dimensions keep their selectivity).
- events: R copies, new user_id universe per replica (same per-user
  event density, R x users — the way traffic actually grows).
- documents: R copies, every WORD suffixed `_r<i>` in replica i>0 —
  zero cross-replica shingle overlap, so near-dup structure
  REPLICATES (pair counts scale ~R x) instead of exploding
  quadratically as naive duplication would.
- embeddings: R copies, each replica's vectors elementwise-permuted
  by a seeded permutation — preserves the value distribution while
  breaking cross-replica near-duplicates.

Run: python tools/scale_probe.py [R] [queries...]  (default R=10)
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = Path(os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
OUT = Path("/root/repo/.bench_cache/scale_probe")

PROBE_QUERIES = [
    "win_time_agg", "tpch_q1", "tpch_q3", "aggregate_multi",
    "session_windows", "asof_join_nearest", "state_count_duration",
    "change_detect", "deadman_gaps", "token_count", "text_quality",
    "repetition_quality", "pack_greedy", "decontaminate",
    "dedup_minhash_lsh", "dedup_simhash_pairs", "embedding_neardup",
    "ann_topk", "training_pipeline",
    # round-4 second wave
    "pii_scrub", "boilerplate_chunks", "domain_mix_sample",
    "semantic_dedup", "lm_novelty", "url_normalize",
    "trainprep_pipeline", "quality_classifier", "dup_spans",
    "html_extract",
    # round 5
    "dedup_incremental_batches", "jsonsize_batch", "dedup_ngram_jaccard",
    # round 6 (pq_adc_full_probe / ivfpq_full_probe are deliberately NOT
    # here: the degenerate exact codebook makes them O(n^2) by
    # definition — correctness devices, not linearity subjects; see
    # BASELINE.md round-6 journal)
    "ann_index_reuse", "dedup_minhash_incr_batches",
    "dedup_simhash_incr_batches", "exact_substring_dedup", "embedding_neardup_ivf",
    "substring_scrub_incr_batches", "embedding_neardup_incr_batches",
    "domain_cap", "gopher_quality", "domain_cap_incr_batches",
    # round 7: Matrix-Profile trio + SAX (motif/discord are per-key
    # O(n_k^2) BY DEFINITION — the events replication rule grows the
    # number of users, not per-user series length, so their pair count
    # scales ~R x and wall should too; sax/index probes check the
    # bucket-pruned and partition-pruned query paths stay ~flat-ish)
    "ts_subsequence_topk", "ts_motif_topk", "ts_discord_topk",
    "ts_sax_topk", "sax_index_reuse",
    # round 8 post-closing: DSIR (B=256-bounded count aggs + scan-stage
    # fold — should be ~linear; the word-suffix replication rule means
    # replica vocabularies are disjoint, which only re-spreads bucket
    # counts) + the one-shuffle shard layout
    "dsir_resample", "global_shuffle_shard",
    # round 9: the crawl-fold additions (split is pure scan-stage;
    # shard_append adds a broadcast of n_shards count rows per epoch;
    # dsir_select carries k rows of state per epoch — all should track
    # their underlying scans ~linearly)
    "corpus_split", "shard_append_incr_batches",
    "dsir_select_incr_batches",
]


def synthesize(r: int) -> Path:
    out = OUT / f"x{r}"
    if (out / "_DONE").exists():
        return out
    out.mkdir(parents=True, exist_ok=True)
    duck = duckdb.connect()
    for dim in ("region", "nation", "customer", "supplier", "part"):
        duck.execute(f"COPY (SELECT * FROM read_parquet('{BASE}/{dim}.parquet')) "
                     f"TO '{out}/{dim}.parquet' (FORMAT PARQUET)")
    reps = ", ".join(str(i) for i in range(r))

    def rep(table: str, select: str) -> None:
        duck.execute(
            f"COPY (SELECT {select} FROM read_parquet('{BASE}/{table}.parquet'), "
            f"unnest([{reps}]) AS t(i)) TO '{out}/{table}.parquet' "
            f"(FORMAT PARQUET)")

    KEY = 1_000_000_000
    o_cols = [c[0] for c in duck.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{BASE}/orders.parquet')").fetchall()]
    rep("orders", ", ".join(
        f"o_orderkey + CAST(i AS BIGINT)*{KEY} AS o_orderkey" if c == "o_orderkey" else c
        for c in o_cols))
    li_cols = [c[0] for c in duck.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{BASE}/lineitem.parquet')").fetchall()]
    rep("lineitem", ", ".join(
        f"l_orderkey + CAST(i AS BIGINT)*{KEY} AS l_orderkey" if c == "l_orderkey" else c
        for c in li_cols))
    ev_cols = [c[0] for c in duck.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{BASE}/events.parquet')").fetchall()]
    rep("events", ", ".join(
        {"event_id": f"event_id + CAST(i AS BIGINT)*{KEY} AS event_id",
         "user_id": f"user_id + CAST(i AS BIGINT)*{KEY} AS user_id"}.get(c, c)
        for c in ev_cols))
    rep("documents",
        f"doc_id + CAST(i AS BIGINT)*{KEY} AS doc_id, "
        "CASE WHEN i = 0 THEN text ELSE array_to_string("
        "list_transform(string_split(text, ' '), w -> w || '_r' || i), ' ') "
        "END AS text, lang, source, n_chars")

    tbl = pq.read_table(f"{BASE}/embeddings.parquet")
    vecs = np.array(tbl["embedding"].to_pylist(), dtype=np.float32)
    ids = np.array(tbl["vec_id"].to_pylist(), dtype=np.int64)
    dim = vecs.shape[1]
    all_ids, all_vecs = [ids], [vecs]
    for i in range(1, r):
        perm = np.random.RandomState(i).permutation(dim)
        all_ids.append(ids + i * KEY)
        all_vecs.append(vecs[:, perm])
    other = {n: tbl[n].to_pylist() * r for n in tbl.schema.names
             if n not in ("vec_id", "embedding")}
    pq.write_table(pa.table({
        "vec_id": np.concatenate(all_ids),
        "embedding": list(np.concatenate(all_vecs)),
        **other,
    }), f"{out}/embeddings.parquet")
    (out / "_DONE").touch()
    return out


def main() -> int:
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    names = sys.argv[2:] or PROBE_QUERIES
    scaled = synthesize(r)
    print(f"scaled testdata at {scaled}")

    from faxe_spark.session import get_spark
    from faxe_spark.registry import QUERIES

    spark = get_spark("scale-probe")
    print(f"{'query':28s} {'x1':>8s} {'x' + str(r):>8s} {'ratio':>7s}")
    results = []
    for name in names:
        fn = QUERIES[name].fn
        times = {}
        for tag, sf in (("x1", str(BASE)), (f"x{r}", str(scaled))):
            fn(spark, sf).count()               # warm plan+cache
            t0 = time.perf_counter()
            n = fn(spark, sf).count()
            times[tag] = time.perf_counter() - t0
            times[tag + "_rows"] = n
        ratio = times[f"x{r}"] / max(times["x1"], 1e-9)
        results.append((name, times["x1"], times[f"x{r}"], ratio))
        print(f"{name:28s} {times['x1']:8.2f} {times[f'x{r}']:8.2f} "
              f"{ratio:6.1f}x   rows {times['x1_rows']} -> {times[f'x{r}_rows']}")
    worst = max(results, key=lambda x: x[3])
    print(f"\nworst ratio: {worst[0]} at {worst[3]:.1f}x (R={r})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
