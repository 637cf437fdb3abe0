"""Deduplication operators for training-data pipelines at 100 TB scale.

Four families, all shuffle-architected (no cartesian products anywhere):

- exact:        hash-groupBy on a normalized fingerprint. One shuffle.
- minhash+LSH:  shingle -> k minhashes -> band buckets -> bucket self-join.
                Join key is (band_id, band_hash): candidate generation cost
                is proportional to bucket collisions, not n^2.
- simhash:      per-shingle 32-bit hash, per-bit majority vote -> one
                64/32-bit signature per doc; near-dup = small hamming
                distance within LSH-style prefix buckets.
- n-gram jaccard: shingle inverted-index self-join (exact verification
                path for LSH candidates; standard at scale when combined
                with frequency-capped shingles).

Hashes are md5-derived so results are engine-reproducible (DuckDB
oracle parity) — at production scale you'd swap in xxhash64 for speed
(one-line change), trading oracle checkability.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from faxe_spark.operators.text import normalize_text


def shingle_rows(df: DataFrame, id_col: str, text_col: str, n: int = 3,
                 *, distinct: bool = True) -> DataFrame:
    """(id, shingle) rows — the inverted-index layout.

    `distinct=True` (a shuffle over the exploded rows) is required when
    downstream COUNTS shingles (Jaccard intersections); consumers that
    are duplicate-idempotent (minhash: min over dups = same min) pass
    distinct=False and skip that shuffle entirely — on near-dup-heavy
    corpora it's the single largest intermediate in the pipeline."""
    toks = F.split(F.trim(normalize_text(F.col(text_col))), r"\s+")
    out = df.select(id_col, toks.alias("_toks"))
    if n == 1:
        # unigrams ARE the token array — explode directly, skipping
        # the sequence/element_at assembly on the hottest paths
        # (unigram jaccard / simhash / dedup_clusters)
        out = out.select(id_col, F.explode("_toks").alias("shingle"))
    else:
        parts = ", ' ', ".join(f"element_at(_toks, i+{j})"
                               for j in range(n))
        # guard short docs: sequence(1, 0) DESCENDS to [1, 0] in Spark
        # (step defaults to -1 when start > stop), so a doc with < n
        # tokens would hit element_at(_, 0) = INVALID_ARRAY_INDEX.
        # Same fix as text.ngram_array: empty array below n tokens.
        out = out.select(
            id_col,
            F.explode(F.expr(
                f"if(size(_toks) >= {n}, "
                f"transform(sequence(1, size(_toks)-{n - 1}), "
                f"i -> concat({parts})), "
                f"array())"
            )).alias("shingle"),
        )
    return out.dropDuplicates([id_col, "shingle"]) if distinct else out


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: group by md5(normalized text); keep the smallest id.
    One shuffle on the fingerprint; at 100 TB combine with a pre-shuffle
    partial distinct (Spark does this automatically for groupBy)."""
    fp = F.md5(normalize_text(F.col(text_col)))
    return (df.select(F.col(id_col), fp.alias("fingerprint"))
            .groupBy("fingerprint")
            .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups")))


def dedup_incremental(new_df: DataFrame, seen_fps: DataFrame | None, *,
                      text_col: str = "text", id_col: str = "doc_id",
                      checkpoint: bool = True) -> tuple[DataFrame, DataFrame]:
    """Continuous-crawl exact dedup: drop new documents whose
    fingerprint was already seen in ANY previous batch, and return the
    updated fingerprint set for the next round.

    Returns (fresh_docs, updated_seen) where updated_seen =
    seen ∪ fresh fingerprints. seen_fps is a 1-column DataFrame
    ('fingerprint'); pass None for the first batch. At 100 TB the seen
    set lives as a bucketed table on the fingerprint (pay-once
    shuffle, see tables.stage_bucketed) so the anti-join is
    co-located; within the new batch itself the min-id rule of
    dedup_exact applies first (batch-internal dups).

    Lineage contract (r4 advice): each batch's fingerprints are
    localCheckpoint'ed (lazily) before entering the returned union, so
    a later action on the seen set re-reads materialized partitions
    instead of re-fingerprinting every prior batch. The union PLAN
    still accretes one (cheap, pre-materialized) leaf per batch;
    long-running loops should periodically collapse it with
    compact_seen_fps, which rewrites the set as a bucketed table —
    constant-depth plan AND a shuffle-free anti-join from then on."""
    fresh, new_fps = _dedup_incr_core(new_df, seen_fps,
                                      text_col=text_col, id_col=id_col,
                                      checkpoint=checkpoint)
    updated = new_fps if seen_fps is None else seen_fps.union(new_fps)
    return fresh, updated


def _dedup_incr_core(new_df: DataFrame, seen_fps: DataFrame | None, *,
                     text_col: str, id_col: str,
                     checkpoint: bool) -> tuple[DataFrame, DataFrame]:
    """(fresh_docs, NEW fingerprints) — the per-batch kernel; new_fps
    is exactly this batch's delta (one row per fresh doc), so a
    streaming pipeline can land it without re-hashing the text."""
    # NULL text fingerprints as the empty doc (a NULL key would fall
    # out of every equi-join = silent data loss); the internal column
    # is _fp so a caller's own 'fingerprint' column (text_features
    # emits one) passes through untouched
    fp = F.md5(normalize_text(
        F.coalesce(F.col(text_col).cast("string"), F.lit(""))))
    # batch-internal keeper = single min_by aggregation: one pass, map-
    # side partial combine (no groupBy-min + self-join re-execution,
    # no per-fingerprint window sort)
    batch_unique = (new_df.withColumn("_fp", fp)
                    .groupBy("_fp")
                    .agg(F.min_by(F.struct(*new_df.columns),
                                  F.col(id_col)).alias("_r")))
    if seen_fps is not None:
        batch_unique = batch_unique.join(
            seen_fps.withColumnRenamed("fingerprint", "_fp"),
            "_fp", "left_anti")
    # lazy checkpoint: materialized by the caller's first action, after
    # which BOTH fresh and the seen-set leaf read the stored partitions
    # — no per-batch eager job, no re-fingerprinting on later batches.
    # checkpoint=False keeps the raw plan (plan-inspection tests)
    if checkpoint:
        batch_unique = batch_unique.localCheckpoint(eager=False)
    fresh = batch_unique.select("_r.*")
    new_fps = batch_unique.select(F.col("_fp").alias("fingerprint"))
    return fresh, new_fps


def compact_seen_fps(seen_fps: DataFrame, table: str = "seen_fingerprints",
                     *, buckets: int = 32) -> DataFrame:
    """Collapse an accumulated seen-fingerprint union into a BUCKETED
    parquet table and return the table-backed frame (brief r5 item 4).

    Two effects, both load-bearing for a continuous-crawl loop:
    - the returned plan is a constant-depth table scan — the union of
      N batch leaves (one per dedup_incremental round) is gone, so the
      Nth batch's anti-join plan no longer grows with N;
    - the table is bucketed on the fingerprint, so every subsequent
      anti-join against it needs NO exchange on the seen side (the
      100 TB layout: pay the shuffle once at compaction, not once per
      arriving batch). Batches' fingerprint sets are disjoint by
      construction (the anti-join already filtered replays), so no
      distinct pass is needed before the rewrite.

    Re-compaction safe (round-5 review find): the natural loop passes
    last round's compacted table back in, and Spark refuses to
    overwrite a table the input plan is reading — so the rewrite lands
    in a staging table first and is RENAMEd over the destination (two
    catalog ops; a crash between them leaves the previous table
    dropped but the staged data intact under <table>__stage)."""
    from faxe_spark.tables import stage_bucketed

    spark = seen_fps.sparkSession
    stage = f"{table}__stage"
    stage_bucketed(spark, seen_fps, stage,
                   bucket_by="fingerprint", buckets=buckets)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"ALTER TABLE {stage} RENAME TO {table}")
    return spark.table(table)


def compact_pending_fps(spark, pending_dir: str,
                        table: str = "seen_fingerprints", *,
                        buckets: int = 32,
                        cols: tuple = ("fingerprint",)) -> DataFrame:
    """Fold a streaming run's pending fingerprints
    (streaming.stateful.incremental_dedup_pipeline writes them to
    `pending_dir`, epoch-partitioned) into the bucketed seen table —
    the between-runs step of the continuous-crawl loop:
    run stream -> stop -> compact_pending_fps -> restart.

    Defensive distinct + anti-join before the rewrite: the stream's
    own layers make pending fingerprints unique and table-disjoint in
    normal operation, but foreachBatch is at-least-once and a crash
    between the table RENAME and clearing pending_dir leaves absorbed
    epochs behind — both re-deliveries land here, once, at compaction
    cost (pay-once) instead of corrupting the seen set. Clear
    pending_dir only AFTER this returns (the rename has landed).

    A run that produced zero epochs never creates pending_dir: that is
    a no-op, not an error — the existing table is returned unchanged
    (or created empty, keeping the loop's 'table exists after
    compaction' contract).

    `cols` names the bucket-row columns — ("fingerprint",) for the
    exact and MinHash loops, ("fingerprint", "simhash") for the
    hamming loop; the table stays bucketed on the fingerprint either
    way."""
    from pyspark.errors import AnalysisException

    from faxe_spark.operators.common import (is_missing_input,
                                             orphan_stage_guard)

    cols = list(cols)
    if not spark.catalog.tableExists(table):
        # missing-but-staged = a crashed compaction's DROP/RENAME
        # window: the stage holds the ONLY copy of the seen set, and
        # proceeding as a fresh table would overwrite it (review
        # find) — refuse before any rewrite.
        orphan_stage_guard(spark, table)
    try:
        pending = (spark.read.parquet(pending_dir)
                   .select(*cols).distinct())
    except AnalysisException as e:
        # ONLY missing input (path absent / cleared-empty) is a
        # no-op; a mistyped or unreadable pending dir must raise, or
        # the documented compact -> clear loop deletes the real
        # pending fingerprints and the crawl re-admits duplicates
        # (review find, the compact_pending_counts fix applied here)
        if not is_missing_input(e):
            raise
        if spark.catalog.tableExists(table):
            return spark.table(table)
        return compact_seen_fps(
            spark.createDataFrame(
                [], ", ".join(f"{c} string" if c == "fingerprint"
                              else f"{c} long" for c in cols)),
            table, buckets=buckets)
    if spark.catalog.tableExists(table):
        prior = spark.table(table)
        merged = prior.union(pending.join(prior, cols, "left_anti"))
    else:
        merged = pending
    return compact_seen_fps(merged, table, buckets=buckets)


def minhash_band_rows(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", *, num_hashes: int = 16,
                      bands: int = 4, shingle_n: int = 3) -> DataFrame:
    """(id, fingerprint) LSH band-bucket membership rows, one per
    (doc, band): fingerprint = 'b<band>|<md5 of the band's minhash
    slice>'. The band prefix scopes buckets so band 0 and band 1
    hashes can never collide into one bucket. The string form makes a
    bucket set storable in the SAME 1-column fingerprint tables the
    exact-dedup crawl loop uses (compact_seen_fps /
    compact_pending_fps work unchanged)."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col,
                             num_hashes=num_hashes, shingle_n=shingle_n)
    band_fps = [
        F.concat(F.lit(f"b{b}|"), F.md5(F.concat_ws(",", *[
            F.col(f"mh{i}")
            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
        ])))
        for b in range(bands)
    ]
    return sig.select(
        id_col, F.explode(F.array(*band_fps)).alias("fingerprint"))


def dedup_minhash_incremental(new_df: DataFrame,
                              seen_buckets: DataFrame | None, *,
                              text_col: str = "text",
                              id_col: str = "doc_id",
                              num_hashes: int = 16, bands: int = 4,
                              shingle_n: int = 3,
                              checkpoint: bool = True
                              ) -> tuple[DataFrame, DataFrame]:
    """Continuous-crawl NEAR-dup dedup (the MinHash-LSH analog of
    dedup_incremental): drop a new document iff any of its LSH band
    buckets was already occupied by an EARLIER arrival — an earlier
    batch (via `seen_buckets`) or a smaller-id document in this batch.

    Returns (fresh_docs, updated_buckets) where updated_buckets =
    seen ∪ ALL of this batch's band fingerprints — kept AND dropped
    docs contribute buckets, so chains collapse to the first arrival
    (B a near-dup of A is dropped, C a near-dup of B is dropped too:
    C's collision with B's bucket suffices; no transitive closure is
    ever computed). This greedy first-arrival rule is the online
    counterpart of the pair-then-cluster batch path
    (minhash_lsh_candidates + connected_components) and is what a
    crawl actually wants: the earliest copy wins, everything later
    that looks like anything already seen is discarded on arrival.

    Shapes at 100 TB: per batch, one shingle explode + k min-aggs
    (minhash_signatures' partial-agg layout), one groupBy on the
    bucket fingerprint (within-batch min), and one semi-join against
    the bucketed seen table (shuffle-free after compact_seen_fps).
    The seen set grows by <= bands rows per arriving doc and is
    EXACTLY the 1-column fingerprint-table contract of the exact-dedup
    loop, so compact_seen_fps / compact_pending_fps apply unchanged.

    Documents with no shingles (empty/NULL text) have no buckets:
    they always pass and contribute nothing — compose with
    dedup_incremental for exact dups, which owns that case."""
    fresh, new_buckets = _minhash_incr_core(
        new_df, seen_buckets, text_col=text_col, id_col=id_col,
        num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
        checkpoint=checkpoint)
    updated = (new_buckets if seen_buckets is None
               else seen_buckets.union(new_buckets))
    return fresh, updated


def _minhash_incr_core(new_df: DataFrame, seen_buckets: DataFrame | None,
                       *, text_col: str, id_col: str, num_hashes: int,
                       bands: int, shingle_n: int,
                       checkpoint: bool) -> tuple[DataFrame, DataFrame]:
    """(fresh_docs, NEW band fingerprints) — the per-batch kernel;
    new_buckets excludes anything already in seen_buckets, so the seen
    union stays duplicate-free and the streaming pipeline can land
    exactly the delta per epoch."""
    band = minhash_band_rows(new_df, id_col, text_col,
                             num_hashes=num_hashes, bands=bands,
                             shingle_n=shingle_n)
    if checkpoint:
        # the signature subtree feeds three consumers (old-hit, new-hit,
        # bucket-set); materialize once (lazily — the caller's first
        # action pays it), same contract as dedup_incremental
        band = band.localCheckpoint(eager=False)

    hit_old = None
    if seen_buckets is not None:
        hit_old = (band.join(seen_buckets, "fingerprint", "leftsemi")
                   .select(id_col))
    bucket_min = band.groupBy("fingerprint").agg(
        F.min(id_col).alias("_first"))
    hit_new = (band.join(bucket_min, "fingerprint")
               .filter(F.col(id_col) > F.col("_first"))
               .select(id_col))
    dropped = hit_new if hit_old is None else hit_new.union(hit_old)
    fresh = new_df.join(dropped.distinct(), id_col, "left_anti")

    new_buckets = band.select("fingerprint").distinct()
    if seen_buckets is not None:
        new_buckets = new_buckets.join(seen_buckets, "fingerprint",
                                       "left_anti")
    return fresh, new_buckets


MINHASH_P = 2147483647  # 2^31 - 1 (Mersenne prime)


def minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) for the affine universal-hash family
    h_i(x) = (a_i*x + b_i) mod P. Fixed LCG so the Spark plan and the
    DuckDB oracle SQL embed identical constants. a_i < 2^30 keeps every
    product under 2^62 — no BIGINT overflow on either engine."""
    params, state = [], 88172645463325252
    for _ in range(num_hashes):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = state % ((1 << 30) - 2) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % MINHASH_P
        params.append((a, b))
    return params


def minhash_signatures(df: DataFrame, id_col: str, text_col: str, *,
                       num_hashes: int = 16, shingle_n: int = 3) -> DataFrame:
    """Wide minhash signature: one row per doc with columns mh0..mh{k-1},
    where mh_i = min over shingles of (a_i*h + b_i) mod P for ONE shared
    base hash h = int(md5(shingle)[:8], 16) mod P.

    Two layout decisions that matter at 100 TB:
    - k min-aggregates over the exploded shingle rows — partial
      (map-side) mins mean the shuffle carries only docs x k BIGINTs,
      never the (doc, seed) cross product.
    - one md5 per shingle row + k affine transforms, instead of k
      salted md5s: the expensive digest is computed once and the k
      permutations are 3-op integer arithmetic in whole-stage codegen
      (the standard universal-hashing construction; 4.8 s -> 3.0 s on
      the sf0.1 bench)."""
    sh = shingle_rows(df, id_col, text_col, n=shingle_n, distinct=False)
    base = (F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("long")
            % F.lit(MINHASH_P))
    hashed = sh.select(id_col, base.alias("_h"))
    # one parsed SQL string per permutation, not a composed Column
    # tree (the simhash() construction-cost fix, same reasoning —
    # ints here all fit in BIGINT: a,b < P < 2^31 and _h < P, so
    # a*_h + b < 2^62; the L suffixes pin BIGINT arithmetic exactly
    # like F.lit's long literals did)
    aggs = [
        F.expr(f"min(({a}L * _h + {b}L) % {MINHASH_P}L)").alias(f"mh{i}")
        for i, (a, b) in enumerate(minhash_params(num_hashes))
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def minhash_lsh_candidates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", *,
                           num_hashes: int = 16, bands: int = 4,
                           shingle_n: int = 3,
                           max_bucket_size: int | None = None) -> DataFrame:
    """LSH candidate pairs: band the signature (rows_per_band =
    num_hashes/bands), hash each band, self-join band buckets.

    Returns (id_a, id_b, n_shared_bands) with id_a < id_b.

    Scale shape — band over DISTINCT signatures, never docs (the same
    construction simhash_pairs uses, for the same reason): dup-heavy
    corpora collapse thousands of docs onto one signature, and banding
    doc rows turns each such signature into a mega-bucket whose O(dups²)
    join output is regenerated per band and then re-aggregated through a
    pair-keyed shuffle. Pairing distinct signatures keeps the bucket
    join |sigs|-sized; the expansion back to doc pairs (two hash joins
    on the signature key + the within-signature self-join) is
    output-sized — work proportional to the answer. Same-signature pairs
    share every band by construction, so they skip the band join AND the
    pair-count aggregation entirely. Measured on the sf0.1 documents
    corpus (5000 docs, 2187 distinct sigs, top group 942 docs): the
    doc-banded formulation squared the 1632-doc mega-bucket into ~2.7M
    join rows + a 2.2M-row groupBy; sig-banding cuts the bucket join to
    ≤79-member buckets.

    `max_bucket_size` is the boilerplate lever and counts DOCS, not
    signatures: a (band, band_hash) bucket with more than N member docs
    is near-identical boilerplate, not near-dups worth pairing — capped
    buckets are dropped whole (pairs within them can still surface via
    the doc's OTHER bands, so recall degrades gracefully). Doc counts
    per bucket are one window over the sig-level band rows weighted by
    signature group size — same shuffle key as the bucket join."""
    from pyspark.sql.window import Window

    rows_per_band = num_hashes // bands
    mh_cols = [f"mh{i}" for i in range(num_hashes)]
    band_cols = [
        F.md5(F.concat_ws(",", *[
            F.col(f"mh{i}") for i in range(b * rows_per_band, (b + 1) * rows_per_band)
        ])).alias(f"_bh{b}")
        for b in range(bands)
    ]
    # (id, sig_key, band hashes): 1 row/doc, feeds three branches
    # (distinct sigs, both expansion sides) — materialize once instead
    # of recomputing the shingle+min agg per branch (at cluster scale:
    # persist/checkpoint to storage).
    sig = (minhash_signatures(df, id_col, text_col,
                              num_hashes=num_hashes, shingle_n=shingle_n)
           .select(id_col, F.md5(F.concat_ws(",", *mh_cols)).alias("_sig"),
                   *band_cols)
           .localCheckpoint(eager=True))
    dsig = sig.drop(id_col).distinct()
    band_structs = [
        F.struct(F.lit(b).alias("band"), F.col(f"_bh{b}").alias("band_hash"))
        for b in range(bands)
    ]
    band_sig = dsig.select(
        "_sig", F.explode(F.array(*band_structs)).alias("_b")
    ).select("_sig", "_b.band", "_b.band_hash")

    docs = sig.select(id_col, "_sig")
    if max_bucket_size is not None:
        gsize = docs.groupBy("_sig").agg(F.count(F.lit(1)).alias("_g"))
        wb = Window.partitionBy("band", "band_hash")
        band_sig = (band_sig.join(gsize, "_sig")
                    .withColumn("_bn", F.sum("_g").over(wb))
                    .filter(F.col("_bn") <= max_bucket_size)
                    .select("_sig", "band", "band_hash"))

    # cross-signature pairs: bucket self-join over distinct signatures,
    # band count at sig level (tiny), then output-sized expansion.
    a = band_sig.select(F.col("_sig").alias("_sa"), "band", "band_hash")
    b = band_sig.select(F.col("_sig").alias("_sb"), "band", "band_hash")
    sig_pairs = (a.join(b, ["band", "band_hash"])
                 .filter(F.col("_sa") < F.col("_sb"))
                 .groupBy("_sa", "_sb")
                 .agg(F.count(F.lit(1)).alias("n_shared_bands")))
    docs_a = docs.select(F.col(id_col).alias("id_a"), F.col("_sig").alias("_sa"))
    docs_b = docs.select(F.col(id_col).alias("id_b"), F.col("_sig").alias("_sb"))
    cross = (sig_pairs.join(docs_a, "_sa").join(docs_b, "_sb")
             .select(F.least("id_a", "id_b").alias("id_a"),
                     F.greatest("id_a", "id_b").alias("id_b"),
                     "n_shared_bands"))

    # same-signature pairs: share every band that SURVIVED the cap
    # (all `bands` of them when no cap); sigs whose every bucket was
    # capped away drop out via the inner join.
    if max_bucket_size is not None:
        sband = band_sig.groupBy("_sig").agg(
            F.count(F.lit(1)).alias("n_shared_bands"))
        same_base = docs.join(sband, "_sig")
    else:
        same_base = docs.withColumn(
            "n_shared_bands", F.lit(bands).cast("long"))
    same = (same_base.select(F.col(id_col).alias("id_a"), "_sig", "n_shared_bands")
            .join(docs.select(F.col(id_col).alias("id_b"), "_sig"), "_sig")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "n_shared_bands"))
    return cross.unionByName(same)


def _shingle_dictionary(sh: DataFrame) -> DataFrame:
    """(shingle, wid) dictionary, wid 1-based in rarest-first order
    (doc-frequency asc, shingle asc — a deterministic global total
    order, which is all prefix-filter correctness needs; rarest-first
    is the performance heuristic on top).

    Ranking is RANGE-PARTITIONED, never a global single-task window:
    repartitionByRange on the sort key (pid order == key order, keys
    unique so no boundary ties), localCheckpoint to pin the sampled
    range boundaries, then one vocab-sized collect of per-partition
    COUNTS (not rows) -> cumulative offsets, and a per-partition
    row_number + offset. Identical wid assignment to a global
    row_number, but every step is parallel — at web-corpus vocab
    (billions of shingles) there is no single-partition funnel."""
    from pyspark.sql import Window

    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_gf"))
    n_parts = int(freq.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    ranked = (freq.repartitionByRange(n_parts, "_gf", "shingle")
              .withColumn("_pid", F.spark_partition_id())
              .localCheckpoint(eager=True))
    counts = {r["_pid"]: r["n"] for r in
              ranked.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()}
    if not counts:
        return freq.select("shingle", F.lit(1).alias("wid")).limit(0)
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off = F.element_at(
        F.create_map(*[F.lit(x) for kv in sorted(offsets.items()) for x in kv]),
        F.col("_pid"))
    w = Window.partitionBy("_pid").orderBy("_gf", "shingle")
    return ranked.select(
        "shingle", (F.row_number().over(w) + off).cast("int").alias("wid"))


# interpreted zip_with fold vs numpy popcount kernel crossover, in PAIR
# word-ops (n_docs^2 * mask-words — the BNLJ tests n^2/2 pairs, so the
# decision must scale with pair count, not doc count). Measured on the
# sf0.01 bigram corpus (916 vocab, 15 words): 500 docs = 3.75M ops ->
# zip_with 2.2-3.1s vs numpy 2.7-3.5s (fold wins); 2000 docs = 60M ops
# -> numpy 6.6-9.1s vs fold 9.4-10.0s (kernel wins). Crossover ~20M.
# Monkeypatchable for lane-equivalence tests.
_GEMM_CROSSOVER = 20_000_000

# pair-word-op volume above which the dense-numpy lane pays for a
# vocabulary-component decomposition first (the CC labeling costs a few
# driver-lane seconds — noise at billions of pair ops, a 20-50% tax at
# the crossover boundary, hence the 64x margin)
_DECOMPOSE_MIN_OPS = 64 * _GEMM_CROSSOVER


def _dense_pairs_numpy(masks: DataFrame, id_col: str, n_words: int,
                       threshold: float,
                       broadcast_bytes: int = 256 << 20) -> DataFrame:
    """Dense-universe pair kernel for 64 < vocab <= dense_universe_max:
    the whole (id, bitmap, n) projection is broadcast (the lane's
    precondition bounds it), and each partition computes its rows'
    intersections against ALL docs with a BLOCKED numpy popcount —
    `bitwise_count(A[:,None,:] & B[None,:,:]).sum(-1)` in B-chunks —
    replacing the interpreted `aggregate(zip_with(...))` fold that the
    round-2 audit flagged (crossover ~256 madds/row; same blocked-
    broadcast shape as the embedding GEMM in similarity.py).

    The driver-side collect is BOUNDED, not a scale hazard: the caller
    enters this lane only when n_docs * (8*n_words + 32) <=
    dense_broadcast_bytes (default 256 MB) — the same projection any
    broadcast join would pull through the driver-side
    BroadcastExchange. The bound is enforced on the COLLECTED row
    count (a pre-count() would re-execute the whole mask-building
    subtree just to check it, doubling the most expensive stage; and
    a bare assert disappears under python -O); replicating the matrix
    to Python workers then rides sc.broadcast's torrent path rather
    than per-task Arrow re-ship.

    When masks carries a `_c` (vocabulary-component) column, each
    probe row is tested only against ITS component's slice of the
    broadcast matrix — cross-component intersections are zero by
    construction, so the output is identical and the pair-test volume
    drops from n^2 to sum_c(g_c^2)."""
    import numpy as np
    import pandas as pd

    spark = masks.sparkSession
    has_comp = "_c" in masks.columns
    cols = [id_col, "_m", "n"] + (["_c"] if has_comp else [])
    rows = masks.select(*cols).collect()
    n_docs = len(rows)
    if n_docs * (8 * n_words + 32) > broadcast_bytes:
        raise ValueError(
            f"dense lane precondition violated: {n_docs} docs x "
            f"{n_words} mask words exceeds the {broadcast_bytes >> 20} MB "
            "broadcast bound — use the sparse prefix-filter lane")
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    # bigint bitmaps may be negative (bit 63): int64 view -> uint64
    mat = np.array([r[1] for r in rows], dtype=np.int64) \
        .view(np.uint64).reshape(len(rows), n_words)
    counts = np.array([r[2] for r in rows], dtype=np.int64)
    if has_comp:
        comps = np.array([r[3] for r in rows], dtype=np.int64)
        order = np.argsort(comps, kind="stable")
        ids, mat, counts, comps = (ids[order], mat[order], counts[order],
                                   comps[order])
        # component -> contiguous [start, end) slice of the sorted side
        uniq, starts = np.unique(comps, return_index=True)
        slices = {int(c): (int(s), int(e)) for c, s, e in
                  zip(uniq, starts, list(starts[1:]) + [len(comps)])}
    else:
        slices = None
    b = spark.sparkContext.broadcast((ids, mat, counts, slices))

    if hasattr(np, "bitwise_count"):
        def _pop(x):
            return np.bitwise_count(x).sum(axis=-1, dtype=np.int64)
    else:  # numpy < 2: 256-entry LUT over the uint8 view
        _LUT = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint16)

        def _pop(x):
            v = x.view(np.uint8)
            return _LUT[v].sum(axis=-1, dtype=np.int64)

    def gen(batches):
        b_ids, b_mat, b_n, b_slices = b.value

        def emit(aI, aM, aN, lo, hi):
            sI, sM, sN = b_ids[lo:hi], b_mat[lo:hi], b_n[lo:hi]
            block = max(1, (64 << 20) // max(1, len(sI) * n_words * 8))
            for s in range(0, len(aI), block):
                cI, cM, cN = aI[s:s + block], aM[s:s + block], aN[s:s + block]
                inter = _pop(cM[:, None, :] & sM[None, :, :])
                union = cN[:, None] + sN[None, :] - inter
                with np.errstate(divide="ignore", invalid="ignore"):
                    jac = inter / union
                keep = ((cI[:, None] < sI[None, :]) & (inter >= 1)
                        & (jac >= threshold))
                ai, bi = np.nonzero(keep)
                if len(ai):
                    yield pd.DataFrame({
                        "id_a": cI[ai], "id_b": sI[bi],
                        "inter": inter[ai, bi], "jaccard": jac[ai, bi]})

        for pdf in batches:
            a_ids = pdf[id_col].to_numpy(dtype=np.int64)
            a_mat = np.array(list(pdf["_m"]), dtype=np.int64) \
                .view(np.uint64).reshape(len(pdf), n_words)
            a_n = pdf["n"].to_numpy(dtype=np.int64)
            if b_slices is None:
                yield from emit(a_ids, a_mat, a_n, 0, len(b_ids))
                continue
            a_c = pdf["_c"].to_numpy(dtype=np.int64)
            order = np.argsort(a_c, kind="stable")
            a_ids, a_mat, a_n, a_c = (a_ids[order], a_mat[order],
                                      a_n[order], a_c[order])
            uq, st = np.unique(a_c, return_index=True)
            for c, s0, s1 in zip(uq, st, list(st[1:]) + [len(a_c)]):
                lo, hi = b_slices[int(c)]
                yield from emit(a_ids[s0:s1], a_mat[s0:s1], a_n[s0:s1],
                                lo, hi)

    # the probe side must spread across the executor cores: masks often
    # hangs off a one-file scan + groupBy whose AQE-coalesced output is
    # 1-2 partitions, which would serialize the O(n^2/cores) kernel
    # (measured: the 10x scale probe ran the whole kernel on 2 tasks)
    par = spark.sparkContext.defaultParallelism
    probe = masks.repartition(par)
    return probe.mapInPandas(
        gen, "id_a long, id_b long, inter long, jaccard double")


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", *,
                        shingle_n: int = 3, threshold: float = 0.2,
                        max_shingle_freq: int | None = None,
                        dense_universe_max: int = 4096,
                        dense_broadcast_bytes: int = 256 << 20) -> DataFrame:
    """Exact n-gram Jaccard pairs (J = |A∩B| / (|A|+|B|-|A∩B|) over
    distinct shingles) >= threshold, with an ADAPTIVE physical strategy
    picked from two cheap vocab/corpus-size probes (AQE-spirit: measure,
    then choose the plan):

    - DENSE UNIVERSE (vocab <= dense_universe_max and the (id, mask)
      projection fits in dense_broadcast_bytes): dictionary-encode
      shingles, pack each doc's set into a 64-bit mask (vocab <= 64) or
      an array<bigint> bitmap; |A∩B| = bit_count(maskA & maskB) inside a
      broadcast nested-loop join — zero shuffle, zero arrays-of-strings,
      pure whole-stage codegen. This regime (tiny universe, dup-heavy
      corpus) is exactly where inverted-index joins blow up: every
      shingle is ubiquitous, so index/prefix candidate generation
      degenerates toward n^2 rows THROUGH A SHUFFLE, while the bitmap
      cross product does the same n^2/2 pair tests at ~1ns each with no
      data movement. Measured on the sf0.1 documents corpus (5k docs,
      31-word vocab, 964k true pairs at t=0.9): 107s sparse-prefix ->
      ~4s dense.

    - SPARSE (real text at scale: vocab >> docs): inverted-index join
      restricted to each doc's PREFIX under a global rarest-first order
      — for J(A,B) >= t some common shingle must sit in the first
      |A| - ceil(t*|A|) + 1 elements of A (prefix-filtering lemma:
      Vernica/Carey/Li SIGMOD'10, PPJoin), plus the length filter
      t*|A| <= |B| <= |A|/t; exact intersections via array_intersect
      over dictionary ints (8B, not strings) on surviving candidates
      only. At 100 TB this is the standard near-linear plan; the
      boilerplate lever is `max_shingle_freq`, which drops ubiquitous
      shingles before everything (semantics-changing, off by default).
    """
    sh = shingle_rows(df, id_col, text_col, n=shingle_n)
    # lazy checkpoint: the vocab probe (dic count) materializes the
    # scan+normalize+explode+distinct subtree once; the ids join and
    # everything downstream then reads the stored rows instead of
    # re-exploding the corpus per consumer
    sh = sh.localCheckpoint(eager=False)
    if max_shingle_freq is not None:
        freq_cap = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_f"))
        sh = sh.join(F.broadcast(freq_cap.filter(F.col("_f") <= max_shingle_freq)
                                 .select("shingle")), "shingle")
    dic = _shingle_dictionary(sh)
    vocab = dic.count()  # adaptive probe #1 (vocab-sized job)
    ids = sh.join(F.broadcast(dic), "shingle").select(id_col, "wid")
    if vocab > 64:
        # the bitmap/sparse paths consume `ids` several times (masks,
        # doc arrays, and the numpy lane's component stars); without a
        # checkpoint every consumer re-runs the scan+normalize+explode
        # +distinct subtree — measured 38 s -> 16 s on the x10 probe
        ids = ids.localCheckpoint(eager=False)

    jacc = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    if vocab <= dense_universe_max:
        n_docs = df.count()  # adaptive probe #2 (metadata-cheap)
        n_words = (vocab + 63) // 64
        if n_docs * (8 * n_words + 32) <= dense_broadcast_bytes:
            if vocab <= 64:
                masks = ids.groupBy(id_col).agg(
                    F.sum(F.expr("shiftleft(1L, wid - 1)")).alias("_m"),
                    F.count(F.lit(1)).alias("n"))
                inter = F.expr("bit_count(_ma & _mb)")
            else:
                wm = (ids.select(id_col,
                                 F.expr("CAST((wid - 1) DIV 64 AS INT)").alias("_w"),
                                 F.expr("shiftleft(1L, (wid - 1) % 64)").alias("_b"))
                      .groupBy(id_col, "_w").agg(F.sum("_b").alias("_bits")))
                masks = wm.groupBy(id_col).agg(
                    F.map_from_entries(F.collect_list(F.struct("_w", "_bits"))).alias("_mm"),
                    F.sum(F.expr("bit_count(_bits)")).alias("n"))
                masks = masks.select(
                    id_col, "n",
                    F.expr(f"transform(sequence(0, {n_words - 1}),"
                           " w -> coalesce(try_element_at(_mm, w), 0L))").alias("_m"))
                if n_docs * n_docs * n_words >= _GEMM_CROSSOVER:
                    # past the measured interpreted-fold crossover:
                    # blocked numpy popcount kernel. At serious pair
                    # volumes, first label docs by vocabulary-connected
                    # component (docs in different components share no
                    # shingle, so every cross-component test is wasted
                    # work the inter>=1 filter would discard): the
                    # kernel then probes only the component slice.
                    # Round 6: the shingles themselves are ALSO
                    # re-indexed to compact per-component word ids, so
                    # the mask width is the LARGEST COMPONENT's vocab,
                    # not the global vocab — on the x10 probe corpus
                    # (50k docs as 10 disjoint replicas of a 31-word
                    # vocabulary) that collapses 5 mask words back to
                    # the 1 word the x1 corpus uses, removing the
                    # vocab>64 lane-switch cliff (r5's 16-25 s
                    # residual; VERDICT r5 next-round #3). Jaccard is
                    # invariant under the re-index (bijective within a
                    # component; cross-component intersections are
                    # empty by construction).
                    if n_docs * n_docs * n_words >= _DECOMPOSE_MIN_OPS:
                        from pyspark.sql.window import Window

                        per_sh = ids.groupBy("wid").agg(
                            F.min(id_col).alias("_root"))
                        star = (ids.join(per_sh, "wid")
                                .select(F.col(id_col).alias("id_a"),
                                        F.col("_root").alias("id_b"))
                                .filter(F.col("id_a") != F.col("id_b"))
                                .distinct())
                        labels = connected_components(star)
                        # shingle -> component via its root doc
                        # (singleton roots label themselves), then a
                        # compact local word id per component — a
                        # vocab-sized window, <= dense_universe_max rows
                        wid_comp = (per_sh.join(
                            labels.withColumnRenamed("node", "_root"),
                            "_root", "left")
                            .select("wid", F.coalesce(
                                "component", F.col("_root")).alias("_c")))
                        wloc = wid_comp.select(
                            "wid", "_c",
                            F.row_number().over(
                                Window.partitionBy("_c").orderBy("wid"))
                            .alias("_lwid"))
                        max_local = wloc.agg(
                            F.max("_lwid")).collect()[0][0]
                        nw_local = (max_local + 63) // 64
                        il = ids.join(F.broadcast(wloc), "wid")
                        lwm = (il.select(
                            id_col, "_c",
                            F.expr("CAST((_lwid - 1) DIV 64 AS INT)")
                            .alias("_w"),
                            F.expr("shiftleft(1L, (_lwid - 1) % 64)")
                            .alias("_b"))
                            .groupBy(id_col, "_c", "_w")
                            .agg(F.sum("_b").alias("_bits")))
                        cmasks = lwm.groupBy(id_col, "_c").agg(
                            F.map_from_entries(F.collect_list(
                                F.struct("_w", "_bits"))).alias("_mm"),
                            F.sum(F.expr("bit_count(_bits)")).alias("n"))
                        cmasks = cmasks.select(
                            id_col, "_c", "n",
                            F.expr(f"transform(sequence(0, {nw_local - 1}),"
                                   " w -> coalesce(try_element_at(_mm, w),"
                                   " 0L))").alias("_m"))
                        return _dense_pairs_numpy(cmasks, id_col,
                                                  nw_local, threshold,
                                                  dense_broadcast_bytes)
                    return _dense_pairs_numpy(masks, id_col, n_words,
                                              threshold,
                                              dense_broadcast_bytes)
                inter = F.expr("aggregate(zip_with(_ma, _mb, (x, y) -> bit_count(x & y)),"
                               " 0, (acc, v) -> acc + v)")
            # probe side spread across cores: a one-file scan plus an
            # AQE-coalesced groupBy can leave 1-2 partitions, which
            # would serialize the O(n^2) BNLJ on a single task
            par = df.sparkSession.sparkContext.defaultParallelism
            a = masks.repartition(par).select(
                F.col(id_col).alias("id_a"),
                F.col("_m").alias("_ma"), F.col("n").alias("na"))
            b = masks.select(F.col(id_col).alias("id_b"),
                             F.col("_m").alias("_mb"), F.col("n").alias("nb"))
            pairs = (a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
                     .withColumn("inter", inter)
                     .withColumn("jaccard", jacc))
            return (pairs.filter((F.col("inter") >= 1) & (F.col("jaccard") >= threshold))
                    .select("id_a", "id_b", "inter", "jaccard"))

    docs = ids.groupBy(id_col).agg(F.array_sort(F.collect_list("wid")).alias("_ids"),
                                   F.count(F.lit(1)).alias("n"))
    prefix_len = (F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1).cast("int")
    pref = docs.select(id_col, "n",
                       F.explode(F.slice("_ids", F.lit(1), prefix_len)).alias("_w"))
    a = pref.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"), "_w")
    b = pref.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"), "_w")
    cond = F.col("id_a") < F.col("id_b")
    if threshold > 0:
        cond = (cond & (F.col("nb") * F.lit(threshold) <= F.col("na"))
                & (F.col("na") * F.lit(threshold) <= F.col("nb")))
    cand = a.join(b, "_w").filter(cond).select("id_a", "id_b", "na", "nb").distinct()
    da = docs.select(F.col(id_col).alias("id_a"), F.col("_ids").alias("_sa"))
    db = docs.select(F.col(id_col).alias("id_b"), F.col("_ids").alias("_sb"))
    j = (cand.join(da, "id_a").join(db, "id_b")
         .withColumn("inter", F.size(F.array_intersect("_sa", "_sb")))
         .withColumn("jaccard", jacc))
    return (j.filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "inter", "jaccard"))


def _np_components(src, dst):
    """Driver/worker-side min-label components over an edge-list pair
    of numpy arrays (any orientation — symmetrized internally). Returns
    (nodes, labels) with labels = min node id of each component.

    Vectorized hash-min with pointer jumping (O(log n) rounds; a
    per-edge python loop measured 9.4 s at 1M edges, this ~0.1 s).
    Non-numeric ids are dense-ranked so the kernel always runs on
    integers (object-dtype minimum.at is Python-speed)."""
    import numpy as np

    if src.dtype == object or dst.dtype == object:
        order = np.unique(np.concatenate([src, dst]))
        src = np.searchsorted(order, src)
        dst = np.searchsorted(order, dst)
    else:
        order = None
    s = np.concatenate([src, dst])             # symmetrize
    d = np.concatenate([dst, src])
    nodes = np.unique(s)
    idx = np.searchsorted(nodes, s)
    jdx = np.searchsorted(nodes, d)
    lab = nodes.copy()
    while True:
        prev = lab.copy()
        np.minimum.at(lab, idx, lab[jdx])              # relax edges
        lab = np.minimum(lab, lab[np.searchsorted(nodes, lab)])  # jump
        if np.array_equal(lab, prev):
            break
    if order is not None:
        nodes, lab = order[nodes], order[lab]
    return nodes, lab


def _partition_stars(batches):
    """mapInPandas kernel: local union-find over ONE partition's edges,
    emitting the spanning star (node, root=min local member) for every
    node — a connectivity-equivalent contraction of the partition's
    edge set (each local component's edges collapse to <= |nodes|
    star edges; cross-partition gluing happens because shared nodes
    carry their per-partition roots)."""
    import numpy as np
    import pandas as pd

    chunks = [b for b in batches if len(b)]
    if not chunks:
        return
    src = np.concatenate([c["src"].to_numpy() for c in chunks])
    dst = np.concatenate([c["dst"].to_numpy() for c in chunks])
    nodes, lab = _np_components(src, dst)
    yield pd.DataFrame({"node": nodes, "root": lab})


def connected_components(pairs: DataFrame, *, id_a: str = "id_a",
                         id_b: str = "id_b", max_iterations: int = 20,
                         driver_threshold: int = 20_000_000,
                         direct_collect_max: int = 100_000) -> DataFrame:
    """(node, component) labels from a similarity-pair edge list —
    the step that turns near-dup PAIRS into dedup CLUSTERS.

    Hash-min label propagation: every node starts labeled with itself;
    each round every node takes the min label in its neighborhood;
    converges in O(diameter) rounds (near-dup clusters are dense, so
    2-4 rounds in practice). Each round is ONE groupBy over the edge
    list — the standard large-graph formulation (no driver-side graph,
    no quadratic state). Iteration count is checked by a driver-side
    equality probe on label sums; localCheckpoint truncates the growing
    lineage each round (at 100 TB you checkpoint to storage instead).

    The edge list is checkpointed ONCE before iterating — it usually
    hangs off an expensive pair-generation subtree (shingle joins,
    BNLJ kernels), and without materialization every round would
    re-execute that whole subtree (measured 20.6 s -> 6 s on the
    sf0.1 dedup_clusters query, where pairs cost ~2 s per rebuild).

    ADAPTIVE lanes (each propagation round of the distributed path
    costs a join, a groupBy, an eager checkpoint and a convergence
    probe — ~1 s of fixed overhead per round on an idle local cluster,
    which dwarfs the actual work on small graphs):

    1. direct-collect (<= direct_collect_max edges): collect the edge
       list once, union-find in numpy, ship labels back through Arrow.
       Zero shuffles; right for the common case where the near-dup
       GRAPH is orders of magnitude smaller than the corpus.
    2. pre-contracted (<= driver_threshold edges): mapInPandas runs a
       LOCAL union-find per partition and emits only the spanning star
       (node, local_root); the driver then solves the root-graph
       (pairs of roots that share a node across partitions — smaller
       than the edge list by the local clustering factor) and the
       labels come back via a BROADCAST join against the distributed
       stars. The driver never holds the full edge list or the full
       node set — the 12-14 s toArrow stall at ~10M edges becomes a
       sub-second root-graph collect (r4 advice + brief item 5).
    3. distributed hash-min (> driver_threshold): unchanged.

    Gating is dtype-aware (r4 advice): the thresholds assume ~8-byte
    numeric ids; object-dtype (string) ids cost an order of magnitude
    more per row on the driver, so both cutoffs are divided by 10 for
    non-numeric node types. Pass driver_threshold=0 to force the fully
    distributed lane regardless of size.

    The RAW pair list is what gets checkpointed and counted: the
    symmetrize-union + distinct (a 2x-the-edges shuffle) is required
    only by the distributed hash-min rounds, so the two driver lanes
    skip it entirely — the numpy kernel symmetrizes internally, and
    duplicate pairs are union-find no-ops. Measured on the x10 probe's
    dedup_clusters pair list (9.65M edges): r4 direct collect 22.6 s
    -> pre-contracted over the symmetric-distinct set 18.5 s ->
    pre-contracted over the raw list 6.1 s, identical labels."""
    # node type = the UNION coercion of the two id columns (schema-only
    # probe, nothing executes): mixed-width inputs (int id_a, bigint
    # id_b) must not truncate through an int labels schema
    node_t = (pairs.select(F.col(id_a).alias("x"))
              .union(pairs.select(F.col(id_b).alias("x")))
              .schema["x"].dataType.simpleString())
    raw = (pairs.select(F.col(id_a).cast(node_t).alias("src"),
                        F.col(id_b).cast(node_t).alias("dst"))
           .localCheckpoint(eager=True))
    n_edges = raw.count()  # free: the checkpoint is already materialized
    numeric_ids = node_t in ("tinyint", "smallint", "int", "bigint",
                             "float", "double", "date", "timestamp",
                             "timestamp_ntz") or node_t.startswith("decimal")
    dtype_div = 1 if numeric_ids else 10
    eff_direct = direct_collect_max // dtype_div
    eff_driver = driver_threshold // dtype_div

    def _labels_df(nodes, lab):
        # return through Arrow (pandas frame), not a pickled tuple
        # list — pickle costs minutes + GBs of driver heap at scale
        import pandas as pd

        return pairs.sparkSession.createDataFrame(
            pd.DataFrame({"node": nodes, "component": lab}),
            f"node {node_t}, component {node_t}")

    def _collect_np(df, a, b):
        try:
            tbl = df.toArrow()                 # no pandas detour
            return tbl[a].to_numpy(), tbl[b].to_numpy()
        except AttributeError:                 # pyspark < 4
            pdf = df.toPandas()
            return pdf[a].to_numpy(), pdf[b].to_numpy()

    if n_edges <= eff_direct:
        src, dst = _collect_np(raw, "src", "dst")
        return _labels_df(*_np_components(src, dst))
    if n_edges <= eff_driver:
        stars = raw.mapInPandas(
            _partition_stars, schema=f"node {node_t}, root {node_t}"
        ).localCheckpoint(eager=True)          # reused: root-graph + label join
        # root-graph: nodes seen under several per-partition roots glue
        # those roots together; everything else is already contracted
        g = stars.groupBy("node").agg(F.min("root").alias("_r0"),
                                      F.collect_set("root").alias("_rs"))
        ced = (g.select(F.col("_r0").alias("ra"),
                        F.explode("_rs").alias("rb"))
               .filter(F.col("ra") != F.col("rb"))
               .localCheckpoint(eager=True))
        if ced.count() <= eff_driver:          # worst case (no local
            ra, rb = _collect_np(ced, "ra", "rb")   # clustering) ~ |stars|
            if len(ra):
                r_nodes, r_lab = _np_components(ra, rb)
                root_labels = _labels_df(r_nodes, r_lab) \
                    .withColumnsRenamed({"node": "root", "component": "_c"})
                out = stars.join(F.broadcast(root_labels), "root", "left")
            else:                              # every component is local
                out = stars.withColumn("_c", F.lit(None).cast(node_t))
            return (out.select("node",
                               F.coalesce("_c", "root").alias("component"))
                    .groupBy("node").agg(F.min("component").alias("component")))
        # contraction didn't shrink it — fall through to distributed
    # only the hash-min rounds need the symmetric distinct edge set
    base = (raw.union(raw.select(F.col("dst").alias("src"),
                                 F.col("src").alias("dst")))
            .distinct()).localCheckpoint(eager=True)
    # self-loops make labels(node) include the node itself each round
    nodes = base.select(F.col("src").alias("node")).distinct()
    edges = base.union(nodes.select(F.col("node").alias("src"),
                                    F.col("node").alias("dst")))
    labels = nodes.withColumn("label", F.col("node")) \
        .localCheckpoint(eager=True)
    for _ in range(max_iterations):
        prev = labels
        joined = edges.join(labels.withColumnRenamed("node", "dst"), "dst")
        labels = (joined.groupBy(F.col("src").alias("node"))
                  .agg(F.min("label").alias("label"))).localCheckpoint(eager=True)
        # EXACT convergence probe: did any node's label change this
        # round? Both frames are checkpointed and hash-partitioned on
        # node (the groupBy output), so the probe join adds no
        # exchange on the new side. A multiset SIGNATURE here is a
        # correctness trap: labels decrease monotonically, so a raw
        # sum was exact for numeric labels, but any hash-combined
        # signature (sum or xor of hashes) can collide when an even
        # number of nodes make identical transitions in one round —
        # bit_xor(h(2->1)) ^ bit_xor(h(2->1)) == 0 — silently freezing
        # the loop early with split components (round-5 review find).
        changed = (labels.join(prev.withColumnRenamed("label", "_pl"),
                               "node")
                   .filter(F.col("label") != F.col("_pl")).take(1))
        if not changed:
            break
    return labels.select("node", F.col("label").alias("component"))


def dedup_keep_canonical(df: DataFrame, pairs: DataFrame, *,
                         id_col: str = "doc_id", pair_a: str = "id_a",
                         pair_b: str = "id_b") -> DataFrame:
    """End-to-end dedup: cluster the near-dup pairs, keep the smallest
    id per component, return the deduplicated corpus (docs never seen
    in any pair pass through untouched)."""
    comp = connected_components(pairs, id_a=pair_a, id_b=pair_b)
    keep = comp.groupBy("component").agg(F.min("node").alias("_keep"))
    drop = (comp.join(keep, "component")
            .filter(F.col("node") != F.col("_keep"))
            .select(F.col("node").alias(id_col)))
    return df.join(drop, id_col, "left_anti")


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", *,
            bits: int = 32, shingle_n: int = 3) -> DataFrame:
    """Per-doc simhash signature: 32-bit md5-derived hash per shingle,
    per-bit majority vote, reassembled to one BIGINT.

    Layout: WIDE aggregation — per-shingle int hash, then one
    groupBy(doc) with `bits` conditional-sum vote columns (same shape
    as the minhash signature agg: map-side partial sums mean the
    shuffle carries docs x bits SMALLINT-sized votes, never the
    (shingle, bit) cross product a bit-explode layout would emit —
    one shuffle total, 32x fewer intermediate rows)."""
    sh = shingle_rows(df, id_col, text_col, n=shingle_n)
    h = F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("long")
    hashed = sh.select(id_col, h.alias("h"))
    # each vote / reassembly term is ONE parsed SQL string, not a
    # composed Column tree: the bits x ~6-node py4j composition built
    # ~400 JVM round trips per call, 0.65-0.85 s of pure driver-side
    # construction per batch (measured r11 — the fold calls this once
    # per crawl batch). Same expressions, same results; long literals
    # ({v}L) keep the reassembly sum in BIGINT exactly like the
    # F.lit(1 << b) path did.
    votes = [
        F.expr(f"sum(CASE WHEN (h >> {b}) % 2 = 1 THEN 1 ELSE -1 END)")
        .alias(f"v{b}")
        for b in range(bits)
    ]
    per_doc = hashed.groupBy(id_col).agg(*votes)
    sig = F.expr("CAST(" + " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {1 << b}L ELSE 0L END)"
        for b in range(bits)) + " AS BIGINT)")
    return per_doc.select(id_col, sig.alias("simhash"))


def simhash_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", *,
                  bits: int = 32, shingle_n: int = 3,
                  hamming_max: int = 3) -> DataFrame:
    """Near-dup PAIRS from simhash signatures: (id_a, id_b, hamming)
    with hamming(simhash_a, simhash_b) <= hamming_max, id_a < id_b.

    EXACT under banding: the signature is cut into hamming_max + 1
    bit-bands; by pigeonhole any pair within the threshold agrees on at
    least one whole band, so the (band_id, band_value) equi-self-join
    generates a candidate superset and the bit_count(xor) filter makes
    the result exact — the Manku/Jain/Sarma WWW'07 construction.

    Scale shape: the band join runs over DISTINCT signatures, never
    docs. Duplicate-heavy corpora collapse thousands of docs onto one
    signature; banding doc rows would turn each such signature into a
    mega-bucket with O(dups^2) join output that the pair-dedup then
    throws away (measured 10.3 s -> 1.1 s at sf0.1). Pairing distinct
    signatures keeps the join |sigs|-sized; expanding back to doc pairs
    (two hash joins on the signature + the within-signature hamming-0
    self-join) is output-sized — work proportional to the answer."""
    n_bands = hamming_max + 1
    band_bits = [bits // n_bands + (1 if i < bits % n_bands else 0)
                 for i in range(n_bands)]
    # the signature table ((id, simhash), 16B/row) feeds FOUR branches
    # (distinct sigs, both expansion sides, the same-sig self-join);
    # materialize it once instead of recomputing the shingle+vote agg
    # per branch (at cluster scale: persist/checkpoint to storage)
    sig = simhash(df, id_col=id_col, text_col=text_col, bits=bits,
                  shingle_n=shingle_n).localCheckpoint(eager=True)
    sigs = sig.select("simhash").distinct()
    structs, lo = [], 0
    for b, width in enumerate(band_bits):
        structs.append(F.struct(
            F.lit(b).alias("band"),
            F.expr(f"(simhash >> {lo}) & {(1 << width) - 1}").alias("band_val")))
        lo += width
    banded = (sigs.select("simhash", F.explode(F.array(*structs)).alias("_b"))
              .select("simhash", "_b.band", "_b.band_val"))
    a = banded.select(F.col("simhash").alias("_sa"), "band", "band_val")
    b = banded.select(F.col("simhash").alias("_sb"), "band", "band_val")
    ham = F.expr("bit_count(_sa ^ _sb)")
    sig_pairs = (a.join(b, ["band", "band_val"])
                 .filter(F.col("_sa") < F.col("_sb"))
                 .select("_sa", "_sb").distinct()
                 .withColumn("hamming", ham)
                 .filter(F.col("hamming") <= hamming_max))
    # cross-signature doc pairs: expand each qualifying signature pair
    docs_a = sig.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("_sa"))
    docs_b = sig.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("_sb"))
    cross = (sig_pairs.join(docs_a, "_sa").join(docs_b, "_sb")
             .select(F.least("id_a", "id_b").alias("id_a"),
                     F.greatest("id_a", "id_b").alias("id_b"), "hamming"))
    # same-signature doc pairs (hamming 0): self-join within the group
    same = (sig.select(F.col(id_col).alias("id_a"), "simhash")
            .join(sig.select(F.col(id_col).alias("id_b"), "simhash"), "simhash")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", F.lit(0).alias("hamming")))
    return cross.unionByName(same)


def simhash_band_rows(sig: DataFrame, *, bits: int = 32,
                      hamming_max: int = 3) -> DataFrame:
    """Explode a (…, simhash) frame into hamming-band bucket rows:
    one row per (doc, band) with fingerprint = 's<band>|<band_val>'.
    Pigeonhole over hamming_max+1 bands: any pair within the hamming
    threshold shares at least one whole band (the simhash_pairs
    construction), so a bucket join yields a candidate SUPERSET and
    the bit_count filter restores exactness. The string fingerprint
    keeps the bucket set storable in the same fingerprint tables the
    other crawl loops compact."""
    n_bands = hamming_max + 1
    band_bits = [bits // n_bands + (1 if i < bits % n_bands else 0)
                 for i in range(n_bands)]
    structs, lo = [], 0
    for b, width in enumerate(band_bits):
        structs.append(F.concat(
            F.lit(f"s{b}|"),
            F.expr(f"(simhash >> {lo}) & {(1 << width) - 1}")
            .cast("string")))
        lo += width
    return sig.withColumn("fingerprint",
                          F.explode(F.array(*structs)))


def dedup_simhash_incremental(new_df: DataFrame,
                              seen_sigs: DataFrame | None, *,
                              text_col: str = "text",
                              id_col: str = "doc_id",
                              bits: int = 32, shingle_n: int = 3,
                              hamming_max: int = 3,
                              checkpoint: bool = True
                              ) -> tuple[DataFrame, DataFrame]:
    """Continuous-crawl near-dup dedup on SIMHASH distance (the
    hamming sibling of dedup_minhash_incremental): drop a new document
    iff an EARLIER arrival's signature is within `hamming_max` bits —
    earlier batch via `seen_sigs`, or a smaller id in this batch.
    Unlike the MinHash loop the semantic is exact, not probabilistic:
    the hamming band buckets only generate candidates, and the
    bit_count(xor) filter decides. Dropped docs' signatures still
    enter the seen set (chains collapse to the first arrival).

    seen_sigs is a 2-column (fingerprint, simhash) frame — ~
    (hamming_max+1) band rows per DISTINCT signature seen; compact it
    with compact_seen_fps/compact_pending_fps(cols=("fingerprint",
    "simhash")): the bucketed fingerprint layout co-locates the
    candidate join exactly like the other loops' tables.

    Returns (fresh_docs, updated_seen). Docs with no shingles have no
    signature: they pass and contribute nothing (dedup_incremental
    owns exact/empty-doc dedup)."""
    fresh, new_rows = _simhash_incr_core(
        new_df, seen_sigs, text_col=text_col, id_col=id_col,
        bits=bits, shingle_n=shingle_n, hamming_max=hamming_max,
        checkpoint=checkpoint)
    updated = (new_rows if seen_sigs is None
               else seen_sigs.union(new_rows))
    return fresh, updated


def _simhash_incr_core(new_df: DataFrame, seen_sigs: DataFrame | None,
                       *, text_col: str, id_col: str, bits: int,
                       shingle_n: int, hamming_max: int,
                       checkpoint: bool) -> tuple[DataFrame, DataFrame]:
    """(fresh_docs, NEW (fingerprint, simhash) rows) — the per-batch
    kernel; like _minhash_incr_core, new rows exclude anything already
    seen so unions stay duplicate-free.

    Scale shape: band over DISTINCT signatures, never docs — the
    simhash_pairs/minhash_lsh_candidates construction, for the same
    reason (dup-heavy corpora collapse thousands of docs onto one
    signature; banding doc rows squares every such group inside the
    bucket self-join — at sf0.1 the corpus is 5000 docs over ~2k
    distinct signatures with a 942-doc top group). Per distinct
    signature s the fold keeps _first(s) = min doc id, the band
    self-join computes m(s) = min(_first(t)) over banded neighbors t
    within the hamming threshold (s pairs with itself, so m(s) <=
    _first(s) always), and a doc with signature s drops iff
    m(s) < its id — exactly the old per-doc rule: an earlier
    within-threshold doc exists iff the minimum such id is smaller
    (pigeonhole makes the band superset complete, bit_count decides).
    The seen-side hit is a property of the signature alone, so it
    joins at sig level and expands to docs in the same single join."""
    sig = simhash(new_df, id_col=id_col, text_col=text_col, bits=bits,
                  shingle_n=shingle_n)
    if checkpoint:
        sig = sig.localCheckpoint(eager=False)
    # NOT checkpointed: a lazy barrier here serializes the epochs'
    # kernels (A/B-measured 5.0 s vs 2.8-3.2 s with a flat control);
    # the repeated groupBy references are small and pipeline freely
    dsig = sig.groupBy("simhash").agg(F.min(id_col).alias("_first"))
    band = simhash_band_rows(dsig, bits=bits, hamming_max=hamming_max)

    ham = F.expr("bit_count(simhash ^ _seen_sig)")
    neigh = band.select("fingerprint",
                        F.col("simhash").alias("_seen_sig"),
                        F.col("_first").alias("_nf"))
    meta = (band.join(neigh, "fingerprint")
            .filter(ham <= hamming_max)
            .groupBy("simhash").agg(F.min("_nf").alias("_m")))
    if seen_sigs is not None:
        hit_old = (band.join(
            seen_sigs.select("fingerprint",
                             F.col("simhash").alias("_seen_sig")),
            "fingerprint")
            .filter(ham <= hamming_max)
            .select("simhash").distinct()
            .withColumn("_old", F.lit(True)))
        meta = meta.join(hit_old, "simhash", "left")
        drop_cond = (F.col(id_col) > F.col("_m")) | F.col("_old").isNotNull()
    else:
        drop_cond = F.col(id_col) > F.col("_m")
    dropped = (sig.join(meta, "simhash")
               .filter(drop_cond)
               .select(id_col))
    fresh = new_df.join(dropped, id_col, "left_anti")

    # band rows of DISTINCT signatures are already unique: the band
    # prefix separates bands within a signature, and distinct
    # signatures cannot share a (fingerprint, simhash) row
    new_rows = band.select("fingerprint", "simhash")
    if seen_sigs is not None:
        new_rows = new_rows.join(seen_sigs, ["fingerprint", "simhash"],
                                 "left_anti")
    return fresh, new_rows
