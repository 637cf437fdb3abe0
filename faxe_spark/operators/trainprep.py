"""Training-data preparation operators: benchmark decontamination and
sequence packing.

These are the corpus-to-training-run steps a 100 TB pipeline needs
after dedup/quality (operators/dedup.py, text.py):

- decontaminate: flag training documents sharing word n-grams with an
  evaluation/benchmark set (the GPT-3 appendix-C / PaLM 13-gram
  procedure, public papers). Scale shape: the benchmark side is tiny
  (evals are MBs) -> its distinct n-gram set BROADCASTS; the 100 TB
  training side explodes map-side into (doc, gram) rows, hits the
  broadcast hash join with no shuffle, and only the per-doc hit count
  aggregates (one shuffle keyed by doc id).

- pack_chunked: concat-then-chunk layout (GPT-style): documents are
  laid out in a deterministic order and cut into fixed token-budget
  sequences; documents may span cuts. Pure window arithmetic — one
  shuffle (the per-shard sort), exactly SQL-expressible.

- pack_greedy: no-split greedy packing: walk each shard in order,
  open a new pack when the next document would overflow the budget.
  Inherently sequential per shard -> applyInPandas per shard (Arrow,
  linear scan); shards are independent so the lane scales with shard
  count, the normal layout for epoch-sharded training data.

- dsir_weights/dsir_score/dsir_resample: DSIR importance resampling
  (Xie et al. NeurIPS 2023) — hashed-ngram bucket models, integer
  log-ratio weights, scan-stage scoring. dsir_weights_flagged fits
  both models in ONE corpus scan when the target is a labeled subset;
  save/load_dsir_weights persist the B-row fit (the index lifecycle).

- shard_assign/write_shards: the deterministic global shuffle into
  training shards (md5-keyed seeded permutation, one shuffle
  including the partitioned writer). split_assign: deterministic
  train/val/test membership, scan-stage, stable under corpus growth.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType)

from faxe_spark.operators.dedup import shingle_rows
from faxe_spark.operators.text import ngram_array, token_count, words


def decontaminate(train_df: DataFrame, bench_df: DataFrame, *,
                  n: int = 8, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Annotate train_df with `n_contaminated_ngrams` (distinct train-doc
    n-grams that appear anywhere in the benchmark set) and a boolean
    `contaminated`. Filtering is the caller's policy choice (papers
    differ: drop vs. split-around the overlap)."""
    bench_grams = (shingle_rows(bench_df, id_col, text_col, n,
                                distinct=False)
                   .select("shingle").distinct())
    # training side stays shuffle-free until AFTER the broadcast join:
    # distinct-ing the full (doc, gram) explode would shuffle the whole
    # corpus; distinct-ing only the join SURVIVORS shuffles just the
    # contaminated grams (tiny — benchmark-sized at worst)
    train_grams = shingle_rows(train_df, id_col, text_col, n,
                               distinct=False)
    hits = (train_grams.join(F.broadcast(bench_grams), "shingle")
            .dropDuplicates([id_col, "shingle"])
            .groupBy(id_col)
            .agg(F.count("*").alias("n_contaminated_ngrams")))
    out = train_df.join(hits, id_col, "left")
    out = out.withColumn(
        "n_contaminated_ngrams",
        F.coalesce(F.col("n_contaminated_ngrams"), F.lit(0)))
    return out.withColumn("contaminated",
                          F.col("n_contaminated_ngrams") > 0)


def pack_chunked(df: DataFrame, *, budget: int,
                 id_col: str = "doc_id", text_col: str = "text",
                 token_col: str | None = None,
                 by: str | None = None) -> DataFrame:
    """Chunked packing: tokens concatenate in (by, id) order and are cut
    every `budget` tokens. Adds n_tokens, pack_first, pack_last and
    pack_offset (position of the doc's first token within pack_first).
    Documents may span packs — exact SQL-window arithmetic."""
    tok = (F.col(token_col) if token_col
           else token_count(F.col(text_col))).cast("long")
    keys = [by] if by else []
    if not keys:
        import warnings

        warnings.warn("pack_chunked: global ordering without a shard key "
                      "runs the cumsum window on a single task; pass "
                      "by=<shard column> for parallel packing",
                      stacklevel=2)
    w = Window.partitionBy(*keys).orderBy(id_col)
    out = df.withColumn("n_tokens", tok)
    cum = F.sum("n_tokens").over(w)
    start = cum - F.col("n_tokens")
    return out.withColumns({
        "pack_first": F.floor(start / budget),
        "pack_last": F.floor((cum - 1) / budget),
        "pack_offset": start % budget,
    })


_PACK_SCHEMA_EXTRA = [StructField("n_tokens", LongType()),
                      StructField("pack_id", LongType()),
                      StructField("pack_used", LongType())]


def pack_greedy(df: DataFrame, *, budget: int,
                id_col: str = "doc_id", text_col: str = "text",
                token_col: str | None = None,
                by: str = "source") -> DataFrame:
    """Greedy no-split packing per shard: documents in (by, id) order;
    a doc that would overflow the current pack opens a new one. Docs
    longer than the budget get a pack of their own (pack_used >
    budget flags them for truncation downstream). Returns (by, id,
    n_tokens, pack_id, pack_used) — pack_id is per-shard, pack_used
    the pack's total AFTER adding the doc."""
    tok = (F.col(token_col) if token_col
           else token_count(F.col(text_col))).cast("long")
    # NULL text -> 0 tokens (a NULL n_tokens would arrive in the Arrow
    # batch as NaN and crash the int conversion)
    slim = df.select(F.col(by).cast("string").alias(by),
                     F.col(id_col).alias(id_col),
                     F.coalesce(tok, F.lit(0)).alias("n_tokens"))
    schema = StructType(
        [StructField(by, StringType()),
         StructField(id_col, slim.schema[id_col].dataType)]
        + _PACK_SCHEMA_EXTRA)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort")
        packs, used = [], []
        pid, cur = 0, 0
        for t in pdf["n_tokens"]:
            t = int(t)
            if cur > 0 and cur + t > budget:
                pid += 1
                cur = 0
            cur += t
            packs.append(pid)
            used.append(cur)
        return pd.DataFrame({
            by: pdf[by].values, id_col: pdf[id_col].values,
            "n_tokens": pdf["n_tokens"].values,
            "pack_id": packs, "pack_used": used,
        })

    return slim.groupBy(by).applyInPandas(pack, schema)


def boilerplate_remove(df: DataFrame, *, text_col: str = "text",
                       id_col: str = "doc_id", chunk_words: int = 8,
                       min_df: int = 2,
                       carry_cols: tuple[str, ...] = ()) -> DataFrame:
    """CCNet-style corpus-level boilerplate removal: segment every
    document into fixed `chunk_words`-word chunks, count how many
    DISTINCT documents each chunk appears in, and drop chunks whose
    document frequency >= min_df (headers, footers, nav bars — text
    repeated across pages). Returns (id, n_chunks, n_removed,
    clean_text) with surviving chunks rejoined in document order.

    Scale shape: the chunking is a scan-stage array expression (no
    explode until the count); the frequency count groups on md5(chunk)
    (fixed 32-byte shuffle key instead of arbitrary-length text); only
    chunks that clear min_df come back (boilerplate is a tiny fraction
    of a 100 TB corpus — AQE turns the mark-join into a broadcast when
    it fits); the rebuild groups by doc id. Two shuffles + one
    boilerplate-sized join, the canonical CCNet layout.

    carry_cols: extra per-document columns to pass through to the
    output (first value per doc). Carrying them through beats joining
    the result back to the input when the input is itself an expensive
    subtree — a self-join would recompute it."""
    W = chunk_words
    # NULL text reads as empty (one '' chunk) — a plain posexplode of a
    # NULL array would silently drop the document from the output
    d = df.withColumn("_w", F.split(
        F.trim(F.coalesce(F.col(text_col).cast("string"), F.lit(""))),
        r"\s+"))
    chunks = F.expr(
        f"transform(sequence(0, int(ceil(size(_w)/{W}.0))-1), "
        f"i -> array_join(slice(_w, i*{W}+1, {W}), ' '))")
    ex = (d.withColumn("_chunks", chunks)
          .select(id_col, *carry_cols,
                  F.posexplode("_chunks").alias("_idx", "_chunk"))
          .withColumn("_ck", F.md5("_chunk")))
    boiler = (ex.groupBy("_ck")
              .agg(F.countDistinct(id_col).alias("_df"))
              .filter(F.col("_df") >= min_df)
              .select("_ck", F.lit(True).alias("_boiler")))
    marked = ex.join(boiler, "_ck", "left").withColumn(
        "_boiler", F.coalesce("_boiler", F.lit(False)))
    # array_sort on struct(idx, ...) orders by idx (unique per doc), so
    # the rebuild is a pure array pipeline after one collect_list
    rebuilt = (marked.groupBy(id_col).agg(
        *[F.first(c).alias(c) for c in carry_cols],
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.col("_boiler").cast("long")).alias("n_removed"),
        F.array_join(
            F.transform(
                F.filter(
                    F.array_sort(F.collect_list(
                        F.struct("_idx", "_boiler", "_chunk"))),
                    lambda x: ~x["_boiler"]),
                lambda x: x["_chunk"]),
            " ").alias("clean_text")))
    return rebuilt.withColumn("n_chunks", F.col("n_chunks").cast("int"))


def _rate_threshold(rate: float) -> str:
    """8-hex-digit md5-prefix threshold for a [0,1] keep rate. A rate
    >= 1.0 returns 'g' (lexicographically above every hex digit), so
    full domains keep everything without a 9-digit edge case."""
    if rate >= 1.0:
        return "g"
    return format(max(int(rate * 16 ** 8), 0), "08x")


def mix_sample(df: DataFrame, weights: dict[str, float], *,
               domain_col: str = "source", key_col: str = "doc_id",
               default_rate: float = 1.0) -> DataFrame:
    """Deterministic domain-mixture sampling: keep each row with its
    domain's target rate, decided by comparing the first 8 hex chars of
    md5(key || domain) against the rate's threshold. The standard way
    to hit a target source mixture (web 40% / code 30% / ...) on a
    100 TB corpus: reproducible (a pure function of the key — re-runs
    and backfills agree), requires no count pass, no shuffle, and no
    coordination — it is a scan-stage filter that composes with
    predicate pushdown. Domains absent from `weights` use default_rate.

    Engine-portable by construction: md5 is md5 everywhere, and the
    fixed-width hex compare is the same as the numeric one."""
    # NULL key/domain hash as '' (concat would null-propagate and the
    # NULL comparison would DROP the row even at rate 1.0); a NULL
    # domain never matches any weights entry, so it takes default_rate
    h = F.substring(
        F.md5(F.concat(F.coalesce(F.col(key_col).cast("string"), F.lit("")),
                       F.coalesce(F.col(domain_col).cast("string"),
                                  F.lit("")))), 1, 8)
    # ONE parsed CASE expression instead of a len(weights)-deep nested
    # F.when chain (the simhash() construction-cost class: a 100-domain
    # weights table built ~300 py4j round trips and a 100-deep Column
    # tree per call — r11). Domains are distinct equality arms, so CASE
    # arm order cannot change the result; quotes in names are escaped
    # by doubling (SQL string literal rules).
    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    arms = " ".join(
        f"WHEN {q(dom)} THEN {q(_rate_threshold(rate))}"
        for dom, rate in sorted(weights.items()))
    thr = F.expr(
        f"CASE `{domain_col}` {arms} "
        f"ELSE {q(_rate_threshold(default_rate))} END"
    ) if weights else F.lit(_rate_threshold(default_rate))
    return df.filter(h < thr)


def host_cap(df: DataFrame, *, cap: int, host_col: str = "host",
             id_col: str = "doc_id", priority_col: str | None = None,
             salt: int | None = None) -> DataFrame:
    """Per-host document cap — the crawl-balance stage (CCNet /
    RefinedWeb-style): bound any single registered domain's
    contribution to the corpus by keeping, per host, the `cap` docs
    with the SMALLEST priority value (ascending sort key — pass e.g.
    a negated quality score to keep best-first). Priority defaults to
    md5(id), i.e. exact deterministic hash-priority sampling: the kept
    subset is a pure function of the ids, so re-runs, backfills and a
    DuckDB oracle all agree with no RNG coordination across 1000
    executors — and unlike a rate filter (mix_sample) the cap is EXACT
    per host.

    Scale shape: a plain window over host is the classic skew cliff —
    one viral domain that owns 10% of a 100 TB crawl lands on one
    task. `salt=S` runs aggregate.top_k's exact two-phase form: phase
    1 ranks within (host, xxhash64(id)%S) — uniform partitions — and
    phase 2 finishes over at most S*cap survivors per host, so the
    result is identical and the hot host spreads over S tasks.

    Returns the kept rows with a `host_rank` column (1-based position
    in the host's priority order)."""
    pr = (F.col(priority_col) if priority_col
          else F.md5(F.col(id_col).cast("string")))
    from faxe_spark.operators.aggregate import top_k
    out = top_k(df.withColumn("_prio", pr), "_prio", cap, by=[host_col],
                bottom=True, tiebreak=id_col, salt=salt)
    return out.drop("_prio").withColumnRenamed("rank", "host_rank")


def host_cap_incremental(new_df: DataFrame, seen_rows: DataFrame | None, *,
                         cap: int, host_col: str = "host",
                         id_col: str = "doc_id", salt: int | None = None,
                         checkpoint: bool = True
                         ) -> tuple[DataFrame, DataFrame]:
    """Continuous-crawl per-host cap (the count-based member of the
    crawl-loop family): keep a new document iff fewer than `cap` docs
    of its host were kept before it — in an earlier batch (via
    `seen_rows`) or earlier in this batch (smaller id = crawl order).
    First-arrival wins, the rule a live crawl actually wants; the
    batch `host_cap` is the hash-priority variant for re-runnable
    offline balance.

    Returns (kept_docs, updated_seen). State rows are
    fingerprint = host || '|' || md5(id) — one per KEPT doc, so the
    state is bounded at `cap` rows per host FOREVER (the only family
    member whose state cannot grow with crawl age per key) and shares
    the exact loop's 1-column fingerprint-table contract:
    compact_seen_fps / compact_pending_fps apply unchanged. Hosts must
    not contain '|' (impossible for RFC hostnames).

    kept_docs carry `host_rank` = the doc's position in its host's
    overall kept order == its global arrival rank (kept docs are
    exactly the host's first `cap` arrivals)."""
    kept, new_rows = _host_cap_incr_core(
        new_df, seen_rows, cap=cap, host_col=host_col, id_col=id_col,
        salt=salt, checkpoint=checkpoint)
    updated = new_rows if seen_rows is None else seen_rows.union(new_rows)
    return kept, updated


def _host_cap_incr_core(new_df: DataFrame, seen_rows: DataFrame | None, *,
                        cap: int, host_col: str, id_col: str,
                        salt: int | None, checkpoint: bool
                        ) -> tuple[DataFrame, DataFrame]:
    """(kept_docs, NEW keep-tally rows) — the per-batch kernel for the
    streaming pipeline; new_rows is exactly this batch's delta."""
    from faxe_spark.operators.aggregate import top_k

    # NULL host ranks/counts/fingerprints as '' via an internal key:
    # a NULL would make the state fingerprint NULL (distinct collapses
    # kept docs -> prior under-counts) AND fall out of the prior
    # equi-join (cap never enforced) — the same silent-loss class the
    # exact loop's NULL-text coalesce fixed. The caller's host column
    # passes through untouched.
    hk = "_hk"
    new_df = new_df.withColumn(
        hk, F.coalesce(F.col(host_col).cast("string"), F.lit("")))
    if seen_rows is not None:
        # replay guard (review find): a RE-DELIVERED already-kept doc
        # must not be kept again — it would emit a duplicate state row
        # that compaction's distinct() later collapses, re-opening the
        # host's quota and duplicating a host_rank. Anti-join on the
        # doc's would-be fingerprint against the bounded state.
        refp = F.concat(F.col(hk), F.lit("|"),
                        F.md5(F.col(id_col).cast("string")))
        new_df = (new_df.withColumn("_refp", refp)
                  .join(seen_rows.withColumnRenamed("fingerprint",
                                                    "_refp"),
                        "_refp", "left_anti")
                  .drop("_refp"))
    prior = None
    if seen_rows is not None:
        # <= cap rows per host by construction, so this groupBy is a
        # bounded count over the (bucketed) state table. distinct
        # first (review find): unlike the anti-join families, a COUNT
        # is duplicate-sensitive — a crash between compaction's table
        # RENAME and clearing the pending dir leaves absorbed epochs
        # behind, and table ∪ leftover-pending would double-count every
        # kept doc, silently closing host quotas early.
        prior = (seen_rows.select("fingerprint").distinct()
                 .select(F.split_part(F.col("fingerprint"), F.lit("|"),
                                      F.lit(1)).alias(hk))
                 .groupBy(hk).agg(F.count(F.lit(1)).alias("_prior")))
    # in-batch arrival rank (id ascending): only ranks <= cap can
    # survive whatever the prior count is, so the salted two-phase
    # top-k bounds the per-host sort BEFORE the state join — a viral
    # host's batch rows spread over `salt` tasks
    ranked = top_k(new_df, id_col, cap, by=[hk], bottom=True,
                   salt=salt)
    if prior is None:
        kept = ranked.withColumn("_prior", F.lit(0))
    else:
        kept = (ranked.join(prior, hk, "left")
                .withColumn("_prior",
                            F.coalesce(F.col("_prior"), F.lit(0)))
                .filter(F.col("rank") + F.col("_prior") <= cap))
    # cast: rank is int, a joined count is long — epochs of a streaming
    # run must write ONE parquet type for host_rank
    kept = (kept.withColumn("host_rank",
                            (F.col("rank") + F.col("_prior")).cast("long"))
            .drop("rank", "_prior"))
    if checkpoint:
        # the kept subtree feeds both outputs; materialize once (lazily)
        # — same lineage contract as dedup_incremental
        kept = kept.localCheckpoint(eager=False)
    # distinct: a batch carrying the same (host, id) twice would emit
    # duplicate state rows (the count path above is duplicate-hardened,
    # but the state contract is one row per kept doc)
    new_rows = kept.select(
        F.concat(F.col(hk), F.lit("|"),
                 F.md5(F.col(id_col).cast("string")))
        .alias("fingerprint")).distinct()
    return kept.drop(hk), new_rows


def plan_mixture(df: DataFrame, targets: dict[str, float], *,
                 domain_col: str = "source", text_col: str = "text",
                 token_col: str | None = None,
                 total_budget: int | None = None) -> dict[str, float]:
    """Turn a TARGET mixture (domain -> share of the training budget)
    into per-domain keep RATES for mix_sample, from a one-pass token
    census of the corpus. rate_d = min(1, share_d * budget /
    tokens_d); budget defaults to the largest value every share can
    actually fill without upsampling (min over domains of
    tokens_d / share_d — the standard no-replacement mixture fit).

    Driver-side math is one row per domain (bounded — this is a
    config-sized dict, not data); the census itself is a single
    aggregation. Compose: mix_sample(df, plan_mixture(df, targets))."""
    tok = (F.col(token_col) if token_col
           else token_count(F.col(text_col))).cast("long")
    # coalesce: an all-NULL-token domain sums to NULL and would crash
    # the budget arithmetic below (pack_greedy guards the same case)
    census = {r[0]: r[1] for r in
              (df.groupBy(domain_col)
               .agg(F.coalesce(F.sum(tok), F.lit(0)).alias("_t"))
               .collect())}
    shares_nonempty = {d for d, t in census.items() if t > 0}
    shares = {d: s for d, s in targets.items()
              if d in shares_nonempty and s > 0}
    if not shares:
        return {}
    if total_budget is None:
        total_budget = int(min(census[d] / s for d, s in shares.items()))
    return {d: min(1.0, (s * total_budget) / max(census[d], 1))
            for d, s in shares.items()}


# ---------------------------------------------------------------------------
# DSIR importance resampling (Xie et al., "Data Selection for Language
# Models via Importance Resampling", NeurIPS 2023 — public method) and
# the deterministic global shuffle/shard writer: the two corpus-to-
# training-run steps after mixture fitting.
# ---------------------------------------------------------------------------


def _feature_bucket(feat, *, buckets: int, seed: str):
    """Hashed-feature bucket id in [0, buckets) — md5_prefix_long, the
    ONE md5-prefix device shared with hashed_token_weight and the
    shard layout (engine-portable: '0x'||hex parse on the DuckDB
    side), so the n-gram feature space matches the quality
    classifier's by construction."""
    from faxe_spark.operators.text import md5_prefix_long
    return md5_prefix_long(feat, seed) % buckets


def _doc_features(df: DataFrame, text_col: str):
    """(df+_w, feats expr): unigram + word-bigram feature array — the
    DSIR paper's feature space, identical to hashed_linear_score's.
    NULL text scores as empty text (one '' feature, n_features=1) —
    without the coalesce, words(NULL) NULL-poisons score_sum and
    F.size returns -1 (review find); the oracles coalesce the same
    way."""
    d = df.withColumn(
        "_w", words(F.coalesce(F.col(text_col), F.lit(""))))
    return d, F.concat(F.col("_w"), ngram_array(2))


def dsir_weights(raw_df: DataFrame, target_df: DataFrame, *,
                 text_col: str = "text", buckets: int = 256,
                 seed: str = "dsir", scale: int = 1_000_000) -> DataFrame:
    """Per-bucket DSIR importance weights: (bucket, lam) for ALL
    `buckets` ids, lam = round(scale * log-likelihood-ratio) of the
    hashed unigram+bigram bag-of-ngrams models with add-1 smoothing:

        lam_b = round(scale * (ln(t_b+1) - ln(T+B)
                               - ln(r_b+1) + ln(R+B)))

    (t/r = bucket counts in target/raw, T/R their totals, B=buckets).
    A document's importance weight log(p_target/p_raw) is then the SUM
    of lam over its features (dsir_score) — held as INTEGERS so the
    per-doc accumulation is order-free and engine-exact; only the B-row
    weight table ever touches ln().

    Scale shape: each corpus contributes one map-side-combined count
    aggregation whose shuffle volume is <= buckets rows per partition
    — the 100 TB pass is two scans (raw + target; the target is
    benchmark-sized in practice). When the target is a LABELED SUBSET
    of the raw corpus, use dsir_weights_flagged instead: one scan fits
    both models. The weight table itself is B rows."""

    def bucket_counts(df: DataFrame, alias: str) -> DataFrame:
        d, feats = _doc_features(df, text_col)
        return (d.select(F.explode(feats).alias("_f"))
                .select(_feature_bucket(F.col("_f"), buckets=buckets,
                                        seed=seed).alias("bucket"))
                .groupBy("bucket").agg(F.count(F.lit(1)).alias(alias)))

    rc = bucket_counts(raw_df, "_rc")
    tc = bucket_counts(target_df, "_tc")
    return _lam_table(raw_df.sparkSession, rc, tc, buckets=buckets,
                      scale=scale)


def dsir_weights_flagged(df: DataFrame, target_flag, *,
                         text_col: str = "text", buckets: int = 256,
                         seed: str = "dsir",
                         scale: int = 1_000_000) -> DataFrame:
    """dsir_weights for the labeled-subset case (target = the rows of
    `df` where the boolean `target_flag` column/expression holds, raw =
    ALL of df): both bucket-count models come out of ONE scan and ONE
    grouped aggregation — at 100 TB this halves the fit's corpus
    passes vs the two-DataFrame form. Row-for-row identical to
    dsir_weights(df, df.filter(target_flag)) (equivalence-pinned)."""
    flag = F.col(target_flag) if isinstance(target_flag, str) else target_flag
    d, feats = _doc_features(df, text_col)
    cnt = (d.select(F.explode(feats).alias("_f"),
                    F.coalesce(flag, F.lit(False)).alias("_t"))
           .select(_feature_bucket(F.col("_f"), buckets=buckets,
                                   seed=seed).alias("bucket"), "_t")
           .groupBy("bucket")
           .agg(F.count(F.lit(1)).alias("_rc"),
                F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("_tc")))
    spine = _bucket_spine(df.sparkSession, buckets)
    j = (spine.join(cnt, "bucket", "left")   # ONE agg, joined once
         .select("bucket",
                 F.coalesce("_rc", F.lit(0)).alias("_rc"),
                 F.coalesce("_tc", F.lit(0)).alias("_tc")))
    return _lam_tail(j, buckets=buckets, scale=scale)


def _bucket_spine(spark, buckets: int) -> DataFrame:
    return spark.range(buckets).select(F.col("id").alias("bucket"))


def _lam_table(spark, rc: DataFrame, tc: DataFrame, *, buckets: int,
               scale: int) -> DataFrame:
    """Two-corpus dsir_weights tail: spine-join the (bucket, _rc) /
    (bucket, _tc) count tables so every bucket has a row."""
    j = (_bucket_spine(spark, buckets)
         .join(rc, "bucket", "left").join(tc, "bucket", "left")
         .select("bucket",
                 F.coalesce("_rc", F.lit(0)).alias("_rc"),
                 F.coalesce("_tc", F.lit(0)).alias("_tc")))
    return _lam_tail(j, buckets=buckets, scale=scale)


def _lam_tail(j: DataFrame, *, buckets: int, scale: int) -> DataFrame:
    """Shared integer-lam formula over a complete (bucket, _rc, _tc)
    spine — one place, so the flagged and two-corpus fits cannot
    drift (the _sax_words_df consistency device).

    Totals via a GLOBAL window over the B-row spine, not
    crossJoin(j.agg(...)): the aggregate form self-references j, and
    Catalyst re-executes the whole count subtree (scan + explode +
    agg) for the totals branch — the _windows_z re-execution class,
    caught by the flagged fit's one-scan plan test. The single-task
    window is 256 rows, not a corpus."""
    wall = Window.partitionBy()
    j = (j.withColumn("_rr", F.sum("_rc").over(wall))
         .withColumn("_tt", F.sum("_tc").over(wall)))
    lam = F.round(
        F.lit(float(scale))
        * (F.log(F.col("_tc") + F.lit(1.0))
           - F.log(F.col("_tt") + F.lit(float(buckets)))
           - F.log(F.col("_rc") + F.lit(1.0))
           + F.log(F.col("_rr") + F.lit(float(buckets)))), 0)
    return j.select("bucket", lam.cast("bigint").alias("lam"))


def dsir_score(df: DataFrame, weights: dict[int, int], *,
               text_col: str = "text", buckets: int = 256,
               seed: str = "dsir", scale: int = 1_000_000) -> DataFrame:
    """Annotate every document with its DSIR importance:
    score_sum (integer sum of bucket weights over the doc's features),
    n_features, and score = score_sum / (scale * max(n_features, 1))
    — mean-pooled log-likelihood ratio, one final division like
    hashed_linear_score so the double is engine-reproducible.

    `weights` is the COLLECTED dsir_weights table ({bucket: lam},
    exactly `buckets` entries — bounded by contract, the broadcast-LUT
    pattern of the ANN query batches). It rides the plan as a literal
    map, so scoring is a pure scan-stage fold: zero shuffles, no
    Python — at 100 TB this annotates during the scan like the other
    text ops."""
    if set(weights) != set(range(buckets)):
        raise ValueError(
            f"weights must cover all {buckets} buckets exactly, got "
            f"{len(weights)} keys (pass dsir_weights(...).collect() "
            f"rows) — a missing bucket would NULL-poison score_sum")
    # ONE dense array literal, indexed by bucket, instead of
    # create_map over 2*buckets literal Columns: the map form costs
    # 2*buckets py4j round trips to BUILD and hands Catalyst a
    # 512-node literal tree to fold per feature lambda — measured
    # ~1.1 s of pure driver-side plan construction per call at
    # buckets=256 (and the crawl fold builds it once per epoch). The
    # keys are exactly range(buckets) (validated above), so
    # element_at(array, bucket+1) reads the identical lam value.
    arr = F.lit([int(weights[b]) for b in range(buckets)])
    d, feats = _doc_features(df, text_col)
    lam_sum = F.aggregate(
        F.transform(feats,
                    lambda f: F.element_at(
                        arr, (_feature_bucket(f, buckets=buckets,
                                              seed=seed) + 1).cast("int"))),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    from faxe_spark.operators.text import mean_pool_score
    return mean_pool_score(d, lam_sum, scale=scale).drop("_w")


def dsir_resample(raw_df: DataFrame, target_df: DataFrame | None = None,
                  *, k: int, target_flag=None, text_col: str = "text",
                  buckets: int = 256, seed: str = "dsir",
                  scale: int = 1_000_000, id_col: str = "doc_id",
                  salt: int | None = None) -> DataFrame:
    """DSIR selection: keep the k raw documents whose hashed-ngram
    importance weight (see dsir_weights) is highest — the paper's
    resampling step made deterministic (top-k by score with an id
    tiebreak) so re-runs, backfills and the DuckDB oracle agree. Pass
    `salt` at scale: an unsalted global top-k is a one-task sort.

    The target is EITHER a separate corpus (`target_df` — the paper's
    usual shape, e.g. Wikipedia) OR a labeled subset of raw
    (`target_flag`, a boolean column/expression — fit in one corpus
    scan via dsir_weights_flagged). Exactly one must be given.

    Returns the selected rows with score_sum / n_features / score /
    rank. The weight table is collected driver-side (`buckets` rows —
    bounded by contract) and re-enters the plan as a literal map, so
    the selection pass is scan + salted top-k: no join, no extra
    shuffle of the corpus."""
    from faxe_spark.operators.aggregate import top_k

    if (target_df is None) == (target_flag is None):
        raise ValueError("pass exactly one of target_df / target_flag")
    wdf = (dsir_weights_flagged(raw_df, target_flag, text_col=text_col,
                                buckets=buckets, seed=seed, scale=scale)
           if target_df is None
           else dsir_weights(raw_df, target_df, text_col=text_col,
                             buckets=buckets, seed=seed, scale=scale))
    w = {int(r["bucket"]): int(r["lam"]) for r in wdf.collect()}
    scored = dsir_score(raw_df, w, text_col=text_col, buckets=buckets,
                        seed=seed, scale=scale)
    scored = scored.withColumn("_tb", F.col(id_col).cast("string"))
    out = top_k(scored, "score", k, tiebreak="_tb", salt=salt)
    return out.drop("_tb")


def dsir_select_incremental(new_df: DataFrame, best: DataFrame | None, *,
                            weights: dict[int, int], k: int,
                            text_col: str = "text",
                            id_col: str = "doc_id", buckets: int = 256,
                            seed: str = "dsir", scale: int = 1_000_000,
                            salt: int | None = None,
                            checkpoint: bool = True) -> DataFrame:
    """Crawl-epoch DSIR selection under FROZEN weights — the
    crawl-loop-family member of dsir_resample: the weight table is fit
    ONCE (dsir_weights / dsir_weights_flagged, persisted via
    save_dsir_weights) and every arriving epoch is scored against it;
    the carried state is the current top-k ∪ this epoch's scores,
    re-ranked. Because ties break on the id, the fold equals the
    global top-k over everything seen — an epoch can arrive in any
    split and the selection is the same (pinned in tests and by the
    registry oracle, which states the global form directly).

    State = exactly k rows forever (id + the three score columns +
    tiebreak — no text carried), the selection analog of
    shard_append's n_shards-row bound. Returns the updated best
    (with rank recomputed); feed it back as `best` next epoch."""
    from faxe_spark.operators.aggregate import top_k

    scored = dsir_score(new_df, weights, text_col=text_col,
                        buckets=buckets, seed=seed, scale=scale)
    scored = (scored.select(id_col, "score_sum", "n_features", "score")
              .withColumn("_tb", F.col(id_col).cast("string")))
    # drop of a missing column is a no-op: "rank" rides a fed-back
    # batch result, "_absorbed_through" rides dsir_select_pipeline's
    # persisted best table (review find: the streaming table must be
    # feedable to the batch fold without a union-mismatch)
    pool = scored if best is None else \
        best.drop("rank", "_absorbed_through").unionByName(scored)
    out = top_k(pool, "score", k, tiebreak="_tb", salt=salt)
    if checkpoint:
        # the fold re-reads the carried best every epoch; without the
        # barrier epoch N's plan re-executes every prior epoch's scan
        out = out.localCheckpoint(eager=False)
    return out


def shard_assign(df: DataFrame, *, n_shards: int, id_col: str = "doc_id",
                 seed: str = "shuffle", keep_hash: bool = False) -> DataFrame:
    """Deterministic global shuffle: assign every row a `shard` in
    [0, n_shards) and a `shard_pos` (its position in the shard's
    shuffled order) — the final layout step before training reads the
    corpus. Both are pure functions of (id, seed): shard = md5-prefix
    hash of the id, order = the full md5 hex (a seeded pseudo-random
    permutation), so re-runs, resumed writes and a SQL oracle all
    agree with no RNG state to coordinate across 1000 executors, and a
    different `seed` yields an independent epoch-level reshuffle.

    Scale shape: ONE shuffle (hash-partition by shard) and a per-shard
    sort for the position — pick n_shards at or above the cluster's
    write parallelism (the 100 TB norm is thousands of shards), so
    "one task per shard" IS the writer's natural layout, not a cliff.
    `id_col` should be unique and non-null (the corpus primary key):
    duplicate ids — and all NULL ids, which hash as '' (review find:
    bare concat would NULL-propagate to a shard OUTSIDE [0, n_shards)
    and a __HIVE_DEFAULT_PARTITION__ dir no loader reads) — collide
    to one hash and make their relative order unspecified."""
    from faxe_spark.operators.text import hex_prefix_long

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    d = df.withColumn(
        "_h", F.md5(F.concat(
            F.coalesce(F.col(id_col).cast("string"), F.lit("")),
            F.lit(seed))))
    d = d.withColumn("shard", hex_prefix_long(F.col("_h"))
                     % F.lit(n_shards))
    w = Window.partitionBy("shard").orderBy(F.col("_h").asc(),
                                            F.col(id_col).asc())
    d = d.withColumn("shard_pos", F.row_number().over(w))
    return d if keep_hash else d.drop("_h")


def save_dsir_weights(spark, weights_df: DataFrame, *, name: str) -> None:
    """Persist a dsir_weights table (the AnnIndex/SaxIndex lifecycle
    applied to the DSIR fit): the expensive corpus pass runs ONCE; any
    later run — incremental crawl scoring, a backfill, a different
    selection k — loads the B-row table instead of re-fitting. The
    table is tiny (`buckets` rows); one file."""
    from faxe_spark.operators.ann_index import (_save_small_table,
                                                _table_path)

    # the fit job still runs (collect is the action); only the B-row
    # WRITE moves to the driver-side fast path — a distributed write
    # of 256 rows is a ~0.5 s scheduling tax (guide §5)
    import pyarrow as pa

    rows = weights_df.select("bucket", "lam").collect()
    t = pa.table({"bucket": pa.array([int(r["bucket"]) for r in rows],
                                     pa.int64()),
                  "lam": pa.array([int(r["lam"]) for r in rows],
                                  pa.int64())})
    if _save_small_table(spark, f"{name}_dsir", t):
        return
    (weights_df.repartition(1).write.mode("overwrite")
     .parquet(_table_path(spark, f"{name}_dsir")))


def load_dsir_weights(spark, *, name: str) -> dict[int, int]:
    """Rehydrate {bucket: lam} for dsir_score — the shape dsir_score
    takes, validated there against `buckets`."""
    from faxe_spark.operators.ann_index import (_read_small_table,
                                                _table_path)

    t = _read_small_table(spark, f"{name}_dsir")
    if t is not None:
        d = t.to_pydict()
        return {int(b): int(l) for b, l in zip(d["bucket"], d["lam"])}
    rows = spark.read.parquet(_table_path(spark, f"{name}_dsir")).collect()
    return {int(r["bucket"]): int(r["lam"]) for r in rows}


def drop_dsir_weights(spark, *, name: str) -> None:
    from faxe_spark.operators.ann_index import _drop

    _drop(spark, f"{name}_dsir")


def split_assign(df: DataFrame, splits: dict[str, float], *,
                 id_col: str = "doc_id", seed: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment: a `split` column whose
    value is drawn from `splits` ({name: fraction}). Fractions must
    sum to <= 1; when they sum to 1 every row is assigned, when they
    sum to less the remainder gets split = NULL (a subsampling split —
    each name receives exactly its fraction, nothing is silently
    inflated). Pure function of (id, seed) via the md5-prefix device —
    scan-stage (no shuffle, composes with pushdown), re-runs and
    backfills agree, and membership is stable under corpus growth: a
    doc's split never depends on which other docs exist (the property
    a rate-based sampler has and a count-based splitter lacks).

    `id_col` should be unique and non-null (the corpus primary key):
    NULL ids hash as '' (same NULL-as-'' device as shard_assign, so
    they can't NULL-propagate the split to a surprise value) — which
    means ALL NULL-id rows land in ONE split, colliding with a genuine
    empty-string id; a corpus with many NULL ids silently skews the
    split fractions (ADVICE r8)."""
    from faxe_spark.operators.text import md5_prefix_long

    if not splits or any(v < 0 for v in splits.values()):
        raise ValueError("splits must be non-empty, fractions >= 0")
    total = sum(splits.values())
    if total > 1.0 + 1e-9:
        raise ValueError("split fractions must sum to <= 1")
    u = md5_prefix_long(
        F.coalesce(F.col(id_col).cast("string"), F.lit("")), seed)
    names = list(splits)
    expr, acc = None, 0.0
    # the last named split takes `otherwise` when the fractions cover
    # the whole unit interval, so a float-rounded top edge can't leak
    # a sliver of rows into NULL
    exact = total >= 1.0 - 1e-9
    tail_names = names[:-1] if exact else names
    for nm in tail_names:
        acc += splits[nm]
        edge = F.lit(int(acc * (1 << 32)))
        br = F.when(u < edge, F.lit(nm))
        expr = br if expr is None else expr.when(u < edge, F.lit(nm))
    if exact:
        last = F.lit(names[-1])
        out = last if expr is None else expr.otherwise(last)
    else:
        out = expr.otherwise(F.lit(None).cast("string"))
    return df.withColumn("split", out)


def _sharded_frame(df: DataFrame, *, n_shards: int, id_col: str,
                   seed: str) -> DataFrame:
    """The exact frame write_shards persists (assignment + in-partition
    shuffle-order sort, hash column still attached) — factored out so
    the single-shuffle plan test inspects what the writer actually
    executes, not a hand-rebuilt lookalike (review find)."""
    a = shard_assign(df, n_shards=n_shards, id_col=id_col, seed=seed,
                     keep_hash=True)
    return a.sortWithinPartitions("shard", "_h", id_col)


def write_shards(df: DataFrame, path: str, *, n_shards: int,
                 id_col: str = "doc_id", seed: str = "shuffle") -> None:
    """Materialize the deterministic global shuffle as parquet
    partitioned by shard, rows inside each file in shuffle order —
    the layout a training loader streams sequentially. Single shuffle:
    the shard_pos window already hash-partitions by shard, and the
    sort + partitionBy writer run on that partitioning (plan-tested
    on _sharded_frame, the frame written here)."""
    (_sharded_frame(df, n_shards=n_shards, id_col=id_col, seed=seed)
     .drop("_h")
     .write.mode("overwrite").partitionBy("shard").parquet(path))


def shard_append(new_df: DataFrame, shard_counts: DataFrame | None, *,
                 n_shards: int, id_col: str = "doc_id",
                 seed: str = "shuffle", checkpoint: bool = True
                 ) -> tuple[DataFrame, DataFrame]:
    """Append-stable shard layout for a growing crawl — the
    crawl-loop-family member of shard_assign: new docs get the SAME
    deterministic shard (md5-prefix hash of the id) but their
    shard_pos APPENDS after everything already written — prior count
    for the shard + the doc's rank among THIS batch's docs in the
    shard (ordered by the full md5 hex, the same intra-shard shuffle
    order shard_assign uses).

    Why not re-run shard_assign over the union: its shard_pos is a
    rank in the GLOBAL md5 order, so every crawl epoch would renumber
    (and therefore rewrite) every existing shard file. Here existing
    rows' positions never change — a resumed training reader keeps
    stable offsets and an epoch append writes only the new tail of
    each shard. The trade is explicit: the concatenated order is
    md5-shuffled WITHIN each epoch but epoch-ordered ACROSS epochs
    (newest data last), which is what an append-only layout means.

    Returns (appended_docs, updated_counts). State = `updated_counts`
    — exactly n_shards (shard, _cnt) rows FOREVER (bounded by
    construction, the smallest state in the family); feed it back as
    `shard_counts` on the next batch. Same NULL-id hazard as
    shard_assign: NULL ids hash as '' and collide deterministically.
    Streaming form: streaming.stateful.shard_append_pipeline (epoch =
    micro-batch; per-shard count rows ride the same pending-dir loop,
    compacted by SUM via compact_pending_counts)."""
    appended, delta = _shard_append_core(
        new_df, shard_counts, n_shards=n_shards, id_col=id_col,
        seed=seed, checkpoint=checkpoint)
    if shard_counts is None:
        updated = delta
    else:
        # select: the compacted table carries _absorbed_through
        # (review find: the streaming loop's state table must be
        # feedable to the batch fold without a union-mismatch);
        # _shard_append_core's groupBy-sum side tolerates it already
        updated = (shard_counts.select("shard", "_cnt")
                   .unionByName(delta)
                   .groupBy("shard").agg(F.sum("_cnt").alias("_cnt")))
        if checkpoint:
            # the counts are the value carried FOREVER: without a
            # barrier each epoch nests another union+groupBy layer and
            # a long crawl's plan depth grows O(epochs) (review find —
            # the n_shards-row materialization is the cheapest in the
            # family)
            updated = updated.localCheckpoint(eager=False)
    return appended, updated


def _shard_append_core(new_df: DataFrame, seen_counts: DataFrame | None, *,
                       n_shards: int, id_col: str, seed: str,
                       checkpoint: bool) -> tuple[DataFrame, DataFrame]:
    """(appended_docs, THIS batch's per-shard count delta) — the
    per-epoch kernel for the streaming pipeline. `seen_counts` may
    carry several rows per shard (compacted table ∪ earlier pending
    epochs, the _seen_state union shape): they are summed here, so
    the caller never pre-aggregates."""
    a = shard_assign(new_df, n_shards=n_shards, id_col=id_col, seed=seed)
    if seen_counts is None:
        a = a.withColumn("_base", F.lit(0).cast("long"))
    else:
        # n_shards rows per epoch: tiny, always broadcastable
        base = seen_counts.groupBy("shard").agg(
            F.sum("_cnt").alias("_cnt"))
        a = (a.join(F.broadcast(base), "shard", "left")
             .withColumn("_base", F.coalesce(F.col("_cnt"), F.lit(0)))
             .drop("_cnt"))
    appended = (a.withColumn(
        "shard_pos", (F.col("_base") + F.col("shard_pos")).cast("long"))
        .drop("_base"))
    if checkpoint:
        # both outputs read the assignment subtree; materialize once
        # (lazily) — the family's lineage contract, and without it the
        # per-epoch fold re-executes every prior epoch's assignment
        appended = appended.localCheckpoint(eager=False)
    delta = (appended.groupBy("shard")
             .agg(F.count(F.lit(1)).cast("long").alias("_cnt")))
    return appended, delta


def pack_stats(packed: DataFrame, *, budget: int,
               by: str = "source") -> DataFrame:
    """Shard-level packing efficiency: packs, tokens, fill ratio."""
    per_pack = (packed.groupBy(by, "pack_id")
                .agg(F.sum("n_tokens").alias("pack_tokens")))
    return (per_pack.groupBy(by)
            .agg(F.count("*").alias("n_packs"),
                 F.sum("pack_tokens").alias("total_tokens"),
                 (F.sum("pack_tokens")
                  / (F.count("*") * budget)).alias("fill_ratio")))
