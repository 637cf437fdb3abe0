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
    parts = ", ' ', ".join(f"element_at(_toks, i+{j})" for j in range(n))
    out = df.select(id_col, toks.alias("_toks"))
    out = out.select(
        id_col,
        F.explode(F.expr(
            f"transform(sequence(1, greatest(size(_toks)-{n - 1}, 0)), i -> concat({parts}))"
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


def minhash_signatures(df: DataFrame, id_col: str, text_col: str, *,
                       num_hashes: int = 16, shingle_n: int = 3) -> DataFrame:
    """Wide minhash signature: one row per doc with columns mh0..mh{k-1},
    where mh_i = min over shingles of md5(i || ':' || shingle)
    (lexicographic min of uniform hex = uniform min).

    Layout: k min-aggregates over the exploded shingle rows — partial
    (map-side) mins mean the shuffle carries only docs x k values, never
    the (doc, seed) cross product. At 100 TB this is the difference
    between shuffling per-shingle rows and shuffling signatures."""
    sh = shingle_rows(df, id_col, text_col, n=shingle_n, distinct=False)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_candidates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", *,
                           num_hashes: int = 16, bands: int = 4,
                           shingle_n: int = 3) -> DataFrame:
    """LSH candidate pairs: band the signature (rows_per_band =
    num_hashes/bands), hash each band, self-join band buckets.

    Returns (id_a, id_b, n_shared_bands) with id_a < id_b. At scale the
    band self-join is an equi-join on (band, band_hash) — broadcast-free,
    AQE-skew-splittable; hot buckets (boilerplate docs) are the known
    hotspot and get handled by AQE skew-join or a bucket-size cap."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes=num_hashes, shingle_n=shingle_n)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws(",", *[
                F.col(f"mh{i}") for i in range(b * rows_per_band, (b + 1) * rows_per_band)
            ])).alias("band_hash"),
        )
        for b in range(bands)
    ]
    band_sig = sig.select(
        id_col, F.explode(F.array(*band_structs)).alias("_b")
    ).select(id_col, "_b.band", "_b.band_hash")
    # bucket self-join on (band, band_hash). The signature subtree feeds
    # both sides of the join; Spark's ReusedExchange computes it once
    # (verified in the physical plan — a measured bucket-grouped
    # collect_list + combinations formulation was ~10% slower than this
    # join). Giant buckets (boilerplate collisions) are the known
    # hotspot: AQE skew-join splits them, and at 100 TB cap bucket size
    # upstream (a bucket with >~10k members is boilerplate, not
    # near-dups worth pairing).
    a = band_sig.select(F.col(id_col).alias("id_a"), "band", "band_hash")
    b = band_sig.select(F.col(id_col).alias("id_b"), "band", "band_hash")
    pairs = (a.join(b, ["band", "band_hash"])
             .filter(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b")
             .agg(F.count(F.lit(1)).alias("n_shared_bands")))
    return pairs


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", *,
                        shingle_n: int = 3, threshold: float = 0.2,
                        max_shingle_freq: int | None = None) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs >= threshold, prefix-filtered.

    Same output as the naive inverted-index self-join (J = |A∩B| /
    (|A|+|B|-|A∩B|) over distinct shingles), but the join only touches
    each doc's PREFIX under a global rarest-first shingle order: for
    J(A,B) >= t the intersection has >= ceil(t*|A|) elements, so some
    common shingle must sit in the first |A| - ceil(t*|A|) + 1 of A (and
    likewise B) — the prefix-filtering lemma of parallel set-similarity
    joins (Vernica/Carey/Li, SIGMOD'10; PPJoin). At t=0.9 the joined
    volume drops ~10x per side (~100x fewer candidate pairs); measured
    122s -> ~3s on the near-dup-heavy sf0.1 corpus. Exact intersections
    are then array_intersect over the candidates only.

    `max_shingle_freq` additionally drops ubiquitous shingles
    (boilerplate) before everything — that DOES change semantics and is
    off by default."""
    sh = shingle_rows(df, id_col, text_col, n=shingle_n)
    if max_shingle_freq is not None:
        freq_cap = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_f"))
        sh = sh.join(F.broadcast(freq_cap.filter(F.col("_f") <= max_shingle_freq)
                                 .select("shingle")), "shingle")
    # global total order: (frequency asc, shingle asc) — rarest first,
    # deterministic tie-break. freq is (vocab)-sized; Catalyst/AQE picks
    # broadcast vs shuffle join from its size.
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_gf"))
    ordered = sh.join(freq, "shingle")
    docs = (ordered.groupBy(id_col)
            .agg(F.array_sort(F.collect_list(F.struct("_gf", "shingle"))).alias("_fs"))
            .select(id_col,
                    F.expr("transform(_fs, x -> x.shingle)").alias("shingles"),
                    F.size("_fs").alias("n")))
    prefix_len = (F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1).cast("int")
    pref = docs.select(id_col, "n", "shingles",
                       F.explode(F.slice("shingles", F.lit(1), prefix_len)).alias("_p"))
    a = pref.select(F.col(id_col).alias("id_a"), "_p")
    b = pref.select(F.col(id_col).alias("id_b"), "_p")
    cand = (a.join(b, "_p")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())
    da = docs.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("_sa"),
                     F.col("n").alias("na"))
    db = docs.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("_sb"),
                     F.col("n").alias("nb"))
    j = (cand.join(da, "id_a").join(db, "id_b")
         .withColumn("inter", F.size(F.array_intersect("_sa", "_sb")))
         .withColumn("jaccard",
                     F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))))
    return j.filter(F.col("jaccard") >= threshold).drop("_sa", "_sb", "na", "nb")


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", *,
            bits: int = 32, shingle_n: int = 3) -> DataFrame:
    """Per-doc simhash signature: 32-bit md5-derived hash per shingle,
    per-bit majority vote, reassembled to one BIGINT.

    Pipeline: shingle rows -> per-shingle int hash -> explode bit index
    (literal 0..31 array) -> groupBy(doc, bit) vote -> groupBy(doc)
    reassemble. Two aggregations, zero joins."""
    sh = shingle_rows(df, id_col, text_col, n=shingle_n)
    h = F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("long")
    hashed = sh.select(id_col, h.alias("h"))
    bit_idx = F.explode(F.array(*[F.lit(i) for i in range(bits)])).alias("bit")
    # column-valued shift counts need the SQL operator form
    votes = (hashed.select(id_col, "h", bit_idx)
             .withColumn("vote", F.when(F.expr("(h >> bit) % 2") == 1, F.lit(1))
                         .otherwise(F.lit(-1))))
    bit_votes = votes.groupBy(id_col, "bit").agg(F.sum("vote").alias("v"))
    signature = bit_votes.groupBy(id_col).agg(
        F.sum(F.when(F.col("v") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)"))
              .otherwise(F.lit(0))).alias("simhash"))
    return signature
