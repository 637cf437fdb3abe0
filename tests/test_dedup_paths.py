"""ngram_jaccard_pairs picks its physical strategy adaptively (dense
64-bit mask / dense array<bigint> bitmap / sparse prefix-filtered
inverted index). All three must be output-equivalent — the strategy is
a physical choice, never a semantic one."""

from __future__ import annotations

import pyspark.sql.functions as F

from faxe_spark.operators import dedup
from faxe_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r.id_a, r.id_b, r.inter, round(r.jaccard, 12))
        for r in df.collect()
    )


def _pairs(spark, **kw):
    d = load_table(spark, SF, "documents")
    return dedup.ngram_jaccard_pairs(d, id_col="doc_id", text_col="text", **kw)


def test_dense_scalar_vs_sparse(spark):
    # unigrams: vocab <= 64 -> scalar-mask lane; dense_universe_max=0
    # forces the sparse lane on the same input.
    dense = _rows(_pairs(spark, shingle_n=1, threshold=0.9))
    sparse = _rows(_pairs(spark, shingle_n=1, threshold=0.9, dense_universe_max=0))
    assert dense and dense == sparse


def test_dense_multiword_vs_sparse(spark):
    # bigrams: vocab in (64, 4096] -> array<bigint> bitmap lane.
    d = load_table(spark, SF, "documents")
    vocab = dedup.shingle_rows(d, "doc_id", "text", n=2).select("shingle").distinct().count()
    assert 64 < vocab <= 4096, f"fixture drifted: bigram vocab={vocab}"
    dense = _rows(_pairs(spark, shingle_n=2, threshold=0.5))
    sparse = _rows(_pairs(spark, shingle_n=2, threshold=0.5, dense_universe_max=0))
    assert dense and dense == sparse


def test_threshold_zero_keeps_sharing_pairs_only(spark):
    # oracle semantics: a pair appears iff it shares >= 1 shingle, even
    # at threshold 0 (inner inverted-index join, never a cross product).
    out = _pairs(spark, shingle_n=1, threshold=0.0)
    assert out.filter("inter < 1").count() == 0


def test_connected_components_vs_python_reference(spark):
    """Label propagation must match a driver-side union-find on the
    real sf0.001 near-dup pair list."""
    from faxe_spark.operators.dedup import connected_components

    pairs = _pairs(spark, shingle_n=1, threshold=0.9).select("id_a", "id_b")
    got = {(r.node, r.component)
           for r in connected_components(pairs).collect()}

    # reference union-find
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    edges = [(r.id_a, r.id_b) for r in pairs.collect()]
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonicalize: min node per root
    members = {}
    for n in parent:
        members.setdefault(find(n), set()).add(n)
    want = {(n, min(ms)) for root, ms in members.items() for n in ms}
    assert got == want


def test_connected_components_lane_equivalence(spark):
    """The driver union-find lane (default for bounded edge lists) and
    the distributed hash-min lane (driver_threshold=0 forces it) must
    label identically — same node set, same min-id components."""
    from faxe_spark.operators.dedup import connected_components

    pairs = _pairs(spark, shingle_n=1, threshold=0.9).select("id_a", "id_b")
    small = {(r.node, r.component)
             for r in connected_components(pairs).collect()}
    dist = {(r.node, r.component)
            for r in connected_components(
                pairs, driver_threshold=0, direct_collect_max=0).collect()}
    # direct_collect_max=0 with a nonzero driver_threshold forces the
    # pre-contracted lane (per-partition union-find + root-graph)
    contracted = {(r.node, r.component)
                  for r in connected_components(
                      pairs, direct_collect_max=0).collect()}
    assert small and small == dist == contracted


def test_connected_components_string_ids_all_lanes(spark):
    """Object-dtype (string) node ids through every lane — the r4
    advice case: the dense-rank path must work in the per-partition
    kernel and the root-graph solve, not just the direct collect."""
    from faxe_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("m", "m2"), ("m2", "a")],
        "id_a string, id_b string").repartition(4)
    want = {("a", "a"), ("b", "a"), ("c", "a"), ("m", "a"), ("m2", "a"),
            ("x", "x"), ("y", "x")}
    for kw in ({}, {"direct_collect_max": 0},
               {"direct_collect_max": 0, "driver_threshold": 0}):
        got = {(r.node, r.component)
               for r in connected_components(pairs, **kw).collect()}
        assert got == want, kw


def test_dedup_keep_canonical_removes_cluster_tails(spark):
    from faxe_spark.operators.dedup import dedup_keep_canonical
    from faxe_spark.tables import load_table

    d = load_table(spark, SF, "documents")
    pairs = _pairs(spark, shingle_n=1, threshold=0.9).select("id_a", "id_b")
    kept = dedup_keep_canonical(d, pairs, id_col="doc_id")
    n_docs = d.count()
    n_dropped = (pairs.select("id_a").union(pairs.select("id_b")).distinct().count()
                 - pairs.select(F.least("id_a", "id_b")).distinct().count())
    assert kept.count() < n_docs
    # every pair has at most one survivor
    k = kept.select("doc_id")
    surviving_pairs = (pairs.join(k.withColumnRenamed("doc_id", "id_a"), "id_a")
                       .join(k.withColumnRenamed("doc_id", "id_b"), "id_b"))
    assert surviving_pairs.count() == 0


def test_minhash_bucket_cap_infinite_is_identity(spark):
    """cap=huge must be pair-for-pair identical to no cap; a small cap
    must only ever REMOVE pairs (graceful recall degradation)."""
    d = load_table(spark, SF, "documents")
    base = sorted((r.id_a, r.id_b, r.n_shared_bands) for r in
                  dedup.minhash_lsh_candidates(d, "doc_id", "text").collect())
    capped_inf = sorted((r.id_a, r.id_b, r.n_shared_bands) for r in
                        dedup.minhash_lsh_candidates(
                            d, "doc_id", "text", max_bucket_size=10**9).collect())
    assert base == capped_inf
    capped = set((r.id_a, r.id_b) for r in
                 dedup.minhash_lsh_candidates(
                     d, "doc_id", "text", max_bucket_size=5).collect())
    assert capped <= set((a, b) for a, b, _ in base)
    # cap=1 removes every bucket that could produce a pair
    assert dedup.minhash_lsh_candidates(
        d, "doc_id", "text", max_bucket_size=1).count() == 0


def test_minhash_lsh_pairs_match_bruteforce(spark):
    """The sig-banded formulation (distinct signatures -> bucket join ->
    output-sized expansion) must be pair-for-pair identical to the
    direct doc-level banding computed in Python, cap or no cap."""
    d = load_table(spark, SF, "documents")
    num_hashes, bands, rpb = 16, 4, 4
    sigs = {r[0]: tuple(r[1:]) for r in
            dedup.minhash_signatures(d, "doc_id", "text",
                                     num_hashes=num_hashes, shingle_n=3)
            .collect()}
    for cap in (None, 5):
        buckets = {}
        for doc, sig in sigs.items():
            for b in range(bands):
                key = (b, sig[b * rpb:(b + 1) * rpb])
                buckets.setdefault(key, []).append(doc)
        want = {}
        for key, members in buckets.items():
            if cap is not None and len(members) > cap:
                continue
            members = sorted(members)
            for i, x in enumerate(members):
                for y in members[i + 1:]:
                    want[(x, y)] = want.get((x, y), 0) + 1
        got = {(r.id_a, r.id_b): r.n_shared_bands for r in
               dedup.minhash_lsh_candidates(
                   d, "doc_id", "text", num_hashes=num_hashes, bands=bands,
                   shingle_n=3, max_bucket_size=cap).collect()}
        assert got == want, f"cap={cap}: {len(got)} vs {len(want)} pairs"


def test_simhash_pairs_match_bruteforce(spark):
    """Band-bucketed pairing is EXACT at hamming<=h with h+1 bands
    (pigeonhole) — verify against the all-pairs computation."""
    d = load_table(spark, SF, "documents")
    sigs = {r.doc_id: r.simhash for r in
            dedup.simhash(d, shingle_n=1).collect()}
    want = set()
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin(sigs[a] ^ sigs[b]).count("1") <= 3:
                want.add((a, b))
    got = {(r.id_a, r.id_b): r.hamming for r in
           dedup.simhash_pairs(d, shingle_n=1, hamming_max=3).collect()}
    assert set(got) == want
    for (a, b), h in got.items():
        assert h == bin(sigs[a] ^ sigs[b]).count("1")


def test_dense_numpy_kernel_vs_sparse(spark, monkeypatch):
    """The blocked numpy popcount kernel (>64-vocab lane past the
    pair-ops crossover) is output-equivalent to the sparse reference;
    forced on by zeroing the crossover."""
    monkeypatch.setattr(dedup, "_GEMM_CROSSOVER", 0)
    numpy_lane = _rows(_pairs(spark, shingle_n=2, threshold=0.5))
    monkeypatch.setattr(dedup, "_GEMM_CROSSOVER", 1 << 60)
    fold_lane = _rows(_pairs(spark, shingle_n=2, threshold=0.5))
    sparse = _rows(_pairs(spark, shingle_n=2, threshold=0.5,
                          dense_universe_max=0))
    assert numpy_lane and numpy_lane == sparse == fold_lane


def test_dedup_incremental_across_batches(spark):
    """Continuous-crawl shape: batch-internal dups keep the min id,
    cross-batch replays are dropped via the seen-fingerprint set, and
    the set accumulates."""
    from faxe_spark.operators.dedup import dedup_incremental

    b1 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "ALPHA   beta"), (3, "gamma")],
        "doc_id long, text string")
    fresh1, seen1 = dedup_incremental(b1, None)
    ids1 = {r.doc_id for r in fresh1.collect()}
    assert ids1 == {1, 3}                     # 2 is a normalized dup of 1
    assert seen1.count() == 2

    b2 = spark.createDataFrame(
        [(4, "alpha beta"), (5, "delta"), (6, "delta again"),
         (7, "delta")],
        "doc_id long, text string")
    fresh2, seen2 = dedup_incremental(b2, seen1)
    ids2 = {r.doc_id for r in fresh2.collect()}
    assert ids2 == {5, 6}                     # 4 replays b1; 7 dups 5
    assert seen2.count() == 4
    # a third batch against the accumulated set
    b3 = spark.createDataFrame([(8, "delta again"), (9, "new")],
                               "doc_id long, text string")
    fresh3, _ = dedup_incremental(b3, seen2)
    assert {r.doc_id for r in fresh3.collect()} == {9}


def test_dedup_incremental_null_text_and_column_preservation(spark):
    """Review r4: NULL-text docs fingerprint as the empty doc (kept,
    deduped together) instead of vanishing through a NULL equi-join;
    a caller's own 'fingerprint' column passes through untouched."""
    from faxe_spark.operators.dedup import dedup_incremental

    b = spark.createDataFrame(
        [(1, None, "keepme1"), (2, "alpha", "keepme2"), (3, None, "k3")],
        "doc_id long, text string, fingerprint string")
    fresh, seen = dedup_incremental(b, None)
    rows = {r.doc_id: r for r in fresh.collect()}
    assert set(rows) == {1, 2}                 # 3 dedups against 1 (NULL==NULL)
    assert rows[1].fingerprint == "keepme1"    # caller column preserved
    assert seen.count() == 2


def test_shingle_rows_short_docs_yield_no_rows(spark):
    """Advice r4: sequence(1, 0) DESCENDS in Spark, so a doc shorter
    than the shingle width used to crash with
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT. Short docs must simply emit
    zero shingles (matching the DuckDB oracle, where the range is
    empty) — and the minhash/jaccard paths built on shingle_rows must
    survive their presence."""
    d = spark.createDataFrame(
        [(1, "one"), (2, "two words"), (3, "three whole words"),
         (4, ""), (5, None)],
        "doc_id long, text string")
    sh = dedup.shingle_rows(d, "doc_id", "text", n=3)
    got = {(r.doc_id, r.shingle) for r in sh.collect()}
    assert got == {(3, "three whole words")}
    # end-to-end through the crash-prone consumers
    sigs = dedup.minhash_signatures(d, "doc_id", "text", num_hashes=4,
                                    shingle_n=3)
    assert sigs.count() == 1
    pairs = dedup.ngram_jaccard_pairs(d, id_col="doc_id", text_col="text",
                                      shingle_n=3, threshold=0.1)
    assert pairs.count() == 0


def test_compact_seen_fps_bounds_plan_and_exchanges(spark):
    """Brief r5 item 4: a continuous-crawl loop that compacts the seen
    set every round must have (a) a batch plan whose size does NOT grow
    with the number of prior batches, and (b) an anti-join that never
    exchanges the seen side (it is bucketed on the fingerprint)."""
    import re

    from faxe_spark.operators.dedup import compact_seen_fps, dedup_incremental
    from faxe_spark.plans import count_exchanges, formatted_plan

    def batch(i):
        return spark.createDataFrame(
            [(i * 10 + j, f"doc {i} {j}") for j in range(5)]
            + [(i * 10 + 9, "replayed every batch")],
            "doc_id long, text string")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # bucket count must equal the shuffle-partition count: the groupBy
    # side arrives hashpartitioned(_fp, shuffle.partitions) and a
    # mismatched bucket count would force a SECOND exchange to realign
    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    seen = None
    plan_sizes, fresh_counts = [], []
    try:
        for i in range(5):
            fresh, seen = dedup_incremental(batch(i), seen)
            if i >= 1:
                # probe the SAME batch without the lineage checkpoint
                # (which hides the join behind a Scan ExistingRDD): the
                # seen side is the bucketed table, so the whole batch
                # plan carries exactly ONE exchange (the groupBy /
                # map-side combine on the new batch) and none above the
                # seen-side scan — and its size is round-independent
                probe, _ = dedup_incremental(batch(i), seen_tbl,
                                             checkpoint=False)
                assert count_exchanges(probe) == 1, formatted_plan(probe)
                # node COUNT, not char length (expression ids widen)
                plan_sizes.append(len(re.findall(r"^\(\d+\)",
                                                 formatted_plan(probe),
                                                 re.M)))
            fresh_counts.append(fresh.count())
            # SAME table name every round: compact_seen_fps stages and
            # renames internally (Spark refuses a direct overwrite of
            # a table the input plan reads — round-5 review find)
            seen_tbl = compact_seen_fps(seen, "t_seen_fps",
                                        buckets=n_buckets)
            seen = seen_tbl
        # semantic check: the replay row survives only in batch 0
        assert fresh_counts == [6, 5, 5, 5, 5]
        # batch 1 onward all read one compacted table: constant depth
        assert len(set(plan_sizes)) == 1, plan_sizes
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        for t in ("t_seen_fps", "t_seen_fps__stage"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_dense_numpy_component_decomposition_equivalence(spark, monkeypatch):
    """Round 5: at serious pair volumes the dense-numpy kernel labels
    docs by vocabulary-connected component and probes only the
    component slice. Forcing the decomposition on a corpus of two
    disjoint vocabularies must give pair-identical output to the
    undecomposed kernel and the sparse lane — and produce no
    cross-group pair."""
    monkeypatch.setattr(dedup, "_GEMM_CROSSOVER", 0)

    rows = []
    for g, words in enumerate((list("abcdefghijklmnopqrstuvwxyz")[:20],
                               [f"w{i}" for i in range(60)])):
        for d in range(40):
            rows.append((g * 1000 + d,
                         " ".join(words[(d + j) % len(words)]
                                  for j in range(12))))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def pairs(**kw):
        return sorted(
            (r.id_a, r.id_b, r.inter, round(r.jaccard, 12)) for r in
            dedup.ngram_jaccard_pairs(df, id_col="doc_id", text_col="text",
                                      shingle_n=1, threshold=0.3,
                                      **kw).collect())

    monkeypatch.setattr(dedup, "_DECOMPOSE_MIN_OPS", 10 ** 18)
    plain = pairs()
    monkeypatch.setattr(dedup, "_DECOMPOSE_MIN_OPS", 0)
    decomposed = pairs()
    sparse = pairs(dense_universe_max=0)
    assert plain and plain == decomposed == sparse
    assert all((a < 1000) == (b < 1000) for a, b, _, _ in plain)


def test_distributed_cc_no_false_convergence(spark):
    """Round-5 review find: a multiset-signature convergence probe
    (sum/xor of label hashes) collides when an even number of nodes
    make identical transitions in one round — on this graph, round-1
    labels {1,1,2,2,3,3} and round-2 labels {1,1,1,1,2,2} share any
    order-independent signature, so a signature probe stops with nodes
    5,6 mislabeled. The probe must be an exact changed-label check."""
    from faxe_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (2, 4), (3, 5), (4, 5), (3, 6), (4, 6)],
        "id_a long, id_b long")
    got = {(r.node, r.component)
           for r in connected_components(
               pairs, driver_threshold=0, direct_collect_max=0).collect()}
    assert got == {(n, 1) for n in range(1, 7)}


def test_connected_components_mixed_width_ids(spark):
    """Round-5 review find: int id_a with bigint id_b values beyond
    2^31 must coerce to the union type, not truncate through an int
    labels schema."""
    import pyspark.sql.functions as F

    from faxe_spark.operators.dedup import connected_components

    big = 2 ** 40
    pairs = spark.createDataFrame([(1, big), (2, big + 1), (1, 2)],
                                  "id_a int, id_b long")
    for kw in ({}, {"direct_collect_max": 0},
               {"direct_collect_max": 0, "driver_threshold": 0}):
        got = {(r.node, r.component)
               for r in connected_components(pairs, **kw).collect()}
        assert got == {(1, 1), (2, 1), (big, 1), (big + 1, 1)}, kw


def test_minhash_incremental_chain_and_empty_docs(spark):
    """Greedy first-arrival LSH semantics: a chain A ~ B ~ C collapses
    to A without transitive closure (B's buckets enter the seen set
    even though B was dropped, so C's collision with B suffices);
    docs with no shingles (empty/NULL text) always pass and add no
    buckets."""
    from faxe_spark.operators.dedup import dedup_minhash_incremental

    long = ("the quick brown fox jumps over the lazy dog "
            "again and again tonight")
    chain_b = long.replace("fox", "cat")
    chain_c = chain_b.replace("brown", "mole")
    df = spark.createDataFrame([
        (1, long),
        (2, chain_b),      # near-dup of 1 -> dropped
        (3, chain_c),      # near-dup of 2 (NOT of 1 directly) -> dropped
        (4, "entirely different unrelated words in this one body"),
        (5, ""),           # no shingles: passes
        (6, None),         # no shingles: passes
    ], "doc_id long, text string")
    fresh, buckets = dedup_minhash_incremental(
        df, None, num_hashes=16, bands=2, shingle_n=1)
    assert sorted(r.doc_id for r in fresh.collect()) == [1, 4, 5, 6]
    # sanity: B and C DO share a bucket while C and A do not (the
    # chain premise — if this ever flips, the fixture needs new words)
    from faxe_spark.operators.dedup import minhash_band_rows

    bb = {(r.doc_id, r.fingerprint) for r in minhash_band_rows(
        df.filter("doc_id <= 3"), num_hashes=16, bands=2,
        shingle_n=1).collect()}
    fps = lambda d: {f for i, f in bb if i == d}  # noqa: E731
    assert fps(2) & fps(3), "chain premise broken: B,C share no bucket"
    assert not (fps(1) & fps(3)), "fixture too similar: A,C share a bucket"
    # the seen set carries buckets from dropped docs too
    assert {r.fingerprint for r in buckets.collect()} >= fps(3)


def test_minhash_incremental_cross_batch_and_bucket_delta(spark):
    """Cross-batch: replays and near-dups of batch-1 docs drop in
    batch 2; the updated bucket set is duplicate-free (union of
    disjoint deltas), so compaction needs no distinct pass."""
    from faxe_spark.operators.dedup import dedup_minhash_incremental

    long = ("the quick brown fox jumps over the lazy dog "
            "again and again tonight")
    b1 = spark.createDataFrame(
        [(1, long), (2, "some other totally distinct words here")],
        "doc_id long, text string")
    b2 = spark.createDataFrame(
        [(10, long.replace("fox", "cat")),    # near-dup of 1 (shares a
                                              # band — same fixture the
                                              # chain test pins)
         (11, "genuinely novel content appears only in batch two")],
        "doc_id long, text string")
    f1, seen1 = dedup_minhash_incremental(b1, None, num_hashes=16,
                                          bands=2, shingle_n=1)
    assert sorted(r.doc_id for r in f1.collect()) == [1, 2]
    f2, seen2 = dedup_minhash_incremental(b2, seen1, num_hashes=16,
                                          bands=2, shingle_n=1)
    assert sorted(r.doc_id for r in f2.collect()) == [11]
    assert seen2.count() == seen2.distinct().count()


def test_compact_pending_fps_missing_dir_is_noop(spark, tmp_path):
    """Review round 6: a run that produced zero epochs never creates
    pending_dir — compaction must no-op (return the table unchanged,
    or create it empty), not throw PATH_NOT_FOUND."""
    from faxe_spark.operators.dedup import compact_pending_fps

    tbl = "t_compact_noop"
    try:
        out = compact_pending_fps(spark, str(tmp_path / "never_made"), tbl)
        assert out.count() == 0                       # created empty
        spark.createDataFrame([("fp1",)], "fingerprint string") \
            .write.parquet(str(tmp_path / "pend" / "epoch=0"))
        compact_pending_fps(spark, str(tmp_path / "pend"), tbl)
        out2 = compact_pending_fps(spark, str(tmp_path / "never_made"), tbl)
        assert {r.fingerprint for r in out2.collect()} == {"fp1"}  # unchanged
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}__stage")


def test_simhash_incremental_chain_cross_batch_and_empty(spark):
    """Hamming-distance crawl dedup: at hamming_max=2 the fixture is a
    PURE chain (h(A,B)=1, h(B,C)=2, but h(A,C)=3 — C is not a dup of A
    directly, only of dropped B, whose signature stays in the seen
    set); cross-batch replays drop against the accumulated set; docs
    with no shingles pass."""
    from faxe_spark.operators.dedup import dedup_simhash_incremental

    long = ("the quick brown fox jumps over the lazy dog "
            "again and again tonight")
    b1 = spark.createDataFrame([
        (1, long),
        (2, long.replace("fox", "cat")),                     # h=1 to 1
        (3, long.replace("fox", "cat").replace("brown", "mole")),
        # ^ h=2 to doc2, h=3 to doc1: dropped ONLY via the chain
        (4, "totally unrelated content with different words"),
        (5, None),
    ], "doc_id long, text string")
    f1, seen = dedup_simhash_incremental(b1, None, bits=32,
                                         shingle_n=1, hamming_max=2)
    assert sorted(r.doc_id for r in f1.collect()) == [1, 4, 5]
    b2 = spark.createDataFrame([
        (10, long),                                          # replay: h=0
        (11, "genuinely new material unlike anything before")],
        "doc_id long, text string")
    f2, seen2 = dedup_simhash_incremental(b2, seen, bits=32,
                                          shingle_n=1, hamming_max=2)
    assert sorted(r.doc_id for r in f2.collect()) == [11]
    assert seen2.count() == seen2.distinct().count()
