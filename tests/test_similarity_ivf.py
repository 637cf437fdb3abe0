"""IVF ANN: nprobe == nlist is exhaustive, so it must reproduce the
brute-force top-k exactly; at nprobe < nlist it trades recall for the
~nprobe/nlist cost cut."""

from __future__ import annotations

from faxe_spark.operators import similarity as sim
from faxe_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.vec_id)
    return out


def test_ivf_full_probe_equals_brute_force(spark):
    emb = load_table(spark, SF, "embeddings")
    q = emb.filter("vec_id < 5")
    brute = sim.cosine_topk(emb, q, 10, id_col="vec_id", vec_col="embedding")
    ivf = sim.cosine_ivf_topk(emb, q, 10, id_col="vec_id", vec_col="embedding",
                              nlist=8, nprobe=8)
    b = sorted((r.query_id, r.rank, r.vec_id) for r in brute.collect())
    i = sorted((r.query_id, r.rank, r.vec_id) for r in ivf.collect())
    assert b == i


def test_ivf_partial_probe_recall(spark):
    emb = load_table(spark, SF, "embeddings")
    q = emb.filter("vec_id < 5")
    brute = _topk_sets(sim.cosine_topk(emb, q, 10, id_col="vec_id", vec_col="embedding"))
    ivf = _topk_sets(sim.cosine_ivf_topk(emb, q, 10, id_col="vec_id",
                                         vec_col="embedding", nlist=8, nprobe=4))
    hits = sum(len(brute[qid] & ivf.get(qid, set())) for qid in brute)
    total = sum(len(s) for s in brute.values())
    assert hits / total >= 0.5, f"recall {hits}/{total} below floor"


def test_lsh_jvm_and_gemm_signatures_identical_1024d(spark):
    """The two signature kernels (JVM literal-array fold, numpy GEMM
    pandas_udf) must assign identical buckets — checked at dim=1024 x 16
    planes, the regime the old md5-expression-tree formulation could not
    plan at all."""
    import random

    import pyspark.sql.functions as F

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(1024)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    planes = sim.hyperplane_planes(1024, 16)
    qv = df.select("vec_id", sim.quantize_vec(F.col("embedding")).alias("_v"))
    jvm = qv.withColumn("_sig", sim.hyperplane_signature(F.col("_v"), planes))
    gemm = sim._signature_gemm(qv, "_v", "_sig", planes)
    j = {r.vec_id: r._sig for r in jvm.collect()}
    g = {r.vec_id: r._sig for r in gemm.collect()}
    assert j == g
    # the fused mapInArrow bucket-row kernel (r11 wave 12) must assign
    # the same buckets as both scalar kernels
    rows = sim._sig_rows_arrow(qv, "_v", dim=1024, planes=16, tables=1)
    a = {r.vec_id: r._sig for r in rows.collect()}
    assert a == j


def test_lsh_topk_recall_vs_brute(spark):
    """Multi-table OR-amplification is the recall lever: 8 tables x 4
    planes should recover a solid fraction of the true top-10."""
    emb = load_table(spark, SF, "embeddings")
    q = emb.filter("vec_id < 5")
    brute = _topk_sets(sim.cosine_topk(emb, q, 10, id_col="vec_id",
                                       vec_col="embedding", quantize=True))
    lsh = _topk_sets(sim.cosine_lsh_topk(emb, q, 10, dim=64, planes=4, tables=8,
                                         id_col="vec_id", vec_col="embedding"))
    hits = sum(len(brute[qid] & lsh.get(qid, set())) for qid in brute)
    total = sum(len(s) for s in brute.values())
    assert hits / total >= 0.3, f"recall {hits}/{total} below floor"


def test_lsh_topk_arrow_path_matches_jvm_path(spark):
    emb = load_table(spark, SF, "embeddings")
    q = emb.filter("vec_id < 5")
    a = sim.cosine_lsh_topk(emb, q, 10, dim=64, planes=8, use_arrow=False,
                            id_col="vec_id", vec_col="embedding")
    b = sim.cosine_lsh_topk(emb, q, 10, dim=64, planes=8, use_arrow=True,
                            id_col="vec_id", vec_col="embedding")
    ra = sorted((r.query_id, r.rank, r.vec_id) for r in a.collect())
    rb = sorted((r.query_id, r.rank, r.vec_id) for r in b.collect())
    assert ra == rb


# -- product quantization ---------------------------------------------------

def test_pq_exact_when_codebook_covers_corpus(spark):
    """Exactness proof (the full-probe analog): with ksub >= corpus
    size the per-subspace codebooks converge onto the data points, the
    quantization error is ~0, and ADC top-k must equal the exact
    brute-force top-k."""
    from faxe_spark.operators import similarity as sim

    emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
           .filter("vec_id < 40"))
    books = sim.pq_train(emb, m=8, ksub=64, max_iter=60)
    codes = sim.pq_encode(emb, books)
    queries = emb.filter("vec_id < 5")
    got = {(r.query_id, r.rank): r.vec_id for r in
           sim.pq_adc_topk(codes, queries, books, 5).collect()}
    want = {(r.query_id, r.rank): r.vec_id for r in
            sim.cosine_topk(emb, queries, 5).collect()}
    assert got == want


def test_pq_encode_deterministic_and_compact(spark):
    from faxe_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = sim.pq_train(emb, m=8, ksub=16)
    assert books.shape == (8, 16, 8)          # 64-dim / m=8
    a = {r.vec_id: tuple(r.codes) for r in sim.pq_encode(emb, books).collect()}
    b = {r.vec_id: tuple(r.codes) for r in sim.pq_encode(emb, books).collect()}
    assert a == b and all(len(c) == 8 for c in a.values())
    assert all(0 <= x < 16 for c in a.values() for x in c)


def test_pq_adc_recall_floor(spark):
    """Real compression (m=16 x 6-bit codes = 32x smaller than
    float64): ADC ranking must clear a recall floor. NB: the synthetic
    near-uniform corpus is PQ's adversarial case — measured ~0.59
    here vs the much higher recalls PQ reaches on structured learned
    embeddings; the floor is set for THIS corpus."""
    from faxe_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = sim.pq_train(emb, m=16, ksub=64)
    codes = sim.pq_encode(emb, books)
    queries = emb.filter("vec_id < 10")
    approx = {}
    for r in sim.pq_adc_topk(codes, queries, books, 10).collect():
        approx.setdefault(r.query_id, set()).add(r.vec_id)
    exact = {}
    for r in sim.cosine_topk(emb, queries, 10).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [len(approx[q] & exact[q]) / 10 for q in exact]
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_pq_adc_empty_queries_and_self_match_optout(spark):
    """r4 advice: an empty query set raises a clear ValueError (not an
    opaque np.stack crash), and exclude_self=False keeps a candidate
    whose id merely collides numerically with a query id — the
    separate-id-space case."""
    import pytest

    from faxe_spark.operators import similarity as sim

    emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
           .filter("vec_id < 20"))
    books = sim.pq_exact_codebook(emb)
    codes = sim.pq_encode(emb, books)
    with pytest.raises(ValueError, match="empty queries"):
        sim.pq_adc_topk(codes, emb.filter("vec_id < 0"), books, 5)
    queries = emb.filter("vec_id < 3")
    with_self = sim.pq_adc_topk(codes, queries, books, 1,
                                exclude_self=False).collect()
    # the exact codebook makes each vector its own nearest neighbor
    assert {(r.query_id, r.vec_id) for r in with_self} == \
        {(i, i) for i in range(3)}
    without = sim.pq_adc_topk(codes, queries, books, 1).collect()
    assert all(r.query_id != r.vec_id for r in without)


# -- IVFPQ composition (round 5) --------------------------------------------

def test_ivfpq_exact_when_full_probe_and_exact_residuals(spark):
    """nprobe=nlist + the degenerate exact residual codebook: ADC
    score = q·c[cid] + q·residual = true cosine, so IVFPQ must
    reproduce brute-force RANKS exactly."""
    from faxe_spark.operators import similarity as sim

    emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
           .filter("vec_id < 60"))
    coarse, _b, _c = sim.ivfpq_index(emb, nlist=4, m=1, ksub=2)
    books = sim.ivfpq_exact_residual_codebook(emb, coarse)
    _, _, codes = sim.ivfpq_index(emb, coarse=coarse, codebooks=books)
    queries = emb.filter("vec_id < 5")
    got = {(r.query_id, r.rank): r.vec_id for r in
           sim.ivfpq_topk(codes, queries, coarse, books, 5,
                          nprobe=4).collect()}
    want = {(r.query_id, r.rank): r.vec_id for r in
            sim.cosine_topk(emb, queries, 5).collect()}
    assert got == want


def test_ivfpq_recall_floor_and_pruning(spark):
    """Real compression (m=16 codes, nprobe < nlist): recall clears a
    floor on the adversarial near-uniform corpus, and shrinking nprobe
    can only shrink the candidate set (monotone pruning)."""
    from faxe_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    coarse, books, codes_df = sim.ivfpq_index(emb, nlist=8, m=16, ksub=64)
    codes_df = codes_df.localCheckpoint(eager=True)
    queries = emb.filter("vec_id < 10")
    exact = {}
    for r in sim.cosine_topk(emb, queries, 10).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)

    full = {}
    for r in sim.ivfpq_topk(codes_df, queries, coarse, books, 10,
                            nprobe=8).collect():
        full.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [len(full[q] & exact[q]) / 10 for q in exact]
    assert sum(recalls) / len(recalls) >= 0.5, recalls

    # nprobe=2 candidates ⊆ nprobe=8 candidates per query
    pruned = {}
    for r in sim.ivfpq_topk(codes_df, queries, coarse, books, 1000,
                            nprobe=2).collect():
        pruned.setdefault(r.query_id, set()).add(r.vec_id)
    allp = {}
    for r in sim.ivfpq_topk(codes_df, queries, coarse, books, 1000,
                            nprobe=8).collect():
        allp.setdefault(r.query_id, set()).add(r.vec_id)
    for q in pruned:
        assert pruned[q] <= allp[q]


def test_ivfpq_empty_queries_raises(spark):
    import pytest

    from faxe_spark.operators import similarity as sim

    emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
           .filter("vec_id < 30"))
    coarse, books, codes = sim.ivfpq_index(emb, nlist=2, m=8, ksub=4)
    with pytest.raises(ValueError, match="empty queries"):
        sim.ivfpq_topk(codes, emb.filter("vec_id < 0"), coarse, books, 5)


# -- IVF multi-probe PAIR generation (cosine_pairs_ivf) ---------------------

def test_pairs_ivf_full_probe_equals_all_pairs(spark):
    """nprobe == nlist considers every pair, so the result must equal
    cosine_pairs bit-for-bit (same quantized float64 GEMM; the
    twice-found cross-list pairs dedupe via distinct on identical
    bits)."""
    emb = load_table(spark, SF, "embeddings")
    brute = {(r.id_a, r.id_b): r.cosine
             for r in sim.cosine_pairs(emb, 0.35, id_col="vec_id",
                                       vec_col="embedding").collect()}
    ivf = {(r.id_a, r.id_b): r.cosine
           for r in sim.cosine_pairs_ivf(emb, 0.35, nlist=8, nprobe=8,
                                         id_col="vec_id",
                                         vec_col="embedding").collect()}
    assert ivf == brute
    assert len(brute) > 0              # non-vacuous fixture


def test_pairs_ivf_probe_monotone_and_within_cluster_complete(spark):
    """Bounded probes: every result is a TRUE pair (subset of brute,
    never a false positive — candidates only generate, the exact
    cosine decides), recall grows monotonically with nprobe, and
    nprobe=1 is exactly the SemDeDup within-cluster lane — so any
    extra pairs at nprobe>1 are boundary-straddlers that lane
    misses."""
    emb = load_table(spark, SF, "embeddings")
    brute = {(r.id_a, r.id_b)
             for r in sim.cosine_pairs(emb, 0.35, id_col="vec_id",
                                       vec_col="embedding").collect()}
    got = {}
    for np_ in (1, 4, 8):
        got[np_] = {(r.id_a, r.id_b)
                    for r in sim.cosine_pairs_ivf(
                        emb, 0.35, nlist=8, nprobe=np_, id_col="vec_id",
                        vec_col="embedding").collect()}
        assert got[np_] <= brute
    assert got[1] <= got[4] <= got[8] == brute
    assert len(got[4]) > len(got[1]), \
        "multi-probe found no boundary-straddling pairs on this corpus"


def test_cosine_pairs_small_key_packing_equivalence(spark):
    """r7 packed small-key lane: a mixed corpus — one partition bigger
    than block_size (tiled lane) plus many single-block partitions
    (packed lane) — produces pair-for-pair the SAME result as the
    pure-Column formulation (block_size=None), and as the same call
    before packing existed (per-key arithmetic is identical)."""
    import random

    import pyspark.sql.functions as F

    from faxe_spark.operators import similarity as sim

    rng = random.Random(17)
    rows = []
    vid = 0
    # 12 vectors in the big partition (block_size=8 -> 2 blocks),
    # 6 small partitions of 2-4 vectors each (single block)
    for part, n in [("big", 12)] + [(f"p{i}", 2 + i % 3) for i in range(6)]:
        for _ in range(n):
            rows.append((vid, part,
                         [rng.uniform(-1, 1) for _ in range(8)]))
            vid += 1
    df = spark.createDataFrame(
        rows, "vec_id long, grp string, embedding array<double>")
    got = sim.cosine_pairs(df, -1.0, id_col="vec_id",
                           vec_col="embedding", block_size=8,
                           block_col="grp")
    want = sim.cosine_pairs(df, -1.0, id_col="vec_id",
                            vec_col="embedding", block_size=None,
                            block_col="grp")
    k = lambda d: sorted(                                # noqa: E731
        (r.id_a, r.id_b, round(r.cosine, 9)) for r in d.collect())
    assert k(got) == k(want)
    assert len(k(got)) == (12 * 11) // 2 + sum(
        (n * (n - 1)) // 2 for n in (2, 3, 4, 2, 3, 4))
    # plan shape: ONE grouped-map Python node (Arrow-native since r11
    # wave 9) and ONE pass over the upstream subtree — packed and
    # tiled groups share a single groupBy (the first two-lane form
    # recomputed the upstream per lane). AQE's plan string repeats the
    # tree under '== Initial Plan ==' — count only the final section.
    plan = got._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert (final.count("FlatMapGroupsInArrow")
            + final.count("FlatMapGroupsInPandas")) == 1, plan


def test_cosine_pairs_blocked_lane_rejects_string_ids(spark):
    """Review find: the blocked lane's long cast turned string ids
    into NULLs and the kernel silently found ZERO pairs (semantic_dedup
    would keep exact duplicates). It must fail loud instead; the
    pure-Column lane still accepts any id type. ADVICE r8: the check is
    'losslessly castable to long', not an exact-name whitelist —
    decimal(10,0) ids pass, decimal(5,2) and decimal(38,0) fail."""
    import pytest as _pytest
    import pyspark.sql.functions as F

    from faxe_spark.operators.similarity import cosine_pairs

    df = spark.createDataFrame(
        [("doc-1", [1.0, 0.0]), ("doc-2", [1.0, 0.0])],
        "vec_id string, embedding array<double>")
    with _pytest.raises(ValueError, match="castable to long"):
        cosine_pairs(df, 0.9)
    got = cosine_pairs(df, 0.9, block_size=None).collect()
    assert len(got) == 1 and got[0].cosine == 1.0

    # decimal(10,0) casts to long losslessly and must be ACCEPTED
    dec = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0])],
        "vec_id long, embedding array<double>") \
        .withColumn("vec_id", F.col("vec_id").cast("decimal(10,0)"))
    got = cosine_pairs(dec, 0.9, block_size=1).collect()
    assert len(got) == 1 and {got[0].id_a, got[0].id_b} == {1, 2}

    # fractional scale (could truncate) and precision > 18 (overflows
    # a long) both fail loud
    for t in ("decimal(5,2)", "decimal(38,0)"):
        bad = dec.withColumn("vec_id", F.col("vec_id").cast(t))
        with _pytest.raises(ValueError, match="castable to long"):
            cosine_pairs(bad, 0.9)
