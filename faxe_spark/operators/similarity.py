"""Similarity search over embedding columns (array<float>).

- `cosine_topk`: brute-force exact top-k — the correctness baseline.
  Dot products run JVM-side via zip_with + aggregate (no Python). The
  query set is broadcast; cost = |corpus| x |queries| x dim, embarrassingly
  parallel over corpus partitions — the right baseline shape even at
  100 TB when |queries| is bounded.
- `cosine_lsh_topk`: the scale path — random-hyperplane LSH bucketing.
  Hyperplane signs are derived from md5(dim, plane) so the index is
  deterministic (no RNG state to ship). Candidates = bucket collisions
  (multi-probe via bands), then exact re-rank within candidates only.
- `cosine_pairs`: all-pairs >= threshold (near-dup detection); bucketed
  variant composes LSH candidates with exact verification.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _key_py(key) -> tuple:
    """applyInArrow passes group keys as pyarrow scalars (applyInPandas
    passed Python natives) — normalize once at tile entry."""
    return tuple(k.as_py() if hasattr(k, "as_py") else k for k in key)


def _arrow_mat(col, idx=None):
    """float64 (n, dim) matrix from an Arrow list<double> column —
    the Arrow-native replacement for np.stack(pdf[col].to_numpy()):
    no per-row numpy-object creation, one zero-copy-ish flatten of the
    child buffer + reshape (vectors are fixed-dim by construction, so
    the reshape is exact; a ragged column would fail loudly). idx
    (optional int ndarray) takes a row subset BEFORE flattening.
    MUST use .flatten(), never .values: .values ignores the slice
    offsets Arrow batches routinely carry."""
    import numpy as np

    comb = col.combine_chunks() if hasattr(col, "combine_chunks") else col
    if idx is not None:
        import pyarrow as pa

        comb = comb.take(pa.array(idx, type=pa.int64()))
    n = len(comb)
    flat = np.asarray(comb.flatten(), dtype=np.float64)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _arrow_np(col, idx=None):
    """1-D numpy view of a scalar Arrow column (ids, flags, keys);
    object dtype for strings — same dtypes the pandas path produced."""
    import numpy as np

    comb = col.combine_chunks() if hasattr(col, "combine_chunks") else col
    if idx is not None:
        import pyarrow as pa

        comb = comb.take(pa.array(idx, type=pa.int64()))
    return np.asarray(comb)


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def _lloyds(X, k: int, iters: int, seed: int):
    """Deterministic numpy Lloyd's over a (pre-normalized) sample —
    the IVF coarse-quantizer trainer. Seeded-choice init; an empty
    cluster keeps its previous centroid (deterministic, no reseed
    randomness). Milliseconds at coarse-quantizer sizes (<=100k x
    <=1024 dims x <=256 centroids)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    k = min(k, len(X))
    C = X[rng.choice(len(X), size=k, replace=False)].copy()
    for _ in range(iters):
        d = X @ C.T - 0.5 * (C * C).sum(axis=1)[None, :]
        lab = np.argmax(d, axis=1)
        newC = C.copy()
        for j in range(k):
            m = lab == j
            if m.any():
                newC[j] = X[m].mean(axis=0)
        if np.allclose(newC, C):
            break
        C = newC
    return C


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays (cast float cols first)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def _as_double(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


_CENTROID_BC: dict = {}


def _centroid_broadcast(sc, centroids):
    """Content-keyed cached broadcast of a (small) centroid matrix.

    ADVICE r6: assign_lists/assign_probes called inside a continuous
    foreachBatch loop created one sparkContext.broadcast per
    micro-batch, never destroyed — a long non-availableNow run
    accumulated broadcasts on the driver and executors. Keying by
    (application, matrix bytes) makes every epoch of a crawl loop
    reuse ONE broadcast per trained quantizer; the cache is bounded by
    the number of distinct trained quantizers in the session (index
    builds), not by epochs. Entries are not destroy()ed — a lazy plan
    built in an earlier epoch may still reference one — but entries of
    STOPPED SparkContexts (different applicationId) are dropped on
    insert, so a long-lived process cycling sessions doesn't pin dead
    apps' matrices (review find)."""
    import hashlib

    key = (sc.applicationId, centroids.shape,
           hashlib.sha1(centroids.tobytes()).hexdigest())
    bc = _CENTROID_BC.get(key)
    if bc is None:
        for stale in [k for k in _CENTROID_BC if k[0] != sc.applicationId]:
            del _CENTROID_BC[stale]
        bc = sc.broadcast(centroids)
        _CENTROID_BC[key] = bc
    return bc


def quantize_vec(c: Column, scale: int = 1_000_000) -> Column:
    """float array -> bigint array (floor(x * scale)). Integer dot
    products are order-independent and engine-exact — the determinism
    device the DuckDB oracles rely on; ~1e-6 relative error on cosine."""
    return F.transform(c, lambda x: F.floor(x.cast("double") * scale).cast("long"))


def cosine_quantized(a: Column, b: Column) -> Column:
    """Cosine over quantized bigint vectors: exact integer dot/norms,
    final division in double (deterministic: one sqrt+mul+div chain)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0).cast("long"), lambda acc, v: acc + v)
    na = F.aggregate(a, F.lit(0).cast("long"), lambda acc, v: acc + v * v)
    nb = F.aggregate(b, F.lit(0).cast("long"), lambda acc, v: acc + v * v)
    return dot / (F.sqrt(na.cast("double")) * F.sqrt(nb.cast("double")))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int, *,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str = "query_id", quantize: bool = False) -> DataFrame:
    """Exact top-k neighbors per query vector (brute force baseline).

    Output: (query_id, vec_id, cosine, rank). Excludes self-matches when
    ids collide. Ties broken by corpus id (deterministic). quantize=True
    uses integer-quantized cosine (engine-reproducible, ~1e-6 error)."""
    from pyspark.sql.window import Window

    prep = quantize_vec if quantize else _as_double
    cos = cosine_quantized if quantize else cosine
    q = queries.select(F.col(id_col).alias(query_id_col),
                       prep(F.col(vec_col)).alias("_qv"))
    c = corpus.select(F.col(id_col), prep(F.col(vec_col)).alias("_cv"))
    joined = c.join(F.broadcast(q), F.col(query_id_col) != F.col(id_col))
    scored = joined.select(
        query_id_col, id_col,
        cos(F.col("_qv"), F.col("_cv")).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def hyperplane_planes(dim: int, planes: int = 16, *, table: int = 0) -> list[list[int]]:
    """Deterministic ±1 hyperplane matrix: component (p, d) is +1 iff
    the first hex nibble of md5('p:d') >= '8' (table t > 0 salts the
    seed to 't{t}:p:d' for independent LSH tables). Computed ONCE
    driver-side (planes x dim tiny hashes, microseconds at 1024d) and
    shipped to executors as a literal array / numpy matrix — never as
    an md5 expression tree (the old formulation built dim x planes
    Column nodes, unusable past ~64d). Reproducible in any engine that
    has md5, which is what the DuckDB oracle uses."""
    import hashlib

    pre = "" if table == 0 else f"t{table}:"
    return [[1 if hashlib.md5(f"{pre}{p}:{d}".encode()).hexdigest()[0] in "89abcdef"
             else -1 for d in range(dim)]
            for p in range(planes)]


def hyperplane_signature(vec: Column, plane_matrix: list[list[int]]) -> Column:
    """Signature bitmap over a QUANTIZED bigint vector: bit p set when
    dot(vec, plane_p) >= 0. Integer dots are order-independent, so the
    bucket assignment is bit-identical across engines (a double dot can
    flip sign on a near-zero projection depending on summation order).
    JVM-side: one zip_with/aggregate fold per plane over a literal ±1
    array — planes x dim element ops in codegen'd higher-order funcs,
    no Python, no driver probe."""
    sig = None
    for p, row in enumerate(plane_matrix):
        lit_row = F.array(*[F.lit(s) for s in row])
        dot = F.aggregate(F.zip_with(vec, lit_row, lambda x, y: x * y),
                          F.lit(0).cast("long"), lambda acc, v: acc + v)
        bit = F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return sig.cast("long")


def _signature_gemm(df: DataFrame, vec_col: str, out_col: str,
                    plane_matrix: list[list[int]]) -> DataFrame:
    """Arrow-batched signature for LARGE dim: one numpy GEMM per batch
    ((batch x dim) @ (dim x planes)), float64 — exact for quantized
    components (products <= 1e12, dim-bounded sums < 2^53), so it
    produces the same buckets as the JVM fold. At 1024d x 16 planes the
    per-row cost is a BLAS row, not 16k interpreted lambda steps."""
    import numpy as np
    import pandas
    from pyspark.sql.functions import pandas_udf

    P = np.array(plane_matrix, dtype=np.float64).T
    weights = (np.int64(1) << np.arange(len(plane_matrix), dtype=np.int64))

    # explicit hints resolvable without module globals (the module uses
    # `from __future__ import annotations`, which stringifies hints)
    def sig_fn(v):
        X = np.stack(v.to_numpy()).astype(np.float64)
        return pandas.Series(((X @ P >= 0) * weights).sum(axis=1).astype(np.int64))

    sig_fn.__annotations__ = {"v": pandas.Series, "return": pandas.Series}
    sig = pandas_udf(sig_fn, "long")
    return df.withColumn(out_col, sig(F.col(vec_col)))


def _sig_rows_arrow(df: DataFrame, vec_col: str, *, dim: int,
                    planes: int, tables: int) -> DataFrame:
    """(key, _t, _sig) bucket-membership rows for ALL tables in ONE
    mapInArrow pass — the wave-9/10 boundary fix applied to the LSH
    signature kernel: the vector column reshapes from the Arrow child
    buffer ((n, dim) float64, no per-row numpy objects — the
    pandas_udf form paid one object per row), the key column passes
    through untouched, and the per-table explode is fused into the
    pass (one RecordBatch per table instead of `tables` UDF columns +
    an explode). Arithmetic is the exact _signature_gemm formula
    (float64 GEMM against the ±1 planes, >= 0 test, bit weights), so
    buckets are bit-identical: quantized components are <= 1e6 and
    dim-bounded sums stay far below 2^53."""
    import numpy as np

    key = df.columns[0]
    pms = [np.array(hyperplane_planes(dim, planes, table=t),
                    dtype=np.float64).T for t in range(tables)]
    weights = (np.int64(1) << np.arange(planes, dtype=np.int64))
    bc = df.sparkSession.sparkContext.broadcast((pms, weights))

    def gen(batches):
        import pyarrow as pa

        pms_, w_ = bc.value
        for rb in batches:
            X = _arrow_mat(rb.column(1))
            keys = rb.column(0)
            n = len(keys)
            for t, P in enumerate(pms_):
                sig = ((X @ P >= 0) * w_).sum(axis=1).astype(np.int64)
                yield pa.RecordBatch.from_arrays(
                    [keys, pa.array(np.full(n, t, dtype=np.int32)),
                     pa.array(sig)],
                    names=[key, "_t", "_sig"])

    key_type = df.schema[key].dataType.simpleString()
    return (df.select(key, vec_col)
            .mapInArrow(gen, f"{key} {key_type}, _t int, _sig bigint"))


def cosine_lsh_topk(corpus: DataFrame, queries: DataFrame, k: int, *,
                    dim: int, id_col: str = "vec_id", vec_col: str = "embedding",
                    query_id_col: str = "query_id", planes: int = 8,
                    tables: int = 1, use_arrow: bool | None = None) -> DataFrame:
    """Approximate top-k: candidates = same hyperplane-signature bucket
    in ANY of `tables` independent tables (standard LSH OR-amplification
    — per-neighbor hit prob 1-(1-(1-θ/π)^planes)^tables), exact
    (quantized) cosine re-rank on the candidate union. Recall knobs:
    fewer planes -> bigger buckets; more tables -> more chances.

    `dim` is a required parameter — no driver-side .first() probe in the
    plan. use_arrow=None picks the signature kernel by size: the JVM
    literal-array fold for small dim x planes, the numpy GEMM pandas_udf
    beyond ~4096 multiply-adds per row; both produce identical buckets
    (integer dots, order-independent).

    Scale shape: signatures are narrow (id, table, sig) rows; the bucket
    match is an equi-join on (table, sig) with the query side broadcast;
    vectors are joined back only for surviving candidates, so the
    shuffle never carries corpus-vector x tables replicas."""
    from pyspark.sql.window import Window

    # measured crossover: the interpreted zip_with/aggregate fold loses
    # to the Arrow GEMM already at 64d x 8 planes (2.5 s vs 1.1 s on the
    # sf0.1 corpus) — keep the JVM fold only for genuinely tiny matrices
    if use_arrow is None:
        use_arrow = dim * planes * tables > 256
    c = corpus.select(F.col(id_col), quantize_vec(F.col(vec_col)).alias("_cv"))
    q = queries.select(F.col(id_col).alias(query_id_col),
                       quantize_vec(F.col(vec_col)).alias("_qv"))

    def with_sigs(df, vcol):
        if use_arrow:
            # one fused Arrow pass for all tables (signature GEMM +
            # table explode); bit-identical buckets to the JVM fold —
            # pinned by test_lsh_topk_arrow_path_matches_jvm_path
            return _sig_rows_arrow(df, vcol, dim=dim, planes=planes,
                                   tables=tables)
        for t in range(tables):
            pm = hyperplane_planes(dim, planes, table=t)
            df = df.withColumn(f"_sig{t}", hyperplane_signature(F.col(vcol), pm))
        sigs = F.array(*[F.struct(F.lit(t).alias("_t"), F.col(f"_sig{t}").alias("_sig"))
                         for t in range(tables)])
        return df.select(df.columns[0], F.explode(sigs).alias("_e")) \
                 .select(df.columns[0], "_e._t", "_e._sig")

    cand = (with_sigs(c, "_cv").join(F.broadcast(with_sigs(q, "_qv")), ["_t", "_sig"])
            .filter(F.col(query_id_col) != F.col(id_col))
            .select(query_id_col, id_col).distinct())
    joined = (cand.join(c, id_col)
              .join(F.broadcast(q.select(query_id_col, "_qv")), query_id_col))
    scored = joined.select(query_id_col, id_col,
                           cosine_quantized(F.col("_qv"), F.col("_cv")).alias("cosine"))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def hash_sample_matrix(corpus: DataFrame, *, id_col: str, vec_col: str,
                       n: int = 25_000, what: str = "train"):
    """Deterministic hash sample of `n` vectors as a unit-normalized
    float64 matrix — the shared driver-side trainer input for every
    coarse/PQ quantizer here (FAISS-style: train on ~100k vectors
    regardless of corpus size; the sample IS the 100 TB strategy)."""
    import numpy as np

    samp = (corpus.select(id_col, _as_double(F.col(vec_col)).alias("_v"))
            .orderBy(F.xxhash64(F.col(id_col).cast("string")), id_col)
            .limit(n).collect())
    samp.sort(key=lambda r: r[0])
    if not samp:
        raise ValueError(f"{what}: empty corpus — nothing to train on")
    X = np.array([r[1] for r in samp], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    return X


def assign_lists(corpus: DataFrame, centroids, *, id_col: str,
                 vec_col: str = "_cv",
                 carry: tuple[str, ...] = ()) -> DataFrame:
    """Nearest-centroid assignment (the inverted-list builder): one
    Arrow pass, argmax of a single GEMM against the broadcast centroid
    matrix. Input needs (id_col, vec_col=array<double>); output
    (id_col, _cid int, *carry). `carry` columns are echoed through the
    pass unchanged — the device that lets an encode-and-store caller
    (_ivf_flat_lists) get (id, _cid, stored-vector) in ONE pass instead
    of joining the assignment back to the corpus (that join was a full
    extra exchange of the corpus per build/add — guide §2.4)."""
    import numpy as np

    bc = _centroid_broadcast(corpus.sparkSession.sparkContext, centroids)

    def assign(batches):
        # mapInArrow (r11 wave 10, same boundary fix as the wave-9
        # tile kernels): the vector column reshapes from the Arrow
        # child buffer instead of one numpy object per row, and the
        # id/carry columns pass through as Arrow arrays untouched
        # (zero conversion either way for the stored-vector carry).
        import pyarrow as pa

        C = bc.value                       # (nlist, dim)
        half = 0.5 * (C * C).sum(axis=1)   # ||c||^2 / 2
        for rb in batches:
            V = _arrow_mat(rb.column(vec_col))
            # out-of-place: the zero-copy Arrow view is read-only
            V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True),
                               1e-12)
            cid = np.argmax(V @ C.T - half[None, :], axis=1)
            out = {id_col: rb.column(id_col),
                   "_cid": pa.array(cid.astype(np.int32))}
            for c in carry:
                out[c] = rb.column(c)
            yield pa.RecordBatch.from_pydict(out)

    id_type = corpus.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, _cid int" + "".join(
        f", {c} {corpus.schema[c].dataType.simpleString()}"
        for c in carry)
    return (corpus.select(id_col, vec_col, *carry)
            .mapInArrow(assign, schema))


def cosine_ivf_topk(corpus: DataFrame, queries: DataFrame, k: int, *,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    query_id_col: str = "query_id", nlist: int = 64,
                    nprobe: int = 8, seed: int = 42,
                    max_iter: int = 20, quantize: bool = False) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the billion-scale ANN
    architecture (FAISS IVFFlat layout, built from public Spark MLlib):

    1. TRAIN: k-means over L2-normalized vectors (unit sphere ->
       euclidean ranking == cosine ranking) learns `nlist` coarse
       centroids. At 100 TB you train on a sample; MLlib k-means is
       already sample/iteration-bounded.
    2. INDEX: each corpus vector is assigned to its nearest centroid
       (JVM-side model.transform) — the inverted lists. At scale this
       is ALSO the storage layout: repartition/bucket by list id so a
       probe reads only its lists (partition pruning on cid).
    3. PROBE: each query scores the tiny centroid table (broadcast),
       keeps `nprobe` nearest lists, and exact-cosine re-ranks only
       those lists' members: cost ~ |q| * (nlist + n*nprobe/nlist*dim)
       vs brute n*dim per query.

    nprobe == nlist degenerates to exhaustive search (the equivalence
    test); recall/cost is tuned by nprobe like any IVF index.
    Output: (query_id, vec_id, cosine, rank) — same contract as
    cosine_topk.

    Training runs DRIVER-SIDE over a deterministic hash sample (numpy
    Lloyd's): distributed k-means on a coarse-quantizer problem is
    overhead-dominated (20 Spark jobs for 64 centroids — measured
    4.9 s -> 1.1 s at sf0.1), and the sample IS the 100 TB strategy:
    FAISS-style IVF trains on ~100k vectors regardless of corpus
    size. Assignment stays distributed (one Arrow mapInPandas pass,
    argmax of a single GEMM against the broadcast centroid matrix).

    One-shot convenience: trains + assigns PER CALL. A corpus queried
    by many batches should build the index ONCE via
    ann_index.build_ivf_index (persisted, partition-pruned) and go
    through ann_index.query_ann_index — result-equivalent by
    tests/test_ann_index.py."""
    from pyspark.sql.window import Window

    # quantize=True scores the re-rank over integer-quantized vectors
    # (engine-exact, the oracle determinism device); the k-means
    # training/probe stays double — only the OUTPUT cosine must be exact.
    prep = quantize_vec if quantize else _as_double
    cos = cosine_quantized if quantize else cosine
    c = corpus.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_cv"),
                      prep(F.col(vec_col)).alias("_cvs"))
    # unit-normalize the query ONCE into a column (review find: a
    # `transform(x / _norm(col))` lambda re-runs the O(dim) norm fold
    # per ELEMENT per crossJoin row — O(dim^2) per query-centroid pair;
    # higher-order folds are not CSE'd, same finding as _windows_z).
    # Same division by the same double -> bit-identical probe ranking.
    q = (queries.select(F.col(id_col).alias(query_id_col),
                        _as_double(F.col(vec_col)).alias("_qv"),
                        prep(F.col(vec_col)).alias("_qvs"))
         .withColumn("_qn", _norm(F.col("_qv")))
         .withColumn("_qu", F.transform("_qv", lambda x: x / F.col("_qn")))
         .drop("_qn"))

    # -- train: deterministic hash sample -> driver numpy Lloyd's
    X = hash_sample_matrix(corpus, id_col=id_col, vec_col=vec_col,
                           what="cosine_ivf_topk")
    centroids = _lloyds(X, k=nlist, iters=max_iter, seed=seed)

    spark = corpus.sparkSession
    assigned = assign_lists(c, centroids, id_col=id_col)
    lists = c.join(assigned, id_col)  # (id, _cv, _cid): the inverted lists

    cent = spark.createDataFrame(
        [(i, [float(x) for x in ctr]) for i, ctr in enumerate(centroids)],
        "_cid int, _cvec array<double>")
    # probe: rank centroids per query by distance on the unit sphere
    probe_d = F.aggregate(
        F.zip_with(F.col("_qu"), F.col("_cvec"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, v: acc + v)
    wq = Window.partitionBy(query_id_col).orderBy(probe_d.asc(), F.col("_cid"))
    probes = (q.crossJoin(F.broadcast(cent))
              .withColumn("_crank", F.row_number().over(wq))
              .filter(F.col("_crank") <= nprobe)
              .select(query_id_col, "_qvs", "_cid"))

    joined = lists.join(F.broadcast(probes), "_cid").filter(
        F.col(query_id_col) != F.col(id_col))
    scored = joined.select(query_id_col, id_col,
                           cos(F.col("_qvs"), F.col("_cvs")).alias("cosine"))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def cosine_pairs(corpus: DataFrame, threshold: float, *,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 block_size: int | None = 1024,
                 block_col: str | None = None,
                 emit_block: bool = False,
                 pair_finisher=None) -> DataFrame:
    """Exact all-pairs cosine >= threshold (embedding near-dup), over
    integer-quantized vectors (engine-reproducible, see quantize_vec).

    block_size=None: pure-Column formulation (self-join + zip_with dot
    per pair) — the oracle shape, but Catalyst's higher-order array
    lambdas are interpreted per element, so n^2/2 * 3 array folds
    dominate (51 s at sf0.1).

    block_size=int (default): BLOCKED MATMUL. Split the corpus into
    C = ceil(n/block_size) blocks; replicate each vector to its C block
    pairs; per block pair, one numpy float64 GEMM computes every dot in
    the tile (applyInPandas, Arrow-batched). float64 is EXACT here:
    quantized components <= 1e6, so products <= 1e12 and dim-bounded
    sums < 2^53 — bit-identical to the integer path, which is what the
    DuckDB oracle checks. ~25x on the sf0.1 corpus.

    Scale notes: exact all-pairs is O(n^2) by definition — the blocked
    layout distributes the tiles evenly (C^2/2 independent GEMM tasks,
    replication factor C); beyond ~1e5 vectors switch to hyperplane-LSH
    candidates + this verifier, or cosine_ivf_topk.

    block_col: optional partition column — pairs are only generated
    WITHIN equal block_col values (the SemDeDup within-cluster lane).
    The tile grid simply gains the partition as a third grouping key;
    with k balanced partitions pair cost drops n^2 -> k*(n/k)^2.

    emit_block=True (requires block_col) adds the pair's block_col
    value to the output — lets a caller whose ids are only unique
    WITHIN a block (the time-series per-key window positions) skip a
    join back to the corpus for it (VERDICT r7: those joins re-ran or
    re-shuffled the whole window-build subtree per reference).

    pair_finisher (blocked lane only, requires block_col): a callable
    (id_a, id_b, cosine) -> (id_a, id_b, cosine) over ALIGNED numpy
    arrays of ONE block value's pairs, applied inside the tile kernel
    BEFORE the pandas frame is built or Arrow-transferred (the array
    contract keeps the per-key segment loop of the packed lane free
    of pandas — r8 micro-bench: frame-per-key cost dominated the
    bucket at the IoT shape). The 100 TB lever for consumers that
    reduce the pair stream anyway: an O(n_k^2)-pair tile emits only
    what the reduction keeps (a per-key top-k, a per-window max —
    anything distributive over a partition of the pair set), instead
    of serializing every pair out of the Python worker and shuffling
    it. The callable MUST be exactness-preserving for its consumer —
    it sees every pair of one block value exactly once across all
    tiles of that block, always with id_a < id_b."""
    part = [block_col] if block_col else []
    if emit_block and not block_col:
        raise ValueError("emit_block requires block_col")
    if pair_finisher is not None and (not block_col or block_size is None):
        raise ValueError("pair_finisher requires block_col and the "
                         "blocked (block_size=int) lane")
    if block_size is None:
        cols = [F.col(id_col), quantize_vec(F.col(vec_col)).alias("_vq"), *part]
        a = corpus.select(*cols).withColumnRenamed(id_col, "id_a") \
            .withColumnRenamed("_vq", "_va")
        b = corpus.select(*cols).withColumnRenamed(id_col, "id_b") \
            .withColumnRenamed("_vq", "_vb")
        cond = F.col("id_a") < F.col("id_b")
        pairs = (a.join(b, [*part], "inner").filter(cond) if part
                 else a.join(b, cond))
        keep = [*part] if emit_block else []
        return (pairs.select("id_a", "id_b",
                             cosine_quantized(F.col("_va"), F.col("_vb")).alias("cosine"),
                             *keep)
                .filter(F.col("cosine") >= threshold))

    import math

    # the blocked lane keys tiles by a LONG id; a silent cast of a
    # string id would NULL every row and the kernel would detect zero
    # pairs (review find: semantic_dedup over string doc ids returned
    # keep=true for exact duplicates). Fail loud instead. The test is
    # "losslessly castable to long" (ADVICE r8: an exact-name whitelist
    # wrongly rejected decimal(10,0), which casts losslessly), so any
    # integral type — including decimal(p,0) with p <= 18, which fits
    # a long — passes; fractional and non-numeric types fail loud.
    from pyspark.sql.types import DecimalType, IntegralType

    id_dt = corpus.schema[id_col].dataType
    lossless = isinstance(id_dt, IntegralType) or (
        isinstance(id_dt, DecimalType) and id_dt.scale == 0
        and id_dt.precision <= 18)
    if not lossless:
        raise ValueError(
            f"cosine_pairs blocked lane requires an id column losslessly "
            f"castable to long; {id_col!r} is {id_dt.simpleString()}. Map "
            f"ids to integers first (e.g. a dense id), or pass "
            f"block_size=None for the pure-Column lane, which accepts "
            f"any id type")
    q = corpus.select(F.col(id_col).cast("long").alias("_id"),
                      quantize_vec(F.col(vec_col)).alias("_v"), *part)
    if part:
        # tile grid sized PER PARTITION — a global grid would replicate
        # every vector ceil(n_total/block_size) times and emit mostly
        # empty tiles, defeating the sum(n_c^2) scale path. The count
        # table is one row per partition value (cluster ids / series
        # keys: bounded relative to rows), so it broadcasts. BARRIER
        # (lazy localCheckpoint, materialized by the small_rows collect
        # below): both the broadcast join AND the packed-lane sizing
        # aggregate read it, and without the barrier each reference
        # re-ran the whole upstream (for the time-series callers that
        # upstream is the window build + z-norm — the 3rd-pass form
        # measured 7.4 s vs 5.5 s on ts_motif_topk). eager=False, not
        # the r7 eager form (ADVICE r7: eager ran cluster work at
        # plan-BUILD time even if the result was never executed); not
        # DataFrame.persist either — the CacheManager dedupes identical
        # plans ACROSS calls, so a repeated one-shot cosine_pairs call
        # would silently read a stale-looking shared cache and a
        # min-of-N bench would measure the cache, not the query.
        # Documented trade (ADVICE r7): checkpoint blocks are
        # executor-local and non-replicated with truncated lineage — an
        # executor loss after materialization fails the job instead of
        # recomputing (counts is one tiny row per partition value, so
        # the re-run cost is the job retry, not the barrier itself).
        # Factored through operators.common.barrier; the persist+count
        # alternative was measured (VERDICT r8 #5, BASELINE.md r9
        # journal) and lost.
        from faxe_spark.operators.common import barrier

        counts = barrier(
            corpus.groupBy(*part).agg(F.count(F.lit(1)).alias("_n")))
        q = q.join(F.broadcast(counts), list(part))
        nb = F.greatest(F.lit(1), F.ceil(F.col("_n") / F.lit(block_size))) \
            .cast("int")
    else:
        n = corpus.count()  # adaptive probe: picks the tile grid
        nb = F.lit(max(1, math.ceil(n / block_size)))
    q = (q.withColumn("_nb", nb)
         .withColumn("_c", F.pmod(F.xxhash64("_id"), F.col("_nb")).cast("int")))

    # one row per (vector, partner block): group (i,j) receives exactly
    # the vectors of blocks i and j, each once. A single-block
    # partition contributes exactly one row (sequence(0,0)).
    tagged = (q.select("_id", "_v", "_c", "_nb", *part,
                       F.explode(F.sequence(F.lit(0), F.col("_nb") - 1))
                       .alias("_t"))
              .withColumn("_gi", F.least("_c", "_t"))
              .withColumn("_gj", F.greatest("_c", "_t")))
    pack_col = part[0] if part else None
    if part:
        # SMALL-KEY PACKING (r7): a partition that fits ONE block would
        # otherwise become its own Arrow group — an IoT-shaped corpus
        # (millions of short series keys) pays per-group applyInPandas
        # overhead n_keys times for tiny GEMMs. Single-block keys keep
        # their one tagged row but regroup under (_pc=NULL, _gi=pack
        # bucket, _gj=-1), each bucket scored per REAL key inside the
        # tile fn with IDENTICAL arithmetic (the shared _self_pairs
        # helper) — pair-for-pair equal to the per-key tile, pinned by
        # tests/test_similarity_ivf.py. One groupBy, one subtree: the
        # first (two-lane union) form recomputed the whole upstream
        # window-build per lane. The bucket count sizes each packed
        # group to ~block_size rows — the SAME per-group memory bound
        # the tiled lane enforces (2nd review pass: a parallelism-based
        # count left group size O(small_rows/npack), unbounded at the
        # exact millions-of-keys scale this lane exists for); the
        # one-row aggregate over `counts` that computes it is the part
        # lane's analog of the no-part branch's corpus.count() probe.
        # _gj=-1 can't collide with tiled groups (real block indexes
        # are non-negative). NULL partition values never pair in
        # EITHER lane (the counts equi-join and the pure-Column lane's
        # equi-self-join both drop them — consistent semantics).
        small_rows = (counts.filter(F.col("_n") <= block_size)
                      .agg(F.sum("_n")).collect()[0][0]) or 0
        npack = max(1, math.ceil(small_rows / block_size))
        is_small = F.col("_nb") == 1
        pack = F.pmod(F.xxhash64(F.col(pack_col).cast("string")),
                      F.lit(npack)).cast("int")
        tagged = (tagged
                  .withColumn("_pc", F.when(is_small, F.lit(None))
                              .otherwise(F.col(pack_col)))
                  .withColumn("_gi", F.when(is_small, pack)
                              .otherwise(F.col("_gi")))
                  .withColumn("_gj", F.when(is_small, F.lit(-1))
                              .otherwise(F.col("_gj"))))
        group_cols = ["_pc", "_gi", "_gj"]
    else:
        group_cols = ["_gi", "_gj"]

    def tile(key, tbl):
        # ARROW-NATIVE boundary (r11 wave 9, guide §4.2): the pandas
        # form paid one numpy-object allocation PER ROW converting the
        # list<double> column (plus a pandas frame build per group);
        # Arrow hands the same bytes as one flat child buffer that
        # reshapes into the GEMM input (interleaved A/B on the sf0.1
        # ts shape: 1.46 -> 1.25 s kernel pass, exceptAll = 0 both
        # ways). All per-key arithmetic below is the SAME numpy code
        # on the SAME float64 values — bit-identical by construction.
        import numpy as np
        import pyarrow as pa

        i, j = _key_py(key)[-2:]
        thr = threshold

        def score(X, Y):
            dots = X @ Y.T
            norms_x = np.sqrt((X * X).sum(axis=1))
            norms_y = np.sqrt((Y * Y).sum(axis=1))
            return dots / np.outer(norms_x, norms_y)

        def self_pairs_np(ids, X):
            # the ONE self-pair arithmetic, shared by the diagonal
            # tile and the packed per-key segment loop (2nd review
            # pass r7: two copies would have to stay bit-identical by
            # discipline). ids must be sorted unique; returns
            # upper-triangle (id_a < id_b) thresholded arrays.
            cos = score(X, X)
            ia, ib = np.triu_indices(len(ids), k=1)
            keep = cos[ia, ib] >= thr
            return ids[ia[keep]], ids[ib[keep]], cos[ia[keep], ib[keep]]

        blk_type = tbl.schema.field(pack_col).type if emit_block else None

        def table(ida, idb, cos, blk_vals):
            out = {"id_a": pa.array(np.asarray(ida, dtype=np.int64)),
                   "id_b": pa.array(np.asarray(idb, dtype=np.int64)),
                   "cosine": pa.array(np.asarray(cos, dtype=np.float64))}
            if emit_block:
                out[block_col] = pa.array(blk_vals, type=blk_type)
            return pa.table(out)

        def emit(ida, idb, cos, blk):
            # finisher (numpy contract) then the ONE table build per
            # tile group — r8 3rd wave: the packed lane used to build
            # a pandas frame PER KEY, which dominated the bucket at
            # the IoT shape (micro-bench: 24.7 -> 4.7 ms/bucket)
            if pair_finisher is not None and len(cos):
                ida, idb, cos = pair_finisher(ida, idb, cos)
            return table(ida, idb, cos, [blk] * len(cos))

        empty = table([], [], [], [])
        if j == -1:
            # packed bucket of single-block partitions: ONE flatten +
            # stable (key, id) sort for the whole bucket, then a
            # numpy-only per-key segment loop — identical per-key
            # arithmetic (self_pairs_np), none of the per-key pandas
            # (groupby / drop_duplicates / frame build) the r7 form
            # paid n_keys times
            ids_all = _arrow_np(tbl.column("_id"))
            keys_all = _arrow_np(tbl.column(pack_col))
            order = np.lexsort((ids_all, keys_all))  # stable
            ids_all, keys_all = ids_all[order], keys_all[order]
            # keep-first dedup of (key, id) — matches the r7
            # drop_duplicates semantics (stable sort preserves input
            # order among equals)
            uniq = np.r_[True, (keys_all[1:] != keys_all[:-1])
                         | (ids_all[1:] != ids_all[:-1])]
            ids_all, keys_all = ids_all[uniq], keys_all[uniq]
            X_all = _arrow_mat(tbl.column("_v"), idx=order[uniq])
            cuts = np.flatnonzero(np.r_[True, keys_all[1:] != keys_all[:-1],
                                        True])
            outs = []
            for s, e in zip(cuts[:-1], cuts[1:]):
                if e - s < 2:
                    continue
                ida, idb, cos = self_pairs_np(ids_all[s:e], X_all[s:e])
                if pair_finisher is not None and len(cos):
                    ida, idb, cos = pair_finisher(ida, idb, cos)
                if len(cos):
                    outs.append((ida, idb, cos,
                                 np.full(len(cos), keys_all[s])))
            if not outs:
                return empty
            return table(np.concatenate([o[0] for o in outs]),
                         np.concatenate([o[1] for o in outs]),
                         np.concatenate([o[2] for o in outs]),
                         np.concatenate([o[3] for o in outs])
                         if emit_block else [])
        if i == j:
            if tbl.num_rows < 2:
                return empty
            ids = _arrow_np(tbl.column("_id"))
            order = np.lexsort((ids,))
            ids = ids[order]
            uniq = np.r_[True, ids[1:] != ids[:-1]]
            ids = ids[uniq]
            if len(ids) < 2:
                return empty
            X = _arrow_mat(tbl.column("_v"), idx=order[uniq])
            return emit(*self_pairs_np(ids, X), _key_py(key)[0])
        c = _arrow_np(tbl.column("_c"))
        li = np.flatnonzero(c == i)
        ri = np.flatnonzero(c == j)
        if not len(li) or not len(ri):
            return empty
        lid = _arrow_np(tbl.column("_id"), idx=li)
        rid = _arrow_np(tbl.column("_id"), idx=ri)
        X = _arrow_mat(tbl.column("_v"), idx=li)
        Y = _arrow_mat(tbl.column("_v"), idx=ri)
        cos = score(X, Y)
        ia, ib = np.nonzero(cos >= thr)
        a_ids, b_ids = lid[ia], rid[ib]
        lo = np.minimum(a_ids, b_ids)
        hi = np.maximum(a_ids, b_ids)
        return emit(lo, hi, cos[ia, ib], _key_py(key)[0])

    out_schema = "id_a long, id_b long, cosine double"
    if emit_block:
        btype = corpus.schema[block_col].dataType.simpleString()
        out_schema += f", {block_col} {btype}"
    # project the tile's actual inputs before the exchange (guide §2.3:
    # _nb/_t fed only the group-index derivation and were dead weight
    # in the shuffle)
    tile_cols = [*group_cols, "_id", "_v", "_c"]
    if part and pack_col not in tile_cols:
        tile_cols.append(pack_col)
    return (tagged.select(*tile_cols).groupBy(*group_cols)
            .applyInArrow(tile, out_schema))


def assign_probes(corpus: DataFrame, centroids, *, id_col: str,
                  nprobe: int, vec_col: str = "_cv") -> DataFrame:
    """assign_lists plus the probe set in the SAME Arrow pass: output
    (id_col, _cid, _probes) where _cid is the nearest centroid (the
    vector's own inverted list) and _probes the next `nprobe - 1`
    nearest list ids. Tie-break matches assign_lists' argmax (stable
    sort on the negated scores breaks score ties toward the lower
    centroid id), so _cid is bit-identical to the single-list path."""
    import numpy as np

    bc = _centroid_broadcast(corpus.sparkSession.sparkContext, centroids)

    def assign(batches):
        # mapInArrow (r11 wave 10): see assign_lists. The probe-set
        # list column is built directly from the (n, nprobe-1) int32
        # slab (one offsets array, no per-row list objects).
        import pyarrow as pa

        C = bc.value
        half = 0.5 * (C * C).sum(axis=1)
        for rb in batches:
            V = _arrow_mat(rb.column(vec_col))
            # out-of-place: the zero-copy Arrow view is read-only
            V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True),
                               1e-12)
            order = np.argsort(-(V @ C.T - half[None, :]), axis=1,
                               kind="stable").astype(np.int32)
            probes = np.ascontiguousarray(order[:, 1:nprobe])
            n, w = probes.shape
            offsets = pa.array(np.arange(n + 1, dtype=np.int32) * w)
            yield pa.RecordBatch.from_pydict({
                id_col: rb.column(id_col),
                "_cid": pa.array(np.ascontiguousarray(order[:, 0])),
                "_probes": pa.ListArray.from_arrays(
                    offsets, pa.array(probes.ravel()))})

    id_type = corpus.schema[id_col].dataType.simpleString()
    return (corpus.select(id_col, vec_col)
            .mapInArrow(assign, f"{id_col} {id_type}, _cid int, "
                                "_probes array<int>"))


def cosine_pairs_ivf(corpus: DataFrame, threshold: float, *,
                     nlist: int = 8, nprobe: int | None = None,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     seed: int = 42, max_iter: int = 20,
                     block_size: int = 1024) -> DataFrame:
    """Embedding near-dup pairs WITHOUT the all-pairs join — the scale
    path for cosine_pairs: IVF coarse lists generate candidates, exact
    quantized cosine decides. A pair is considered iff the two vectors
    share a coarse list, or either vector PROBES the other's list
    (its `nprobe` nearest centroids) — the multi-probe recall device
    from the FAISS IVF family, applied to pair generation instead of
    top-k, which catches the near-dups straddling a centroid boundary
    that SemDeDup's within-cluster lane misses.

    nprobe=None (or nlist) probes every list: every pair is considered
    and the result is EXACTLY cosine_pairs (the oracle lane; the
    quantized float64 GEMM is bit-exact, see cosine_pairs). Bounded
    nprobe is the 100 TB config: candidate cost drops from n^2 to
    sum(within-list n_c^2) + n * nprobe/nlist * n_c, output-
    proportional in practice.

    Shape: one driver-side trainer sample (hash_sample_matrix), one
    Arrow pass for assignment+probes, the within-list pairs reuse
    cosine_pairs' per-cluster tile grid, and the cross-list stage is
    the shared _range_pairs kernel (two-sided tile grid per probed
    list). distinct() is safe because both directions of a twice-found
    pair compute identical float64 bits from exact integer dots."""
    X = hash_sample_matrix(corpus, id_col=id_col, vec_col=vec_col,
                           what="cosine_pairs_ivf")
    centroids = _lloyds(X, k=nlist, iters=max_iter, seed=seed)
    if nprobe is None:
        nprobe = nlist
    nprobe = max(1, min(nprobe, nlist))

    from faxe_spark.operators.common import barrier

    c = corpus.select(F.col(id_col).cast("long").alias("_id"),
                      _as_double(F.col(vec_col)).alias("_cv"),
                      quantize_vec(F.col(vec_col)).alias("_vq"))
    # BARRIER the assignment pass: `ap` is referenced by the within
    # lane (clustered), the probers and the members — mapInPandas
    # subtrees are opaque to Catalyst, so each reference re-ran the
    # whole Arrow assignment (plan read r11: 9 MapInPandas nodes for
    # one logical pass). The materialized rows are (id, cid, probes)
    # — a few ints per vector, the smallest frame in the op.
    ap = barrier(assign_probes(c, centroids, id_col="_id",
                               nprobe=nprobe))
    clustered = (corpus
                 .select(F.col(id_col), F.col(vec_col),
                         F.col(id_col).cast("long").alias("_id"))
                 .join(ap.select("_id", "_cid"), "_id").drop("_id"))
    within = cosine_pairs(clustered, threshold, id_col=id_col,
                          vec_col=vec_col, block_size=block_size,
                          block_col="_cid")
    if nprobe == 1:
        return within

    # cross-list stage: probers (own list excluded — within pairs are
    # the lane above) against each probed list's members
    probers = (c.join(ap.select("_id", "_probes"), "_id")
               .select(F.explode("_probes").alias("_pid"),
                       F.col("_id").alias("_qid"),
                       F.col("_vq").alias("_qvs")))
    members = (c.join(ap.select("_id", "_cid"), "_id")
               .select(F.col("_cid").alias("_pid"),
                       F.col("_id").alias("_mid"),
                       F.col("_vq").alias("_mvs")))
    rp = _range_pairs(probers, members, threshold,
                      block_size=block_size, id_col="_mid",
                      query_id_col="_qid", q_type="bigint")
    cross = (rp.select(F.least("_qid", "_mid").alias("id_a"),
                       F.greatest("_qid", "_mid").alias("id_b"),
                       "cosine")
             .distinct())
    return within.unionByName(cross)


def _range_pairs(probers: DataFrame, members: DataFrame,
                 threshold: float, *, block_size: int, id_col: str,
                 query_id_col: str, q_type: str,
                 m_flag_col: str | None = None) -> DataFrame:
    """Tiled float64 GEMM RANGE scoring of (_pid, _qid, _qvs) probers
    against (_pid, _mid, _mvs) members, emitting every pair with
    cosine >= threshold — the shared kernel of cosine_pairs_ivf's
    cross stage, ann_index.range_query_ann_index, and the streaming
    embedding crawl loop. The tile grid blocks BOTH sides (probers by
    query-id hash, members by member-id hash; each side replicated
    across the other's blocks — the cosine_pairs structure), so one
    viral list cannot hand a single Python worker an unbounded
    np.stack. Lists with no probers or no members drop at the counts
    join. Exact over integer-quantized vectors (see cosine_pairs).

    m_flag_col: optional BOOLEAN member column carried through the
    tile into the output rows — the device that lets the crawl folds
    score old-members and in-batch-members in ONE kernel call (one
    pass over the probers, one counts pair, one Arrow stage) and
    apply the member-class predicate (smaller-id-only for in-batch)
    AFTER the GEMM instead of running the kernel twice (guide §1.2
    step 1: fewer passes over the big side)."""
    import numpy as np

    pc = probers.groupBy("_pid").agg(F.count(F.lit(1)).alias("_pn"))
    mc = members.groupBy("_pid").agg(F.count(F.lit(1)).alias("_mn"))
    counts = pc.join(mc, "_pid")
    npb = F.greatest(F.lit(1), F.ceil(F.col("_pn") / F.lit(block_size))) \
        .cast("int")
    nmb = F.greatest(F.lit(1), F.ceil(F.col("_mn") / F.lit(block_size))) \
        .cast("int")
    flags = [m_flag_col] if m_flag_col else []
    p_tagged = (probers.join(F.broadcast(counts), "_pid")
                .select("_pid",
                        F.col("_qid").cast("string").alias("_sid"),
                        "_qvs",
                        F.pmod(F.xxhash64(F.col("_qid").cast("string")),
                               npb).cast("int").alias("_pb"),
                        F.explode(F.sequence(F.lit(0), nmb - 1))
                        .alias("_mb")))
    m_tagged = (members.join(F.broadcast(counts), "_pid")
                .select("_pid", "_mid", "_mvs", *flags,
                        F.explode(F.sequence(F.lit(0), npb - 1))
                        .alias("_pb"),
                        F.pmod(F.xxhash64(F.col("_mid").cast("string")),
                               nmb).cast("int").alias("_mb")))
    both = (p_tagged.select(
        "_pid", "_pb", "_mb", F.lit(1).alias("_side"), "_sid", "_qvs",
        F.lit(None).cast(members.schema["_mid"].dataType).alias("_mid"),
        F.lit(None).cast(members.schema["_mvs"].dataType).alias("_mvs"),
        *[F.lit(None).cast("boolean").alias(c) for c in flags])
        .unionByName(m_tagged.select(
            "_pid", "_pb", "_mb", F.lit(0).alias("_side"),
            F.lit(None).cast("string").alias("_sid"),
            F.lit(None).cast(p_tagged.schema["_qvs"].dataType)
            .alias("_qvs"), "_mid", "_mvs", *flags)))

    thr = threshold
    m_type = members.schema["_mid"].dataType.simpleString()
    out_schema = (f"{query_id_col} string, {id_col} {m_type}, "
                  "cosine double" + "".join(f", {c} boolean"
                                            for c in flags))

    def tile(key, tbl):
        # ARROW-NATIVE boundary (r11 wave 9) — same conversion as the
        # cosine_pairs tile: no per-row numpy objects for the vector
        # columns, no pandas frame build; identical numpy arithmetic
        # on identical float64 values (see cosine_pairs tile note).
        import pyarrow as pa

        mid_type = tbl.schema.field("_mid").type

        def out_table(qid, mid, cos, fl):
            out = {query_id_col: pa.array(qid, type=pa.string()),
                   id_col: pa.array(mid, type=mid_type),
                   "cosine": pa.array(np.asarray(cos, dtype=np.float64))}
            for c in flags:
                out[c] = pa.array(fl[c], type=pa.bool_())
            return pa.table(out)

        from faxe_spark.operators.similarity import _arrow_mat, _arrow_np

        side = _arrow_np(tbl.column("_side"))
        li = np.flatnonzero(side == 1)
        ri = np.flatnonzero(side == 0)
        if not len(li) or not len(ri):
            return out_table([], [], [], {c: [] for c in flags})
        qid = _arrow_np(tbl.column("_sid"), idx=li)
        mid = _arrow_np(tbl.column("_mid"), idx=ri)
        X = _arrow_mat(tbl.column("_qvs"), idx=li)
        Y = _arrow_mat(tbl.column("_mvs"), idx=ri)
        dots = X @ Y.T
        nx = np.sqrt((X * X).sum(axis=1))
        ny = np.sqrt((Y * Y).sum(axis=1))
        cos = dots / np.outer(nx, ny)
        ia, ib = np.nonzero(cos >= thr)
        return out_table(qid[ia], mid[ib], cos[ia, ib],
                         {c: _arrow_np(tbl.column(c), idx=ri)[ib]
                          for c in flags})

    return (both.groupBy("_pid", "_pb", "_mb")
            .applyInArrow(tile, out_schema)
            .withColumn(query_id_col,
                        F.col(query_id_col).cast(q_type)))


def semantic_dedup(corpus: DataFrame, threshold: float, *,
                   nlist: int = 1, id_col: str = "vec_id",
                   vec_col: str = "embedding", seed: int = 42,
                   max_iter: int = 20,
                   block_size: int | None = 1024) -> DataFrame:
    """SemDeDup-style embedding-space deduplication (Abbas et al. 2023):
    k-means partition -> exact cosine pairs WITHIN each cluster ->
    connected components -> one canonical keeper (min id) per group.
    Returns every corpus row as (id, component, keep).

    nlist=1 is EXACT (single cluster == exhaustive all-pairs) — the
    oracle-checkable lane. nlist>1 is the scale path: pair cost drops
    from n^2 to sum(n_c^2); recall loss is only pairs straddling a
    centroid boundary (measured in tests/test_trainprep.py). At 100 TB:
    the quantizer trains on a bounded hash sample driver-side (the
    FAISS coarse-quantizer strategy, see cosine_ivf_topk), assignment
    is one broadcast-GEMM scan, and the within-cluster tiles are
    independent applyInPandas tasks keyed by (cluster, tile)."""
    from faxe_spark.operators.dedup import connected_components

    import numpy as np

    if nlist > 1:
        # ONE trainer-input kernel (review find: this block previously
        # re-implemented hash_sample_matrix line-for-line — a future
        # sampling-contract change would have silently diverged this
        # quantizer from every other trainer in the family)
        X = hash_sample_matrix(corpus, id_col=id_col, vec_col=vec_col,
                               what="semantic_dedup")
        centroids = _lloyds(X, k=nlist, iters=max_iter, seed=seed)
        # ONE assignment kernel (VERDICT r7 #7): route through
        # assign_lists — same GEMM argmax, and its content-keyed
        # broadcast cache instead of a fresh uncached broadcast (the
        # exact leak pattern ADVICE r6 #4 fixed elsewhere)
        assigned = assign_lists(
            corpus.select(id_col, _as_double(F.col(vec_col)).alias("_cv")),
            centroids, id_col=id_col)
        clustered = corpus.join(assigned, id_col)
        pairs = cosine_pairs(clustered, threshold, id_col=id_col,
                             vec_col=vec_col, block_size=block_size,
                             block_col="_cid")
    else:
        pairs = cosine_pairs(corpus, threshold, id_col=id_col,
                             vec_col=vec_col, block_size=block_size)
    comp = connected_components(pairs.select("id_a", "id_b"))
    # singleton fallback: cast the id to the COMPONENT's type (long for
    # the blocked GEMM lane, the id's own type for block_size=None) so
    # non-numeric ids don't null out isolated docs
    comp_t = comp.schema["component"].dataType
    out = (corpus.select(F.col(id_col))
           .join(comp.withColumnRenamed("node", id_col), id_col, "left")
           .withColumn("component",
                       F.coalesce("component", F.col(id_col).cast(comp_t)))
           .withColumn("keep",
                       F.col("component") == F.col(id_col).cast(comp_t)))
    return out


# ---------------------------------------------------------------------------
# Product quantization (PQ): the memory side of billion-scale ANN.
# IVF (above) prunes WHICH vectors to score; PQ compresses HOW they are
# stored — m uint8 codes instead of dim floats (e.g. 64x for 64-dim
# float32 at m=8), scored against a per-query lookup table (ADC).
# FAISS IVFPQ layout, rebuilt from the public papers (Jegou et al. 2011).
# ---------------------------------------------------------------------------

def _argmin_sq_dist(X, C):
    """Row-wise argmin_j ||x - c_j||^2 via the GEMM expansion
    ||x||^2 - 2 x.c_j + ||c_j||^2 (||x||^2 is constant per row, so it
    drops out of the argmin). Peak memory is the (n, ksub) score
    matrix — the broadcast (n, ksub, dsub) difference tensor the naive
    form materializes is ksub*dsub/1 times larger and made the
    degenerate exact-codebook probes (ksub = corpus size) page the
    machine at x10. Ties break to the lowest index, same as the naive
    np.argmin."""
    import numpy as np

    scores = X @ C.T - 0.5 * (C * C).sum(axis=1)[None, :]
    return np.argmax(scores, axis=1)


def pq_train(corpus: DataFrame, *, vec_col: str = "embedding",
             id_col: str = "vec_id", m: int = 8, ksub: int = 16,
             seed: int = 42, max_iter: int = 20):
    """Train per-subspace codebooks driver-side over a deterministic
    hash sample (the coarse-trainer strategy of cosine_ivf_topk: PQ
    codebooks train on ~100k vectors regardless of corpus size).
    Vectors are unit-normalized first, so inner products against the
    codes approximate cosine. Returns numpy (m, ksub, dim//m)."""
    import numpy as np

    X = hash_sample_matrix(corpus, id_col=id_col, vec_col=vec_col,
                           what="pq_train")
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"pq_train: dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = np.stack([
        _lloyds(X[:, j * dsub:(j + 1) * dsub], k=ksub, iters=max_iter,
                seed=seed + j)
        for j in range(m)
    ])
    return books


def pq_encode(corpus: DataFrame, codebooks, *, vec_col: str = "embedding",
              id_col: str = "vec_id") -> DataFrame:
    """Assign every vector its m nearest-subcentroid codes — one
    broadcast-GEMM scan per batch (mapInPandas), output (id, codes:
    array<int>). At 100 TB the codes ARE the stored index."""
    import numpy as np

    bc = corpus.sparkSession.sparkContext.broadcast(codebooks)

    def enc(batches):
        # mapInArrow (r11 wave 10): see assign_lists — the code rows
        # are emitted as one list column from the (n, m) int64 slab.
        import pyarrow as pa

        B = bc.value                      # (m, ksub, dsub)
        m_, _, dsub = B.shape
        for rb in batches:
            V = _arrow_mat(rb.column("_v"))
            V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True),
                               1e-12)
            codes = np.empty((len(V), m_), dtype=np.int64)
            for j in range(m_):
                sub = V[:, j * dsub:(j + 1) * dsub]          # (n, dsub)
                codes[:, j] = _argmin_sq_dist(sub, B[j])
            offsets = pa.array(np.arange(len(V) + 1, dtype=np.int32) * m_)
            yield pa.RecordBatch.from_pydict({
                id_col: rb.column(id_col),
                "codes": pa.ListArray.from_arrays(
                    offsets, pa.array(codes.ravel()))})

    id_type = corpus.schema[id_col].dataType.simpleString()
    return (corpus.select(id_col, _as_double(F.col(vec_col)).alias("_v"))
            .mapInArrow(enc, f"{id_col} {id_type}, codes array<bigint>"))


def pq_adc_topk(codes: DataFrame, queries: DataFrame, codebooks, k: int, *,
                vec_col: str = "embedding", id_col: str = "vec_id",
                query_id_col: str = "query_id",
                exclude_self: bool = True) -> DataFrame:
    """Asymmetric-distance top-k: per query, an (m, ksub) lookup table
    of subspace inner products; each candidate scores as m table
    gathers + a sum — never touching the original vectors. Queries
    broadcast with their LUTs; candidates stream through one Arrow
    pass; the per-query top-k is the same window as cosine_topk.
    Output: (query_id, vec_id, adc_score, rank).

    exclude_self drops candidates whose id equals the query id — the
    right default when queries are drawn FROM the corpus (the ann_*
    convention here); pass False when query ids live in a separate id
    space, where a numeric collision would otherwise silently eat a
    legitimate neighbor (r4 advice)."""
    import numpy as np
    from pyspark.sql.window import Window

    B = codebooks
    m_, ksub, dsub = B.shape
    qrows = (queries.select(F.col(id_col).alias(query_id_col),
                            _as_double(F.col(vec_col)).alias("_qv"))
             .collect())
    if not qrows:
        raise ValueError("pq_adc_topk: empty queries DataFrame")
    Q = np.array([r[1] for r in qrows], dtype=np.float64)
    Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    luts = np.stack([
        np.stack([B[j] @ Q[i, j * dsub:(j + 1) * dsub] for j in range(m_)])
        for i in range(len(qrows))
    ])                                   # (nq, m, ksub)
    qids = [r[0] for r in qrows]
    bc = codes.sparkSession.sparkContext.broadcast((qids, luts))

    def score(batches):
        import pandas as pd

        qids_, luts_ = bc.value
        for pdf in batches:
            C = np.array(list(pdf["codes"]), dtype=np.int64)  # (n, m)
            out_id, out_q, out_s = [], [], []
            for qi, qid in enumerate(qids_):
                s = luts_[qi][np.arange(C.shape[1])[None, :], C].sum(axis=1)
                out_id.extend(pdf[pdf.columns[0]])
                out_q.extend([qid] * len(C))
                out_s.extend(s)
            yield pd.DataFrame({query_id_col: out_q,
                                pdf.columns[0]: out_id,
                                "adc_score": out_s})

    id_type = codes.schema[codes.columns[0]].dataType.simpleString()
    # the query id type comes from the QUERIES side: with
    # exclude_self=False the two id spaces may be different types
    q_type = queries.schema[id_col].dataType.simpleString()
    scored = codes.mapInPandas(
        score, f"{query_id_col} {q_type}, {codes.columns[0]} {id_type}, "
               "adc_score double")
    if exclude_self:
        scored = scored.filter(F.col(query_id_col) != F.col(codes.columns[0]))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("adc_score").desc(), F.col(codes.columns[0]))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def pq_exact_codebook(corpus: DataFrame, *, vec_col: str = "embedding",
                      id_col: str = "vec_id"):
    """Degenerate m=1 codebook holding EVERY (unit-normalized) corpus
    vector as its own centroid — the configuration under which PQ is
    provably exact: pq_encode assigns each vector to itself (distance
    0) and the ADC lookup returns the true cosine, so pq_adc_topk must
    reproduce brute-force ranks bit-for-bit. This is the PQ analog of
    ann_ivf_full_probe's nprobe=nlist identity: a correctness probe
    for the machinery, never a deployment configuration (the codebook
    is the corpus). Normalization uses the same numpy formula as
    pq_encode so self-distances are exactly zero."""
    import numpy as np

    rows = (corpus.select(id_col, _as_double(F.col(vec_col)).alias("_v"))
            .orderBy(id_col).collect())
    if not rows:
        raise ValueError("pq_exact_codebook: empty corpus")
    X = np.array([r[1] for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    return X[None, :, :]                       # (m=1, ksub=n, dsub=dim)


# ---------------------------------------------------------------------------
# IVFPQ: the full billion-scale composition — IVF coarse lists prune
# WHICH vectors are scored, PQ residual codes compress HOW they are
# stored, ADC scores candidates from a per-query lookup table without
# touching a single original vector. FAISS IVFPQ layout (Jegou et al.
# 2011, by_residual variant), rebuilt on Spark: one mapInPandas pass
# builds the index (assign + residual-encode), probing is a broadcast
# of per-query (probe set, LUT, centroid dots).
# ---------------------------------------------------------------------------

def ivfpq_index(corpus: DataFrame, *, vec_col: str = "embedding",
                id_col: str = "vec_id", nlist: int = 64, m: int = 8,
                ksub: int = 16, seed: int = 42, max_iter: int = 20,
                coarse=None, codebooks=None):
    """Train coarse + residual quantizers and encode the corpus.

    Returns (coarse (nlist, dim), codebooks (m, ksub, dim//m),
    codes_df (id, _cid, codes)). Training is driver-side over a
    deterministic hash sample (the cosine_ivf_topk strategy — FAISS
    trains on ~100k vectors regardless of corpus size); encoding is
    ONE Arrow pass: normalize, nearest-centroid assign, PQ-encode the
    RESIDUAL x - c[cid] (residual codes carry far more precision than
    raw codes at the same bit budget — the by_residual default).
    At 100 TB the codes ARE the stored index, partitioned by _cid so
    a probe prunes to its lists."""
    import numpy as np

    if coarse is None or codebooks is None:
        # the training sample is only needed when something trains —
        # the re-encode path (both quantizers supplied) skips the
        # corpus sort+collect entirely (round-5 review find)
        X = hash_sample_matrix(corpus, id_col=id_col, vec_col=vec_col,
                               what="ivfpq_index")
        dim = X.shape[1]
        if coarse is None:
            coarse = _lloyds(X, k=nlist, iters=max_iter, seed=seed)
    if codebooks is None:
        if dim % m:
            raise ValueError(
                f"ivfpq_index: dim {dim} not divisible by m={m}")
        dsub = dim // m
        half = 0.5 * (coarse * coarse).sum(axis=1)
        resid = X - coarse[np.argmax(X @ coarse.T - half[None, :],
                                     axis=1)]
        books = np.stack([
            _lloyds(resid[:, j * dsub:(j + 1) * dsub], k=ksub,
                    iters=max_iter, seed=seed + 1 + j)
            for j in range(m)
        ])
    else:
        # pre-built books (e.g. ivfpq_exact_residual_codebook): skip
        # training, keep only the encode pass
        books = codebooks

    bc = corpus.sparkSession.sparkContext.broadcast((coarse, books))

    def enc(batches):
        # mapInArrow (r11 wave 10): see assign_lists / pq_encode.
        import pyarrow as pa

        C, B = bc.value
        h = 0.5 * (C * C).sum(axis=1)
        m_, _, ds = B.shape
        for rb in batches:
            V = _arrow_mat(rb.column("_v"))
            V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True),
                               1e-12)
            cid = np.argmax(V @ C.T - h[None, :], axis=1)
            R = V - C[cid]
            codes = np.empty((len(V), m_), dtype=np.int64)
            for j in range(m_):
                sub = R[:, j * ds:(j + 1) * ds]
                codes[:, j] = _argmin_sq_dist(sub, B[j])
            offsets = pa.array(np.arange(len(V) + 1, dtype=np.int32) * m_)
            yield pa.RecordBatch.from_pydict({
                id_col: rb.column(id_col),
                "_cid": pa.array(cid.astype(np.int32)),
                "codes": pa.ListArray.from_arrays(
                    offsets, pa.array(codes.ravel()))})

    id_type = corpus.schema[id_col].dataType.simpleString()
    codes_df = (corpus.select(id_col,
                              _as_double(F.col(vec_col)).alias("_v"))
                .mapInArrow(enc, f"{id_col} {id_type}, _cid int, "
                                 "codes array<bigint>"))
    return coarse, books, codes_df


def ivfpq_exact_residual_codebook(corpus: DataFrame, coarse, *,
                                  vec_col: str = "embedding",
                                  id_col: str = "vec_id"):
    """Degenerate m=1 residual codebook holding EVERY corpus residual
    as its own centroid — the configuration under which IVFPQ/ADC is
    provably exact (score = q·c[cid] + q·residual = true cosine), the
    IVFPQ analog of pq_exact_codebook. Probe machinery only."""
    import numpy as np

    rows = (corpus.select(id_col, _as_double(F.col(vec_col)).alias("_v"))
            .orderBy(id_col).collect())
    if not rows:
        raise ValueError("ivfpq_exact_residual_codebook: empty corpus")
    X = np.array([r[1] for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    half = 0.5 * (coarse * coarse).sum(axis=1)
    resid = X - coarse[np.argmax(X @ coarse.T - half[None, :], axis=1)]
    return resid[None, :, :]                   # (m=1, ksub=n, dsub=dim)


def ivfpq_topk(codes_df: DataFrame, queries: DataFrame, coarse, codebooks,
               k: int, *, nprobe: int = 8, vec_col: str = "embedding",
               id_col: str = "vec_id", query_id_col: str = "query_id",
               exclude_self: bool = True, _prefetched=None) -> DataFrame:
    """IVFPQ search: per query, rank the coarse centroids, keep the
    `nprobe` nearest lists, and ADC-score ONLY candidates in those
    lists. With residual codes the score decomposes as
    q·c[cid] + sum_m LUT[m][code_m] where the LUT is query-only (the
    residual base cancels into the centroid-dot term), so one (m,
    ksub) table per query serves every probed list. Output:
    (query_id, vec_id, adc_score, rank) — the pq_adc_topk contract;
    nprobe=nlist degenerates to scoring every candidate (the
    exactness-probe configuration)."""
    import numpy as np
    from pyspark.sql.window import Window

    B = codebooks
    m_, ksub, dsub = B.shape
    # _prefetched: the already-collected (qid, vec) rows, so a caller
    # that had to collect the batch anyway (ann_index._query_ivfpq
    # derives its partition-prune set from them) doesn't pay a second
    # driver collect of the same frame
    qrows = (_prefetched if _prefetched is not None else
             (queries.select(F.col(id_col).alias(query_id_col),
                             _as_double(F.col(vec_col)).alias("_qv"))
              .collect()))
    if not qrows:
        raise ValueError("ivfpq_topk: empty queries DataFrame")
    Q = np.array([r[1] for r in qrows], dtype=np.float64)
    Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    qC = Q @ coarse.T                          # (nq, nlist): q·c terms
    # probe sets: nprobe nearest centroids on the unit sphere
    # (||q-c||^2 = |q|^2+|c|^2-2qc -> rank by qc - ||c||^2/2 desc)
    half = 0.5 * (coarse * coarse).sum(axis=1)
    order = np.argsort(-(qC - half[None, :]), axis=1, kind="stable")
    probe_sets = [set(map(int, order[i, :nprobe])) for i in range(len(Q))]
    luts = np.stack([
        np.stack([B[j] @ Q[i, j * dsub:(j + 1) * dsub]
                  for j in range(m_)])
        for i in range(len(qrows))
    ])                                         # (nq, m, ksub)
    qids = [r[0] for r in qrows]
    bc = codes_df.sparkSession.sparkContext.broadcast(
        (qids, luts, qC, probe_sets))

    def score(batches):
        import pandas as pd

        qids_, luts_, qC_, probes_ = bc.value
        for pdf in batches:
            C = np.array(list(pdf["codes"]), dtype=np.int64)
            cids = pdf["_cid"].to_numpy(dtype=np.int64)
            cand_ids = pdf[pdf.columns[0]].to_numpy()
            out_q, out_id, out_s = [], [], []
            for qi, qid in enumerate(qids_):
                mask = np.isin(cids, list(probes_[qi]))
                if not mask.any():
                    continue
                sub = C[mask]
                s = (qC_[qi][cids[mask]]
                     + luts_[qi][np.arange(sub.shape[1])[None, :], sub]
                     .sum(axis=1))
                out_q.extend([qid] * int(mask.sum()))
                out_id.extend(cand_ids[mask])
                out_s.extend(s)
            yield pd.DataFrame({query_id_col: out_q,
                                pdf.columns[0]: out_id,
                                "adc_score": out_s})

    id_type = codes_df.schema[codes_df.columns[0]].dataType.simpleString()
    q_type = queries.schema[id_col].dataType.simpleString()
    scored = codes_df.mapInPandas(
        score, f"{query_id_col} {q_type}, {codes_df.columns[0]} "
               f"{id_type}, adc_score double")
    if exclude_self:
        scored = scored.filter(
            F.col(query_id_col) != F.col(codes_df.columns[0]))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("adc_score").desc(), F.col(codes_df.columns[0]))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
