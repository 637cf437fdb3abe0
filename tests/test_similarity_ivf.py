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
