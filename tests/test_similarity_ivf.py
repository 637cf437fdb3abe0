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
