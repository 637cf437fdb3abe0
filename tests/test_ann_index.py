"""ANN index lifecycle (build once / query many) — equivalence with
the one-shot operators, durability across reload, and the scale
contract: the query phase runs no training/encode stage and scans only
the probed partitions (VERDICT r5 next-round item #2)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from faxe_spark.operators import ann_index as ax
from faxe_spark.operators import similarity as sim
from faxe_spark.tables import load_table

from conftest import SF_SMOKE


def _rows(df, score_col):
    return sorted(
        (r["query_id"], r["vec_id"], r["rank"], round(r[score_col], 9))
        for r in df.collect())


def test_ivf_index_query_matches_one_shot(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    one_shot = sim.cosine_ivf_topk(emb, queries, 5, nlist=8, nprobe=3,
                                   seed=42, quantize=True)
    try:
        idx = ax.build_ivf_index(spark, emb, name="t_annix_eq", nlist=8,
                                 seed=42, quantize=True)
        reused = ax.query_ann_index(queries, idx, 5, nprobe=3)
        assert _rows(reused, "cosine") == _rows(one_shot, "cosine")
    finally:
        ax.drop_ann_index(spark, "t_annix_eq")


def test_ivf_query_phase_prunes_and_never_encodes(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    try:
        idx = ax.build_ivf_index(spark, emb, name="t_annix_plan",
                                 nlist=8, seed=42)
        queries = emb.filter(F.col("vec_id") < 3)
        out = ax.query_ann_index(queries, idx, 5, nprobe=2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # no Arrow stage at all in the IVF-flat query phase: training
        # and assignment happened at build time only
        assert "MapInPandas" not in plan, plan
        assert "ArrowEvalPython" not in plan, plan
        # the lists scan is partition-pruned to the probed _cid values
        assert "PartitionFilters" in plan and "_cid" in plan, plan
        probed = {c for lst in ax._probe_sets_spark_mirror(
            [r["_qv"] for r in queries.select(
                sim._as_double(F.col("embedding")).alias("_qv")).collect()],
            idx.centroids, 2) for c in lst}
        assert len(probed) < idx.nlist  # genuinely partial probe
        files = (out.select(F.input_file_name().alias("f"))
                 .distinct().collect())
        cids_read = {int(f["f"].split("_cid=")[1].split("/")[0])
                     for f in files if "_cid=" in f["f"]}
        assert cids_read <= probed, (cids_read, probed)
    finally:
        ax.drop_ann_index(spark, "t_annix_plan")


def test_ann_index_survives_reload(spark):
    import numpy as np

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    try:
        built = ax.build_ivf_index(spark, emb, name="t_annix_dur",
                                   nlist=8, seed=42, quantize=True)
        before = _rows(ax.query_ann_index(queries, built, 5, nprobe=3),
                       "cosine")
        loaded = ax.load_ann_index(spark, "t_annix_dur")
        assert loaded.kind == "ivf_flat" and loaded.quantize
        assert loaded.id_col == "vec_id" and loaded.id_type == "bigint"
        assert np.array_equal(loaded.centroids, built.centroids)
        after = _rows(ax.query_ann_index(queries, loaded, 5, nprobe=3),
                      "cosine")
        assert after == before
    finally:
        ax.drop_ann_index(spark, "t_annix_dur")


def test_ivfpq_index_query_matches_one_shot(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    coarse, books, codes = sim.ivfpq_index(emb, nlist=8, m=8, ksub=4,
                                           seed=42)
    one_shot = sim.ivfpq_topk(codes, queries, coarse, books, 5, nprobe=3)
    try:
        idx = ax.build_ivfpq_index(spark, emb, name="t_annix_pq",
                                   nlist=8, m=8, ksub=4, seed=42)
        reused = ax.query_ann_index(queries, idx, 5, nprobe=3)
        assert _rows(reused, "adc_score") == _rows(one_shot, "adc_score")
        # reload path reconstructs the codebook tensor shape exactly
        loaded = ax.load_ann_index(spark, "t_annix_pq")
        assert loaded.codebooks.shape == books.shape
        again = ax.query_ann_index(queries, loaded, 5, nprobe=3)
        assert _rows(again, "adc_score") == _rows(one_shot, "adc_score")
    finally:
        ax.drop_ann_index(spark, "t_annix_pq")


def test_query_ann_index_empty_queries_raises(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    try:
        idx = ax.build_ivf_index(spark, emb, name="t_annix_empty",
                                 nlist=4, seed=42)
        with pytest.raises(ValueError, match="empty queries"):
            ax.query_ann_index(emb.filter(F.col("vec_id") < 0), idx, 5)
    finally:
        ax.drop_ann_index(spark, "t_annix_empty")


def test_add_to_ivf_index_equals_full_build(spark):
    """Incremental ADD (build A, add B, frozen quantizer) is
    row-identical to building A ∪ B with the same centroids —
    assignment depends only on the centroids, so when a vector is
    encoded doesn't matter. Queries over both must agree exactly."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)
    queries = emb.filter(F.col("vec_id") < 10)
    try:
        inc = ax.build_ivf_index(spark, half_a, name="t_annix_add",
                                 nlist=8, seed=42, quantize=True)
        ax.add_to_ann_index(spark, inc, half_b)
        full = ax.build_ivf_index(spark, emb, name="t_annix_full",
                                  quantize=True, centroids=inc.centroids)
        got = _rows(ax.query_ann_index(queries, inc, 5, nprobe=3), "cosine")
        want = _rows(ax.query_ann_index(queries, full, 5, nprobe=3),
                     "cosine")
        assert got == want and len(got) == 50
        # the added rows really landed in the persisted lists
        lists = spark.read.parquet(
            ax._table_path(spark, inc.lists_table))
        assert lists.count() == emb.count()
    finally:
        ax.drop_ann_index(spark, "t_annix_add")
        ax.drop_ann_index(spark, "t_annix_full")


def test_add_to_ivfpq_index_equals_full_build(spark):
    """The IVFPQ edition: residual-PQ encoding with frozen coarse +
    codebook quantizers commutes with batching."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)
    queries = emb.filter(F.col("vec_id") < 10)
    try:
        inc = ax.build_ivfpq_index(spark, half_a, name="t_annix_pqadd",
                                   nlist=8, m=8, ksub=4, seed=42)
        ax.add_to_ann_index(spark, inc, half_b)
        # one-shot reference over the full corpus with the SAME frozen
        # quantizers
        _, _, codes = sim.ivfpq_index(emb, coarse=inc.centroids,
                                      codebooks=inc.codebooks)
        want = _rows(sim.ivfpq_topk(codes, queries, inc.centroids,
                                    inc.codebooks, 5, nprobe=3),
                     "adc_score")
        got = _rows(ax.query_ann_index(queries, inc, 5, nprobe=3),
                    "adc_score")
        assert got == want and len(got) == 50
    finally:
        ax.drop_ann_index(spark, "t_annix_pqadd")


def test_query_ids_may_differ_in_type_from_corpus(spark):
    """Review round 6: with exclude_self=False the query id space is
    independent of the corpus id space (the pq_adc_topk contract) —
    string query ids against a bigint-id corpus must work on BOTH
    index kinds."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = (emb.filter(F.col("vec_id") < 3)
               .select(F.concat(F.lit("q"),
                                F.col("vec_id").cast("string"))
                       .alias("vec_id"), "embedding"))
    try:
        ivf = ax.build_ivf_index(spark, emb, name="t_annix_qt",
                                 nlist=4, seed=42)
        out = ax.query_ann_index(queries, ivf, 3, nprobe=4,
                                 exclude_self=False)
        got = {r["query_id"] for r in out.collect()}
        assert got == {"q0", "q1", "q2"}
        pq = ax.build_ivfpq_index(spark, emb, name="t_annix_qt2",
                                  nlist=4, m=8, ksub=4, seed=42)
        out2 = ax.query_ann_index(queries, pq, 3, nprobe=4,
                                  exclude_self=False)
        assert {r["query_id"] for r in out2.collect()} == {"q0", "q1", "q2"}
    finally:
        ax.drop_ann_index(spark, "t_annix_qt")
        ax.drop_ann_index(spark, "t_annix_qt2")


def test_embedding_neardup_incremental_chain_replay_barrier(spark):
    """The vector crawl loop at threshold 0.7 (~45.6deg) over crafted
    2D unit vectors (A at 0deg, B at 30deg, C at 60deg: A~B=0.866 and
    B~C=0.866 but A~C=0.5 — NOT a pair): B drops via the index, C
    drops ONLY through dropped-B's in-batch earlier id (the chain
    rule); a verbatim replay drops via the index across batches; and
    far-away vectors (180deg, 270deg) survive every batch — which
    also proves the materialization barrier (without it, a batch
    would see its own add and drop wholesale)."""
    from faxe_spark.operators import ann_index as annix

    A = [1.0, 0.0]
    B = [0.8660254, 0.5]
    C = [0.5, 0.8660254]
    D = [-1.0, 0.0]
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "vec_id long, embedding array<double>")
    name = "nd_incr_test"
    try:
        f1, idx = annix.embedding_neardup_incremental(
            mk([(1, A)]), None, threshold=0.7, name=name, nlist=2)
        assert [r.vec_id for r in f1.collect()] == [1]

        f2, idx = annix.embedding_neardup_incremental(
            mk([(10, B), (11, C), (12, D)]), idx, threshold=0.7)
        assert sorted(r.vec_id for r in f2.collect()) == [12], \
            "B drops via index-A; C drops via dropped in-batch B"

        f3, idx = annix.embedding_neardup_incremental(
            mk([(20, A), (21, [0.0, -1.0])]), idx, threshold=0.7)
        assert sorted(r.vec_id for r in f3.collect()) == [21], \
            "replayed A drops via the index; the fresh vector survives"
    finally:
        annix.drop_ann_index(spark, name)


def test_range_query_refuses_ivfpq_and_empty(spark):
    import pytest

    from faxe_spark.operators import ann_index as annix

    emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
           .filter("vec_id < 40"))
    name = "range_refusal_test"
    try:
        annix.build_ivfpq_index(spark, emb, name=name, nlist=2, m=8,
                                ksub=4)
        idx = annix.load_ann_index(spark, name)
        with pytest.raises(ValueError, match="not a cosine"):
            annix.range_query_ann_index(emb, idx, 0.5)
        annix.drop_ann_index(spark, name)
        flat = annix.build_ivf_index(spark, emb, name=name, nlist=2,
                                     quantize=True)
        with pytest.raises(ValueError, match="empty queries"):
            annix.range_query_ann_index(emb.filter("vec_id < 0"),
                                        flat, 0.5)
    finally:
        annix.drop_ann_index(spark, name)


def test_embedding_neardup_incremental_string_ids(spark):
    """Crawl ids are often URLs/hashes, not numbers: the loop must run
    end-to-end on string ids (review-found crash: the early in-batch
    lane routed through cosine_pairs' long cast). Same geometry as the
    chain test; 'earlier in batch' = lexicographically smaller id."""
    from faxe_spark.operators import ann_index as annix

    A = [1.0, 0.0]
    B = [0.8660254, 0.5]
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "vec_id string, embedding array<double>")
    name = "nd_incr_str_test"
    try:
        f1, idx = annix.embedding_neardup_incremental(
            mk([("url/a", A), ("url/b", B)]), None, threshold=0.7,
            name=name, nlist=2)
        assert sorted(r.vec_id for r in f1.collect()) == ["url/a"], \
            "url/b drops via in-batch lexicographically-earlier url/a"
        f2, idx = annix.embedding_neardup_incremental(
            mk([("url/c", A),                 # replay: drops via index
                ("url/d", [0.0, -1.0])]), idx, threshold=0.7)
        assert sorted(r.vec_id for r in f2.collect()) == ["url/d"]
    finally:
        annix.drop_ann_index(spark, name)


def test_parquet_read_is_append_isolated(spark, tmp_path):
    """Engine contract the lazy crawl folds rely on (r11): a parquet
    DataFrame freezes its file listing at creation, so rows appended
    to the same (partitioned) path AFTERWARDS are invisible to it.
    embedding_neardup_incremental keeps its drop computation fully
    lazy across the add-phase append on the strength of this — if an
    engine upgrade ever starts re-listing, this fails loudly and the
    eager barrier must come back."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "append_isolated")
    (spark.range(0, 10).withColumn("_cid", (F.col("id") % 2).cast("int"))
     .write.mode("overwrite").partitionBy("_cid").parquet(p))
    before = spark.read.parquet(p)
    (spark.range(100, 110)
     .withColumn("_cid", (F.col("id") % 2).cast("int"))
     .write.mode("append").partitionBy("_cid").parquet(p))
    assert before.count() == 10, "pre-append DataFrame must not re-list"
    assert spark.read.parquet(p).count() == 20
