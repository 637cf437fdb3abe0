"""ngram_jaccard_pairs picks its physical strategy adaptively (dense
64-bit mask / dense array<bigint> bitmap / sparse prefix-filtered
inverted index). All three must be output-equivalent — the strategy is
a physical choice, never a semantic one."""

from __future__ import annotations

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
