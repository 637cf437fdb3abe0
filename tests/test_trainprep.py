"""Training-prep operators: decontamination, sequence packing,
repetition quality (operators/trainprep.py, text.py round-4 additions).
The registry oracles cover value equality vs DuckDB; these tests cover
semantics (planted fixtures), invariants, and plan shape."""

import random

import pyspark.sql.functions as F

from faxe_spark.operators import text as text_ops
from faxe_spark.operators import trainprep as tp


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string")


# -- repetition quality -----------------------------------------------------

def test_repetition_fractions_crafted(spark):
    df = _docs(spark, [
        (1, "a a a a", "s"),             # 4 words, 1 distinct
        (2, "w x y z", "s"),             # all unique
        (3, "solo", "s"),                # too short for 2-grams
        (4, "p q p q p q", "s"),         # 2-grams: 5 total, 2 distinct
    ])
    out = {r.doc_id: r for r in text_ops.repetition_features(df).collect()}
    assert out[1].dup_word_frac == 0.75
    assert out[1].dup_2gram_frac == 1.0 - 1.0 / 3.0
    assert out[2].dup_word_frac == 0.0 and out[2].repetition_ok
    assert out[3].dup_2gram_frac == 0.0 and out[3].dup_3gram_frac == 0.0
    assert out[4].dup_2gram_frac == 1.0 - 2.0 / 5.0
    assert not out[1].repetition_ok  # 0.75 > 0.7 word threshold


def test_repetition_is_scan_stage_only(spark):
    """No shuffle: the whole computation is projections over the scan."""
    df = _docs(spark, [(1, "a b c", "s")])
    plan = text_ops.repetition_features(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


# -- decontamination --------------------------------------------------------

def test_decontaminate_flags_planted_overlap(spark):
    secret = "alpha beta gamma delta epsilon"  # one 5-gram
    bench = _docs(spark, [(100, f"intro {secret} outro", "bench")])
    train = _docs(spark, [
        (1, f"prefix words {secret} suffix words", "train"),  # contaminated
        (2, "totally different text with no overlap at all", "train"),
        (3, "alpha beta gamma but not the full gram", "train"),  # 4-gram only
    ])
    out = {r.doc_id: r for r in
           tp.decontaminate(train, bench, n=5).collect()}
    assert out[1].contaminated and out[1].n_contaminated_ngrams == 1
    assert not out[2].contaminated and out[2].n_contaminated_ngrams == 0
    assert not out[3].contaminated


def test_decontaminate_broadcasts_benchmark(spark):
    """100 TB shape: the benchmark n-gram set must reach the training
    side as a broadcast, never a shuffle of the big side's grams."""
    bench = _docs(spark, [(100, "a b c d e f", "bench")])
    train = _docs(spark, [(1, "a b c d e f g", "train")])
    plan = tp.decontaminate(train, bench, n=5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


# -- packing ----------------------------------------------------------------

def _rand_docs(n, seed=7):
    rng = random.Random(seed)
    return [(i, " ".join("w" for _ in range(rng.randint(1, 700))),
             f"s{i % 3}") for i in range(n)]


def _ref_greedy(rows, budget):
    """Reference greedy packer (plain python) for equivalence checks."""
    out = {}
    by_src = {}
    for doc_id, text, src in sorted(rows):
        by_src.setdefault(src, []).append((doc_id, len(text.split())))
    for src, docs in by_src.items():
        pid, cur = 0, 0
        for doc_id, t in docs:
            if cur > 0 and cur + t > budget:
                pid, cur = pid + 1, 0
            cur += t
            out[doc_id] = (pid, cur)
    return out


def test_pack_greedy_matches_reference(spark):
    rows = _rand_docs(60)
    got = {r.doc_id: (r.pack_id, r.pack_used) for r in
           tp.pack_greedy(_docs(spark, rows), budget=512).collect()}
    assert got == _ref_greedy(rows, 512)


def test_pack_greedy_budget_invariant(spark):
    rows = _rand_docs(80, seed=13)
    for r in tp.pack_greedy(_docs(spark, rows), budget=512).collect():
        # a pack only exceeds the budget when a single doc does
        assert r.pack_used <= 512 or r.pack_used == r.n_tokens


def test_pack_chunked_layout_reconstructs(spark):
    rows = _rand_docs(50, seed=21)
    out = tp.pack_chunked(_docs(spark, rows), budget=512,
                          by="source").collect()
    by_src = {}
    for r in sorted(out, key=lambda r: (r.source, r.doc_id)):
        start = by_src.get(r.source, 0)
        # the doc's first token sits exactly at the running total
        assert r.pack_first * 512 + r.pack_offset == start
        end = start + r.n_tokens
        assert r.pack_last == (end - 1) // 512
        by_src[r.source] = end


def test_pack_stats_fill_ratio(spark):
    rows = _rand_docs(60, seed=3)
    packed = tp.pack_greedy(_docs(spark, rows), budget=512)
    stats = {r.source: r for r in
             tp.pack_stats(packed, budget=512).collect()}
    for src, r in stats.items():
        assert 0 < r.fill_ratio <= 1.5  # >1 only via oversized docs
        assert r.total_tokens == sum(
            len(t.split()) for _, t, s in rows if s == src)


def test_pack_greedy_null_text_rows(spark):
    """Review r4: NULL text = 0 tokens (was a NaN crash in the Arrow
    batch); 0-token docs never open a new pack on their own."""
    df = _docs(spark, [(1, None, "s"), (2, "w " * 600, "s"),
                       (3, "w w w", "s")])
    rows = {r.doc_id: r for r in tp.pack_greedy(df, budget=512).collect()}
    assert rows[1].n_tokens == 0 and rows[1].pack_id == 0
    # doc 2 is over budget but the current pack is still empty -> it
    # stays in pack 0 (cur > 0 guard)
    assert rows[2].pack_id == 0
    assert rows[3].pack_id == 1


# -- PII scrubbing (round 4, second wave) -----------------------------------

def test_pii_scrub_crafted(spark):
    df = _docs(spark, [
        (1, "mail a.b+c@ex-1.org or +49-123-4567 at 10.0.0.1 end", "s"),
        (2, "no pii here 1234", "s"),
    ])
    out = {r.doc_id: r for r in text_ops.pii_features(df).collect()}
    assert (out[1].n_email, out[1].n_phone, out[1].n_ipv4) == (1, 1, 1)
    assert out[1].scrubbed == "mail <EMAIL> or <PHONE> at <IPV4> end"
    assert (out[2].n_email, out[2].n_phone, out[2].n_ipv4) == (0, 0, 0)
    assert out[2].scrubbed == "no pii here 1234"


def test_pii_scrub_is_scan_stage_only(spark):
    df = _docs(spark, [(1, "x@y.zz", "s")])
    plan = text_ops.pii_features(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


# -- boilerplate removal ----------------------------------------------------

_HDR = "one two three four five six seven eight"  # exactly one 8-word chunk


def test_boilerplate_removes_shared_chunks(spark):
    df = _docs(spark, [
        (1, f"{_HDR} unique tail words", "s"),
        (2, f"{_HDR} other body", "s"),
        (3, "entirely different text with nothing shared at all ok", "s"),
    ])
    out = {r.doc_id: r for r in tp.boilerplate_remove(df).collect()}
    assert out[1].n_chunks == 2 and out[1].n_removed == 1
    assert out[1].clean_text == "unique tail words"
    assert out[2].clean_text == "other body"
    # 9 words -> 2 chunks (8 + 1), nothing shared: rebuilt verbatim
    assert out[3].n_chunks == 2 and out[3].n_removed == 0
    assert out[3].clean_text == \
        "entirely different text with nothing shared at all ok"


def test_boilerplate_rebuild_preserves_order(spark):
    body = " ".join(f"w{i}" for i in range(24))  # 3 chunks, all unique
    df = _docs(spark, [(1, body, "s"), (2, "unrelated words here", "s")])
    out = {r.doc_id: r for r in tp.boilerplate_remove(df).collect()}
    assert out[1].clean_text == body and out[1].n_removed == 0


def test_boilerplate_fully_removed_doc(spark):
    df = _docs(spark, [(1, _HDR, "s"), (2, _HDR, "s"),
                       (3, "normal body text", "s")])
    out = {r.doc_id: r for r in tp.boilerplate_remove(df).collect()}
    assert out[1].clean_text == "" and out[1].n_removed == 1


# -- domain-mixture sampling ------------------------------------------------

def test_mix_sample_rates_and_determinism(spark):
    rows = [(i, "t", ["a", "b", "c"][i % 3]) for i in range(3000)]
    df = _docs(spark, rows)
    weights = {"a": 1.0, "b": 0.5, "c": 0.0}
    kept = tp.mix_sample(df, weights).collect()
    by_src = {}
    for r in kept:
        by_src[r.source] = by_src.get(r.source, 0) + 1
    assert by_src["a"] == 1000           # rate 1.0 keeps everything
    assert "c" not in by_src             # rate 0.0 keeps nothing
    # md5 uniformity: 1000 Bernoulli(0.5) within 6 sigma (~95)
    assert abs(by_src["b"] - 500) < 95
    again = {r.doc_id for r in tp.mix_sample(df, weights).collect()}
    assert again == {r.doc_id for r in kept}


def test_mix_sample_default_rate_and_plan(spark):
    df = _docs(spark, [(i, "t", "unknown") for i in range(100)])
    assert tp.mix_sample(df, {"a": 0.5}).count() == 100  # default 1.0
    assert tp.mix_sample(df, {"a": 0.5}, default_rate=0.0).count() == 0
    plan = tp.mix_sample(df, {"a": 0.5})._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan  # scan-stage filter, no shuffle


def test_mix_sample_rate_monotone(spark):
    """A doc kept at rate r is kept at every rate >= r (thresholds are
    nested), so mixtures can be re-weighted without resampling churn."""
    df = _docs(spark, [(i, "t", "a") for i in range(500)])
    kept_25 = {r.doc_id for r in tp.mix_sample(df, {"a": 0.25}).collect()}
    kept_50 = {r.doc_id for r in tp.mix_sample(df, {"a": 0.5}).collect()}
    assert kept_25 <= kept_50


# -- semantic dedup ---------------------------------------------------------

def test_semantic_dedup_clustered_refines_exact(spark):
    from faxe_spark.operators import similarity as sim

    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    exact = {r.vec_id: r for r in
             sim.semantic_dedup(emb, 0.35, nlist=1).collect()}
    approx = {r.vec_id: r for r in
              sim.semantic_dedup(emb, 0.35, nlist=4).collect()}
    assert set(exact) == set(approx)
    # every clustered component maps into exactly one exact component
    # (within-cluster pairs are a subset of all pairs)
    mapping = {}
    for vid, r in approx.items():
        prev = mapping.setdefault(r.component, exact[vid].component)
        assert prev == exact[vid].component
    # missing cross-cluster pairs can only SPLIT components -> the
    # clustered lane never keeps fewer docs than exact
    n_exact = sum(1 for r in exact.values() if r.keep)
    n_approx = sum(1 for r in approx.values() if r.keep)
    assert n_approx >= n_exact
    # recall floor on this corpus: dup mass found by 4 clusters
    dropped_exact = len(exact) - n_exact
    dropped_approx = len(approx) - n_approx
    if dropped_exact:
        assert dropped_approx / dropped_exact >= 0.5


# -- corpus bigram-LM novelty ----------------------------------------------

def test_lm_novelty_crafted(spark):
    """3-doc corpus with hand-countable bigram stats: 'a b' occurs in
    docs 1+2 (corpus count 2 <= rare_max 2 -> rare), 'a c' only in
    doc 3 (count 1 -> rare). p('b'|'a') = 2/3, p('c'|'a') = 1/3."""
    df = _docs(spark, [
        (1, "a b", "s"), (2, "a b", "s"), (3, "a c", "s"), (4, "solo", "s"),
    ])
    out = {r.doc_id: r for r in text_ops.lm_novelty(df).collect()}
    assert out[1].n_bigrams == 1 and out[1].n_rare == 1
    assert out[1].min_p == out[1].max_p == 2.0 / 3.0
    assert out[3].min_p == out[3].max_p == 1.0 / 3.0
    # a single-word doc has no bigrams -> zero counts, NULL extremes
    assert out[4].n_bigrams == 0 and out[4].n_rare == 0
    assert out[4].min_p is None and out[4].max_p is None
    # perplexity proxy: doc 3's only transition is less probable
    assert out[3].mean_neglogp > out[1].mean_neglogp


def test_lm_novelty_rare_threshold(spark):
    df = _docs(spark, [(i, "x y", "s") for i in range(5)])  # count 5
    out = text_ops.lm_novelty(df, rare_max_count=2).collect()
    assert all(r.n_rare == 0 for r in out)          # 5 > 2: not rare
    out = text_ops.lm_novelty(df, rare_max_count=5).collect()
    assert all(r.n_rare == 1 for r in out)


def test_boilerplate_null_text_kept(spark):
    """Review: NULL text must not vanish from the output — it reads as
    an empty doc (one '' chunk)."""
    df = _docs(spark, [(1, None, "s"), (2, "some normal words", "s")])
    out = {r.doc_id: r for r in tp.boilerplate_remove(df).collect()}
    assert set(out) == {1, 2}
    assert out[1].n_chunks == 1 and out[1].clean_text == ""


def test_mix_sample_null_domain_uses_default(spark):
    """Review: NULL domain/key must take default_rate, not be dropped
    by NULL comparison propagation."""
    df = _docs(spark, [(1, "t", None), (None, "t", "a"), (3, "t", "b")])
    assert tp.mix_sample(df, {"b": 1.0}).count() == 3   # default 1.0
    kept = tp.mix_sample(df, {"b": 1.0}, default_rate=0.0).collect()
    assert {r.doc_id for r in kept} == {3}              # only weighted dom


# -- URL normalization ------------------------------------------------------

def test_url_features_crafted(spark):
    df = spark.createDataFrame(
        [(1, "https://WWW.Ex.COM:443/A/b?utm_source=x&id=7&utm_x=y#frag"),
         (2, "http://ex.com:80?utm_a=1"),
         (3, "ftp://files.ex.com/pub/data.bin"),
         (4, "not a url at all")],
        "doc_id long, url string")
    out = {r.doc_id: r for r in text_ops.url_features(df).collect()}
    assert out[1].scheme == "https" and out[1].host == "ex.com"
    assert out[1].path == "/A/b"                  # path case preserved
    assert out[1].clean_url == "https://WWW.Ex.COM/A/b?id=7"
    assert out[1].n_params == 1
    assert out[2].clean_url == "http://ex.com"
    assert out[2].n_params == 0
    assert out[3].host == "files.ex.com" and out[3].scheme == "ftp"
    assert out[4].host == "" and out[4].clean_url == "not a url at all"


def test_url_normalize_is_scan_stage_only(spark):
    df = spark.createDataFrame([(1, "https://a.b/c")], "doc_id long, url string")
    plan = text_ops.url_features(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_boilerplate_carry_cols(spark):
    """carry_cols threads per-doc columns through the rebuild (the
    self-join-free way to keep metadata with the cleaned text)."""
    df = _docs(spark, [(1, f"{_HDR} tail words", "sA"),
                       (2, f"{_HDR} other", "sB")])
    out = {r.doc_id: r for r in
           tp.boilerplate_remove(df, carry_cols=("source",)).collect()}
    assert out[1].source == "sA" and out[2].source == "sB"
    assert out[1].clean_text == "tail words"


# -- hashed linear quality classifier ---------------------------------------

def test_hashed_linear_score_deterministic_and_bounded(spark):
    df = _docs(spark, [(1, "alpha beta gamma", "s"), (2, "alpha", "s"),
                       (3, "x " * 200, "s")])
    out = {r.doc_id: r for r in text_ops.hashed_linear_score(df).collect()}
    again = {r.doc_id: r for r in text_ops.hashed_linear_score(df).collect()}
    for i in out:
        assert out[i].score == again[i].score          # pure function
        assert abs(out[i].score) <= 1.0                # mean of [-1,1]
        assert out[i].keep == (out[i].score > 0)
    # 3 words -> 3 unigram + 2 bigram features
    assert out[1].n_features == 5 and out[2].n_features == 1
    # seed changes the model
    other = {r.doc_id: r for r in
             text_ops.hashed_linear_score(df, seed="z").collect()}
    assert any(out[i].score != other[i].score for i in out)


def test_hashed_linear_score_is_scan_stage_only(spark):
    df = _docs(spark, [(1, "a b", "s")])
    plan = text_ops.hashed_linear_score(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


# -- mixture planning -------------------------------------------------------

def test_plan_mixture_fits_no_replacement(spark):
    """Default budget = the largest total every share can fill without
    upsampling: the scarcest-relative domain lands at rate 1.0, the
    others scale down proportionally."""
    rows = ([(i, "w " * 100, "web") for i in range(90)]      # 9000 tok
            + [(100 + i, "w " * 100, "code") for i in range(10)])  # 1000 tok
    df = _docs(spark, rows)
    rates = tp.plan_mixture(df, {"web": 0.5, "code": 0.5})
    # budget = min(9000/.5, 1000/.5) = 2000 -> code: 1.0, web: 1000/9000
    assert rates["code"] == 1.0
    assert abs(rates["web"] - 1000.0 / 9000.0) < 1e-12
    # achieved mixture: equal expected token mass from both domains
    assert abs(rates["web"] * 9000 - rates["code"] * 1000) < 1e-6


def test_plan_mixture_composes_with_mix_sample(spark):
    rows = [(i, "w " * 10, ["a", "b"][i % 2]) for i in range(400)]
    df = _docs(spark, rows)
    rates = tp.plan_mixture(df, {"a": 0.9, "b": 0.1}, total_budget=1000)
    kept = tp.mix_sample(df, rates, default_rate=0.0)
    by = {r[0]: r[1] for r in kept.groupBy("source").count().collect()}
    # a: rate 900/2000=0.45 of 200 docs ~ 90; b: 100/2000=0.05 ~ 10
    assert 60 <= by.get("a", 0) <= 120
    assert 2 <= by.get("b", 0) <= 25


def test_duplicate_span_features_crafted(spark):
    """Two docs sharing a shifted 10-word run are caught by OVERLAPPING
    spans; a doc with unique text scores zero."""
    shared = " ".join(f"s{i}" for i in range(10))
    df = _docs(spark, [
        (1, f"pre1 {shared} tail1", "s"),            # 12 words, 3 spans
        (2, f"other lead-in {shared}", "s"),         # shifted position
        (3, " ".join(f"u{i}" for i in range(12)), "s"),
        (4, "short text", "s"),                      # < 10 words: 0 spans
    ])
    out = {r.doc_id: r for r in
           text_ops.duplicate_span_features(df, span_words=10).collect()}
    assert out[1].n_spans == 3 and out[1].n_dup_spans == 1
    assert out[2].n_dup_spans == 1                   # the shared run
    assert out[3].n_dup_spans == 0 and out[3].dup_span_frac == 0.0
    assert out[4].n_spans == 0 and out[4].dup_span_frac == 0.0


def test_exact_substring_dedup_crafted(spark):
    """Span REMOVAL semantics: the first occurrence (min (doc,pos)) of
    a duplicated region keeps every token; later occurrences lose the
    WHOLE region even when it is longer than span_words (overlapping
    grams tile it); within-doc repetition keeps only the first copy;
    unique and too-short docs pass through as normalized text."""
    shared = " ".join(f"s{i}" for i in range(16))    # 16 > span_words
    ten = " ".join(f"r{i}" for i in range(10))
    df = _docs(spark, [
        (1, f"pre1 {shared} tail1", "s"),            # first: untouched
        (2, f"other lead-in {shared}", "s"),         # later: region cut
        (3, " ".join(f"u{i}" for i in range(12)), "s"),
        (4, "Short  Text", "s"),                     # <10 words + norm
        (5, f"{ten} {ten}", "s"),                    # within-doc repeat
    ])
    out = {r.doc_id: r for r in
           text_ops.exact_substring_dedup(df, span_words=10).collect()}
    assert out[1].n_removed == 0
    assert out[1].clean_text == f"pre1 {shared} tail1"
    assert out[2].n_removed == 16                    # whole 16-word region
    assert out[2].clean_text == "other lead-in"
    assert out[3].n_removed == 0 and out[3].n_tokens == 12
    assert out[4].clean_text == "short text"         # normalized passthrough
    assert out[5].n_removed == 10                    # second copy only
    assert out[5].clean_text == ten

    # 100 TB skew guard: the canonical-occurrence pick per gram must be
    # a groupBy min (map-side partial combine) — never row_number over
    # partitionBy(gram), which sorts every instance of a viral span
    # onto one task (same rule as test_corpus_count_ops_use_partial_
    # aggregation; the DuckDB oracle may use the window form, the
    # distributed plan must not)
    plan = (text_ops.exact_substring_dedup(df, span_words=10)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan
    assert "partial_min" in plan


def test_substring_scrub_incremental_crafted(spark):
    """Crawl-time span scrubbing: a batch-2 doc repeating a batch-1
    region loses it (via the seen gram set) even though nothing in
    batch 2 itself duplicates it; new duplication WITHIN batch 2 still
    resolves by (doc,pos) order; one batch with seen=None is exactly
    the batch op."""
    from faxe_spark.operators.text import (exact_substring_dedup,
                                           substring_scrub_incremental)

    shared = " ".join(f"s{i}" for i in range(16))
    ten = " ".join(f"n{i}" for i in range(10))
    b1 = _docs(spark, [(1, f"pre1 {shared} tail1", "s"),
                       (3, " ".join(f"u{i}" for i in range(12)), "s")])
    c1, seen = substring_scrub_incremental(b1, None, span_words=10)
    got1 = {r.doc_id: r for r in c1.collect()}
    assert got1[1].n_removed == 0 and got1[3].n_removed == 0

    # seen=None ≡ the batch op, row for row
    batch = {r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
             for r in exact_substring_dedup(b1, span_words=10).collect()}
    incr = {r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
            for r in c1.collect()}
    assert batch == incr

    b2 = _docs(spark, [
        (10, f"other lead-in {shared}", "s"),   # b1 region -> cut via seen
        (11, f"{ten} alpha beta", "s"),         # first arrival of `ten`
        (12, f"gamma {ten}", "s"),              # in-batch repeat -> cut
        (13, "totally novel words here only once ever", "s"),
    ])
    c2, seen2 = substring_scrub_incremental(b2, seen, span_words=10)
    got2 = {r.doc_id: r for r in c2.collect()}
    assert got2[10].n_removed == 16
    assert got2[10].clean_text == "other lead-in"
    assert got2[11].n_removed == 0                  # first arrival keeps
    assert got2[12].n_removed == 10
    assert got2[12].clean_text == "gamma"
    assert got2[13].n_removed == 0
    # the cut region's grams were ALREADY seen: set grows only by the
    # genuinely new grams, duplicate-free
    assert seen2.count() == seen2.distinct().count()


# -- HTML extraction --------------------------------------------------------

def test_html_to_text_crafted(spark):
    df = spark.createDataFrame([
        (1, '<html><head><style>p{x}</style><script a="b">var x = "<p>";'
            '</script></head><body> <h1>Title</h1><!-- no --> '
            '<p class="c">Hello &amp; &lt;world&gt; &#39;q&#39;</p></body>'),
        (2, "plain text, no markup &amp;lt; stays escaped-once"),
        (3, "<SCRIPT>upper case</SCRIPT><P>Kept</P>"),
    ], "doc_id long, html string")
    out = {r.doc_id: r for r in df.select(
        "doc_id", text_ops.html_to_text(F.col("html")).alias("t")).collect()}
    assert out[1].t == "Title Hello & <world> 'q'"
    # &amp;lt; decodes ONE level (amp last): -> &lt; literal
    assert out[2].t == "plain text, no markup &lt; stays escaped-once"
    assert out[3].t == "Kept"  # (?i) catches uppercase SCRIPT


def test_html_to_text_is_scan_stage_only(spark):
    df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id long, html string")
    plan = df.select(text_ops.html_to_text(F.col("html")))._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_url_normalize_utm_runs_and_scheme_ports(spark):
    """Review r4: adjacent utm params are stripped in one pass
    (idempotent), and only the scheme's OWN default port drops."""
    df = spark.createDataFrame([
        (1, "https://e.com/p?utm_source=a&utm_medium=b"),
        (2, "https://e.com/p?utm_a=1&utm_b=2&utm_c=3&id=9"),
        (3, "http://ex.com:443/x"),     # NOT http's default: stays
        (4, "https://h.com:80/y"),      # NOT https's default: stays
        (5, "ftp://f.com:80/z"),        # unknown scheme: stays
    ], "doc_id long, url string")
    out = {r.doc_id: r for r in text_ops.url_features(df).collect()}
    assert out[1].clean_url == "https://e.com/p"
    assert out[2].clean_url == "https://e.com/p?id=9"
    assert out[2].n_params == 1
    assert out[3].clean_url == "http://ex.com:443/x"
    assert out[3].host == "ex.com:443"
    assert out[4].clean_url == "https://h.com:80/y"
    assert out[5].host == "f.com:80"
    # idempotence on the adversarial adjacency case
    clean_df = spark.createDataFrame([(1, out[1].clean_url),
                                      (2, out[2].clean_url)],
                                     "doc_id long, url string")
    again = {r.doc_id: r for r in text_ops.url_features(clean_df).collect()}
    assert again[1].clean_url == out[1].clean_url
    assert again[2].clean_url == out[2].clean_url


def test_plan_mixture_null_token_domain(spark):
    """Review r4: an all-NULL-text domain must not crash the planner —
    it censuses as 0 tokens and is skipped."""
    df = _docs(spark, [(1, None, "nulls"), (2, None, "nulls"),
                       (3, "w " * 50, "real")])
    rates = tp.plan_mixture(df, {"nulls": 0.5, "real": 0.5})
    assert "nulls" not in rates and rates["real"] == 1.0


def test_corpus_count_ops_use_partial_aggregation(spark):
    """100 TB skew guard: the corpus gram counts in lm_novelty and
    duplicate_span_features must go through groupBy (map-side partial
    combine; a hot stopword gram partial-aggregates) — NEVER a window
    count over partitionBy(gram), which sorts every instance of the
    hottest gram onto one task."""
    df = _docs(spark, [(i, "of the " * 20, "s") for i in range(50)])
    for out, n_count_aggs in ((text_ops.lm_novelty(df), 3),
                              (text_ops.duplicate_span_features(
                                  df, span_words=10), 2)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        # the per-doc agg alone contributes one partial_count, so the
        # corpus count subtrees must add their own (>= n_count_aggs
        # total) — a single occurrence would mean the corpus counts
        # bypassed partial aggregation
        assert plan.count("partial_count") >= n_count_aggs, \
            plan.count("partial_count")
        out.count()  # completes under a 100%-hot-gram corpus


# -- Gopher format rules (round 6) -------------------------------------------

def test_gopher_rules_crafted(spark):
    good = " ".join("the and of that with have word%d text" % (i % 7)
                    for i in range(10))            # 80 words, stopword-rich
    df = _docs(spark, [
        (1, good, "s"),
        (2, "too short to keep", "s"),             # n_words = 4 < 50
        (3, "\n".join("- item %d" % i for i in range(10)), "s"),
        (4, "one...\ntwo...\nthree\nfour", "s"),   # 2/4 ellipsis lines
        (5, good + " " + "#" * 30, "s"),           # symbol-heavy tail
        (6, " ".join(str(i) for i in range(60)), "s"),  # no alpha words
    ])
    out = {r.doc_id: r for r in text_ops.gopher_rules(df).collect()}
    assert out[1].gopher_pass and out[1].n_words == 80
    assert out[1].stop_hits >= 5 and out[1].bullet_line_frac == 0.0
    assert not out[2].gopher_pass and out[2].n_words == 4
    assert out[3].bullet_line_frac == 1.0 and not out[3].gopher_pass
    assert out[4].ellipsis_line_frac == 0.5 and not out[4].gopher_pass
    assert out[5].symbol_word_ratio > 0.1 and not out[5].gopher_pass
    assert out[6].alpha_word_frac == 0.0 and not out[6].gopher_pass


def test_gopher_rules_is_scan_stage_only(spark):
    df = _docs(spark, [(1, "a b c", "s")])
    plan = text_ops.gopher_rules(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


# -- per-host cap (round 6) ---------------------------------------------------

def test_host_cap_exact_deterministic_and_salted_equal(spark):
    """The kept set is EXACTLY the cap lowest md5(id) per host (pure
    function of the ids — reproducible across runs/engines), and the
    salted two-phase form returns the identical rows AND ranks."""
    import hashlib
    rows = [(i, "t%d" % i, "viral" if i % 4 else "host%d" % (i % 3))
            for i in range(200)]
    df = _docs(spark, rows).withColumnRenamed("source", "host")
    plain = tp.host_cap(df, cap=5)
    got = {(r.doc_id, r.host, r.host_rank) for r in plain.collect()}

    by_host = {}
    for i, _, h in rows:
        by_host.setdefault(h, []).append(i)
    want = set()
    for h, ids in by_host.items():
        ids.sort(key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        want |= {(i, h, rank + 1) for rank, i in enumerate(ids[:5])}
    assert got == want

    salted = tp.host_cap(df, cap=5, salt=7)
    assert {(r.doc_id, r.host, r.host_rank)
            for r in salted.collect()} == want


def test_host_cap_hot_host_bounded_map_side(spark):
    """Plan shape (r11): top_k no longer builds the manual salted
    pre-phase — the engine's WindowGroupLimit rewrite bounds every
    task's buffer at `cap` rows per host BEFORE the exchange (the same
    hot-host protection the salt phase bought, minus its extra
    shuffle). Pin the rewrite so an engine/config change that drops it
    fails loudly; pin the absence of the manual phase's xxhash bucket."""
    df = _docs(spark, [(i, "t", "viral") for i in range(50)]) \
        .withColumnRenamed("source", "host")
    for salt in (8, None):
        plan = tp.host_cap(df, cap=3, salt=salt)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "WindowGroupLimit" in plan
        assert "xxhash64" not in plan


# -- incremental per-host cap (round 6) ---------------------------------------

def test_host_cap_incremental_arrival_rule_and_state_bound(spark):
    """Folding the kernel over arrival batches keeps EXACTLY each
    host's first `cap` arrivals under (batch, id) order, host_rank is
    the global arrival rank, the salted lane agrees bit-for-bit, and
    the seen state never exceeds cap rows per host."""
    batches = [
        [(1, "t", "v"), (2, "t", "v"), (3, "t", "v"), (10, "t", "a")],
        [(4, "t", "v"), (11, "t", "a")],
        [(5, "t", "v"), (12, "t", "a"), (20, "t", "b")],
    ]
    for salt in (None, 4):
        seen = None
        got = {}
        for rows in batches:
            df = _docs(spark, rows).withColumnRenamed("source", "host")
            kept, seen = tp.host_cap_incremental(df, seen, cap=2,
                                                 salt=salt)
            got.update({r.doc_id: (r.host, r.host_rank)
                        for r in kept.collect()})
        # v: first 2 arrivals are 1, 2; a: 10, 11; b: 20
        assert got == {1: ("v", 1), 2: ("v", 2),
                       10: ("a", 1), 11: ("a", 2), 20: ("b", 1)}, got
        state = [r.fingerprint.split("|")[0] for r in seen.collect()]
        assert len(state) == len(got)
        from collections import Counter
        assert max(Counter(state).values()) <= 2


def test_host_cap_incremental_single_batch_matches_arrival_order(spark):
    """One batch with seen=None == keep the cap smallest ids per host."""
    rows = [(i, "t", "h%d" % (i % 3)) for i in range(30)]
    df = _docs(spark, rows).withColumnRenamed("source", "host")
    kept, _ = tp.host_cap_incremental(df, None, cap=4)
    got = {(r.doc_id, r.host_rank) for r in kept.collect()}
    want = set()
    for h in range(3):
        ids = sorted(i for i, _, hh in rows if hh == "h%d" % h)
        want |= {(i, rk + 1) for rk, i in enumerate(ids[:4])}
    assert got == want


def test_host_cap_incremental_null_host(spark):
    """NULL hosts count as one '' host: the cap is ENFORCED across
    batches for them too (a NULL fingerprint would both collapse the
    tally under distinct and fall out of the prior equi-join)."""
    b1 = _docs(spark, [(1, "t", None), (2, "t", None), (3, "t", None)]) \
        .withColumnRenamed("source", "host")
    b2 = _docs(spark, [(4, "t", None)]).withColumnRenamed("source", "host")
    kept1, seen = tp.host_cap_incremental(b1, None, cap=2)
    kept2, seen = tp.host_cap_incremental(b2, seen, cap=2)
    assert {r.doc_id for r in kept1.collect()} == {1, 2}
    assert kept2.count() == 0
    assert seen.count() == 2 and kept1.columns[-1] == "host_rank"


def test_gopher_rules_null_text_fails_closed(spark):
    df = _docs(spark, [(1, None, "s")])
    r = text_ops.gopher_rules(df).collect()[0]
    assert r.gopher_pass is False and r.stop_hits == 0


def test_host_cap_incremental_fold_property(spark):
    """Property (hypothesis): for ANY doc->host assignment, ANY batch
    split, and ANY cap, folding the kernel over the batches in order
    keeps EXACTLY each host's first `cap` arrivals under (batch, id)
    order — i.e. incrementality never changes the answer."""
    from hypothesis import given, settings, strategies as st

    assign = st.lists(
        st.tuples(st.sampled_from("vwx"),       # host
                  st.integers(0, 2)),           # batch index
        min_size=1, max_size=12)

    @settings(max_examples=12, deadline=None)
    @given(assign, st.integers(1, 3))
    def prop(rows, cap):
        docs = [(i, h, b) for i, (h, b) in enumerate(rows)]
        seen, got = None, {}
        for b in range(3):
            batch = [(i, "t", h) for i, h, bb in docs if bb == b]
            if not batch:
                continue
            df = _docs(spark, batch).withColumnRenamed("source", "host")
            kept, seen = tp.host_cap_incremental(df, seen, cap=cap)
            got.update({r.doc_id: r.host_rank for r in kept.collect()})
        want = {}
        tally = {}
        for i, h, b in sorted(docs, key=lambda d: (d[2], d[0])):
            tally[h] = tally.get(h, 0) + 1
            if tally[h] <= cap:
                want[i] = tally[h]
        assert got == want

    prop()


# -- unicode normalization + mojibake repair (round 6) ------------------------

def test_normalize_unicode_matches_duckdb_nfc(spark):
    """Cross-engine parity: stdlib unicodedata NFC == DuckDB's
    nfc_normalize on composed/decomposed/mixed inputs — the contract
    that makes NFC-then-fingerprint reproducible across engines."""
    import duckdb
    cases = [
        "café composed vs café",     # e + combining acute
        "Ångström Å",          # ring/diaeresis + ANGSTROM SIGN
        "ﬁle fi ligature stays in NFC",    # NFC must NOT decompose fi
        "plain ascii unchanged",
        "há̧cek stacking marks",
    ]
    df = _docs(spark, [(i, t, "s") for i, t in enumerate(cases)])
    got = {r.doc_id: r.text_nfc
           for r in text_ops.normalize_unicode(df).collect()}
    con = duckdb.connect()
    for i, t in enumerate(cases):
        want = con.execute("SELECT nfc_normalize(?)", [t]).fetchone()[0]
        assert got[i] == want, (i, got[i], want)
    # NULL passes through
    ndf = _docs(spark, [(9, None, "s")])
    assert text_ops.normalize_unicode(ndf).collect()[0].text_nfc is None


def test_normalize_unicode_changes_fingerprint_story(spark):
    """The reason the op exists: composed and decomposed spellings
    fingerprint apart raw, together after NFC."""
    df = _docs(spark, [(1, "café menu", "s"),
                       (2, "café menu", "s")])
    out = text_ops.normalize_unicode(df).select(
        "doc_id",
        text_ops.fingerprint(F.col("text")).alias("raw_fp"),
        text_ops.fingerprint(F.col("text_nfc")).alias("nfc_fp")).collect()
    raw = {r.doc_id: r.raw_fp for r in out}
    nfc = {r.doc_id: r.nfc_fp for r in out}
    assert raw[1] != raw[2] and nfc[1] == nfc[2]


def test_fix_mojibake_crafted_and_idempotent(spark):
    plain = "just normal text with an em dash — kept"
    single = "café ’quote’".encode("utf-8").decode("latin-1")
    double = single.encode("utf-8").decode("latin-1")
    genuine = "Ã is a real letter: São Paulo Ångström"
    df = _docs(spark, [(1, plain, "s"), (2, single, "s"),
                       (3, double, "s"), (4, genuine, "s"),
                       (5, None, "s")])
    out = {r.doc_id: r.text_fixed
           for r in text_ops.fix_mojibake(df).collect()}
    assert out[1] == plain
    assert out[2] == "café ’quote’"
    assert out[3] == "café ’quote’"   # two layers unwound
    assert out[5] is None
    # genuine Ã text: the latin-1 re-encode of 'Ã is' is not valid
    # UTF-8, so the conservative gate leaves it alone
    assert out[4] == genuine
    # idempotence: a second pass changes nothing
    df2 = _docs(spark, [(k, v, "s") for k, v in out.items()])
    out2 = {r.doc_id: r.text_fixed
            for r in text_ops.fix_mojibake(df2).collect()}
    assert out2 == out


def test_unicode_ops_are_scan_stage_only(spark):
    df = _docs(spark, [(1, "café", "s")])
    for op in (text_ops.normalize_unicode, text_ops.fix_mojibake):
        plan = op(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "ArrowEvalPython" in plan


def test_host_cap_incremental_replay_guard(spark):
    """Review find: a RE-DELIVERED already-kept doc must not be kept
    again (it would emit a duplicate state row that compaction's
    distinct() collapses, re-opening the quota and duplicating a
    host_rank)."""
    b1 = _docs(spark, [(1, "t", "v"), (9, "t", "v")]) \
        .withColumnRenamed("source", "host")
    b2 = _docs(spark, [(1, "t", "v"),            # replay of kept doc 1
                       (2, "t", "v")]) \
        .withColumnRenamed("source", "host")
    kept1, seen = tp.host_cap_incremental(b1, None, cap=3)
    kept2, seen = tp.host_cap_incremental(b2, seen, cap=3)
    assert {r.doc_id for r in kept1.collect()} == {1, 9}
    # doc 1 is NOT re-emitted; doc 2 takes rank 3 (2 prior + 1)
    assert {(r.doc_id, r.host_rank)
            for r in kept2.collect()} == {(2, 3)}
    # state holds exactly one row per kept doc — no duplicates
    fps = [r.fingerprint for r in seen.collect()]
    assert len(fps) == 3 and len(set(fps)) == 3


def test_host_cap_priority_col_ascending_contract(spark):
    """priority_col is an ASCENDING sort key (smallest kept): keeping
    best-first means passing a negated score — pinned here so the
    contract can't silently invert."""
    rows = [(i, "t", "h") for i in range(10)]
    df = _docs(spark, rows).withColumnRenamed("source", "host") \
        .withColumn("neg_quality", -F.col("doc_id"))
    kept = tp.host_cap(df, cap=3, priority_col="neg_quality")
    # highest doc_id == highest quality == smallest neg_quality
    assert {r.doc_id for r in kept.collect()} == {9, 8, 7}


# -- DSIR importance resampling ---------------------------------------------

def test_dsir_prefers_target_like_docs(spark):
    """Docs sharing the target corpus's vocabulary outscore docs that
    don't — the DSIR selection property, on a planted fixture."""
    raw = _docs(spark, [
        (1, "dog park walk dog leash park", "web"),
        (2, "quantum flux capacitor torque vector", "web"),
        (3, "dog leash walk park dog treat", "web"),
        (4, "torque flux vector tensor manifold", "web"),
    ])
    target = _docs(spark, [
        (10, "dog walk park leash", "pets"),
        (11, "dog treat park walk leash dog", "pets"),
    ])
    out = {r.doc_id: r.score
           for r in tp.dsir_score(
               raw,
               {int(w.bucket): int(w.lam)
                for w in tp.dsir_weights(raw, target).collect()}).collect()}
    assert min(out[1], out[3]) > max(out[2], out[4])
    sel = tp.dsir_resample(raw, target, k=2).collect()
    assert {r.doc_id for r in sel} == {1, 3}
    assert all(r.rank in (1, 2) for r in sel)


def test_dsir_weights_cover_every_bucket(spark):
    """The weight table always has exactly `buckets` rows (the spine),
    so a scored doc can never hit a NULL weight; dsir_score rejects a
    partial dict up front."""
    raw = _docs(spark, [(1, "a b", "s")])
    tgt = _docs(spark, [(2, "a", "s")])
    w = tp.dsir_weights(raw, tgt, buckets=32).collect()
    assert len(w) == 32 and len({r.bucket for r in w}) == 32
    import pytest as _pytest
    with _pytest.raises(ValueError, match="buckets"):
        tp.dsir_score(raw, {0: 1}, buckets=32)


def test_dsir_scoring_is_scan_stage_only(spark):
    """The selection pass's scoring is a pure scan-stage fold over the
    literal weight map: zero shuffles (the 100 TB contract in the
    docstring)."""
    raw = _docs(spark, [(1, "a b c", "s"), (2, "d e", "s")])
    tgt = _docs(spark, [(3, "a b", "s")])
    w = {int(r.bucket): int(r.lam)
         for r in tp.dsir_weights(raw, tgt).collect()}
    plan = tp.dsir_score(raw, w)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_dsir_empty_text_and_determinism(spark):
    """Empty/whitespace docs score without crashing (words('') is [''],
    one feature), and two independent runs agree exactly."""
    raw = _docs(spark, [(1, "", "s"), (2, "   ", "s"), (3, "a b a", "s")])
    tgt = _docs(spark, [(4, "a", "s")])
    a = sorted((r.doc_id, r.score_sum, r.n_features, r.score)
               for r in tp.dsir_resample(raw, tgt, k=3).collect())
    b = sorted((r.doc_id, r.score_sum, r.n_features, r.score)
               for r in tp.dsir_resample(raw, tgt, k=3).collect())
    assert a == b and len(a) == 3
    nf = {r.doc_id: r.n_features for r in tp.dsir_score(
        raw, {int(r.bucket): int(r.lam)
              for r in tp.dsir_weights(raw, tgt).collect()}).collect()}
    assert nf[1] == 1 and nf[3] == 5  # 3 words + 2 bigrams


# -- deterministic global shuffle / shards -----------------------------------

def test_shard_assign_partition_and_determinism(spark):
    rows = [(i, f"doc {i}", "s") for i in range(100)]
    df = _docs(spark, rows)
    out = tp.shard_assign(df, n_shards=4).collect()
    assert len(out) == 100                       # a partition, not a sample
    assert {r.shard for r in out} <= set(range(4))
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.shard_pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    again = tp.shard_assign(df, n_shards=4).collect()
    assert sorted((r.doc_id, r.shard, r.shard_pos) for r in out) \
        == sorted((r.doc_id, r.shard, r.shard_pos) for r in again)
    # a different seed is an independent permutation, not a relabeling
    other = tp.shard_assign(df, n_shards=4, seed="epoch2").collect()
    assert sorted((r.doc_id, r.shard) for r in out) \
        != sorted((r.doc_id, r.shard) for r in other)


def test_shard_assign_single_shuffle_plan(spark):
    """ONE Exchange (the per-shard hash partition) — the docstring's
    scale contract, asserted on _sharded_frame, the EXACT frame
    write_shards persists (review find: a hand-rebuilt pipeline would
    stay green if the writer dropped its sort)."""
    df = _docs(spark, [(i, "t", "s") for i in range(10)])
    a = tp._sharded_frame(df, n_shards=2, id_col="doc_id",
                          seed="shuffle")
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_write_shards_roundtrip_and_intra_file_order(spark, tmp_path):
    rows = [(i, f"text {i}", "s") for i in range(50)]
    df = _docs(spark, rows)
    path = str(tmp_path / "shards")
    tp.write_shards(df, path, n_shards=4)
    back = spark.read.parquet(path)
    assert back.count() == 50
    assert sorted(r.doc_id for r in back.collect()) == list(range(50))
    # shard dirs on disk match the assignment
    got = {(r.doc_id, int(r.shard)) for r in back.collect()}
    assign = tp.shard_assign(df, n_shards=4, keep_hash=True).collect()
    want = {(r.doc_id, r.shard) for r in assign}
    assert got == want
    # rows INSIDE each shard dir are in shuffle (_h) order — the
    # written-layout contract a training loader relies on (review
    # find: the set compare above can't see a dropped sort)
    order = {r.doc_id: r._h for r in assign}
    import os
    for shard_dir in sorted(os.listdir(path)):
        if not shard_dir.startswith("shard="):
            continue
        docs = [r.doc_id for r in
                spark.read.parquet(os.path.join(path, shard_dir))
                .collect()]
        assert docs == sorted(docs, key=lambda i: (order[i], i))


def test_dsir_and_shard_null_edges(spark):
    """NULL text scores as empty text (n_features=1, non-null score);
    NULL ids hash as '' and land in a REAL shard in [0, n) — not a
    NULL shard / __HIVE_DEFAULT_PARTITION__ dir (review finds)."""
    raw = _docs(spark, [(1, None, "s"), (2, "a b", "s")])
    tgt = _docs(spark, [(3, "a", "s")])
    w = {int(r.bucket): int(r.lam)
         for r in tp.dsir_weights(raw, tgt).collect()}
    out = {r.doc_id: r for r in tp.dsir_score(raw, w).collect()}
    assert out[1].n_features == 1
    assert out[1].score_sum is not None and out[1].score is not None
    rows = [(None, "t", "s"), (7, "t", "s")]
    sh = tp.shard_assign(_docs(spark, rows), n_shards=4).collect()
    assert all(r.shard is not None and 0 <= r.shard < 4 for r in sh)


def test_dsir_weights_flagged_equals_two_corpus_fit(spark):
    """dsir_weights_flagged(df, flag) == dsir_weights(df,
    df.filter(flag)) row-for-row — the one-scan labeled-subset fit
    cannot drift from the two-corpus definition."""
    df = _docs(spark, [
        (1, "dog park walk", "pets"), (2, "flux torque vector", "web"),
        (3, "dog leash", "pets"), (4, "", "web"),
    ])
    flag = F.col("source") == "pets"
    a = sorted((r.bucket, r.lam)
               for r in tp.dsir_weights_flagged(df, flag,
                                                buckets=64).collect())
    b = sorted((r.bucket, r.lam)
               for r in tp.dsir_weights(df, df.filter(flag),
                                        buckets=64).collect())
    assert a == b and len(a) == 64
    # the flagged fit reads the corpus ONCE (one scan in the plan)
    plan = tp.dsir_weights_flagged(df, flag, buckets=64) \
        ._jdf.queryExecution().executedPlan().toString()
    import re as _re
    assert len(_re.findall(r"Scan ExistingRDD|Scan parquet", plan)) <= 1
    # dsir_resample demands exactly one target form
    import pytest as _pytest
    with _pytest.raises(ValueError, match="exactly one"):
        tp.dsir_resample(df, df, k=1, target_flag=flag)
    with _pytest.raises(ValueError, match="exactly one"):
        tp.dsir_resample(df, k=1)
    # both resample forms select the same rows
    x = sorted((r.doc_id, r.score_sum, r.rank)
               for r in tp.dsir_resample(df, target_flag=flag,
                                         k=2).collect())
    y = sorted((r.doc_id, r.score_sum, r.rank)
               for r in tp.dsir_resample(df, df.filter(flag),
                                         k=2).collect())
    assert x == y


# -- property tests: the Column-expression hash math vs an independent
# pure-Python replication (hypothesis, bounded examples — the
# test_scrub_properties.py pattern) ------------------------------------------

import hashlib
import re as _re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_WORDS = st.lists(st.text(alphabet="abcxyz01", min_size=1, max_size=5),
                  min_size=0, max_size=8).map(" ".join)


def _py_norm_words(text):
    return _re.sub(r"\s+", " ", text.lower()).strip().split(" ")


def _py_bucket(feat, seed, buckets):
    h = hashlib.md5((feat + seed).encode()).hexdigest()
    return int(h[:8], 16) % buckets


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(_WORDS, min_size=1, max_size=5))
def test_dsir_score_sum_matches_python_replication(spark, texts):
    """score_sum from the JVM fold == an independent Python md5 walk
    over the same normalized unigram+bigram features — pins the whole
    expression chain (normalize, bigram build, bucket hash, map
    lookup) against a second implementation."""
    buckets = 16
    w = {b: (b * 37 - 100) for b in range(buckets)}
    df = _docs(spark, [(i, t, "s") for i, t in enumerate(texts)])
    got = {r.doc_id: (r.score_sum, r.n_features)
           for r in tp.dsir_score(df, w, buckets=buckets).collect()}
    for i, t in enumerate(texts):
        ws = _py_norm_words(t)
        feats = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        want = sum(w[_py_bucket(f, "dsir", buckets)] for f in feats)
        assert got[i] == (want, len(feats)), (t, got[i])


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(st.integers(min_value=-10**9, max_value=10**9),
                min_size=1, max_size=12, unique=True),
       st.integers(min_value=1, max_value=5))
def test_shard_assign_matches_python_replication(spark, ids, n):
    """shard and shard_pos == the independent Python md5 replication
    (incl. negative ids): shard = prefix-int % n, pos = 1-based rank
    of (md5hex, id) within the shard."""
    df = _docs(spark, [(i, "t", "s") for i in ids])
    got = {r.doc_id: (r.shard, r.shard_pos)
           for r in tp.shard_assign(df, n_shards=n).collect()}
    hexes = {i: hashlib.md5((str(i) + "shuffle").encode()).hexdigest()
             for i in ids}
    shards = {i: int(hexes[i][:8], 16) % n for i in ids}
    for i in ids:
        peers = sorted((hexes[j], j) for j in ids
                       if shards[j] == shards[i])
        want_pos = peers.index((hexes[i], i)) + 1
        assert got[i] == (shards[i], want_pos), (i, got[i])


# -- DSIR weight persistence + deterministic splits ---------------------------

def test_dsir_weights_save_load_roundtrip(spark):
    """Fit once, reuse across runs (the AnnIndex lifecycle): the
    reloaded dict scores identically to the in-session fit."""
    raw = _docs(spark, [(1, "a b c", "s"), (2, "d e", "s")])
    tgt = _docs(spark, [(3, "a b", "s")])
    wdf = tp.dsir_weights(raw, tgt, buckets=32)
    w = {int(r.bucket): int(r.lam) for r in wdf.collect()}
    tp.save_dsir_weights(spark, wdf, name="t_dsir_rt")
    try:
        back = tp.load_dsir_weights(spark, name="t_dsir_rt")
        assert back == w
        a = sorted((r.doc_id, r.score_sum) for r in
                   tp.dsir_score(raw, back, buckets=32).collect())
        b = sorted((r.doc_id, r.score_sum) for r in
                   tp.dsir_score(raw, w, buckets=32).collect())
        assert a == b
    finally:
        tp.drop_dsir_weights(spark, name="t_dsir_rt")


def test_split_assign_semantics(spark):
    """Exact cover assigns every row; subsampling cover leaves the
    remainder NULL; membership is stable under corpus growth (a doc's
    split is independent of the other docs); scan-stage plan."""
    rows = [(i, "t", "s") for i in range(400)]
    df = _docs(spark, rows)
    full = tp.split_assign(df, {"train": 0.8, "val": 0.1, "test": 0.1})
    got = {r.doc_id: r.split for r in full.collect()}
    assert set(got.values()) <= {"train", "val", "test"}
    assert None not in got.values()
    n_train = sum(1 for v in got.values() if v == "train")
    assert 0.7 * 400 < n_train < 0.9 * 400   # ~binomial, wide margin
    # subsampling: remainder unassigned, named splits keep membership
    sub = {r.doc_id: r.split for r in
           tp.split_assign(df, {"train": 0.5}).collect()}
    assert any(v is None for v in sub.values())
    assert any(v == "train" for v in sub.values())
    # growth stability: the same doc keeps its split in a bigger corpus
    big = tp.split_assign(
        _docs(spark, [(i, "t", "s") for i in range(800)]),
        {"train": 0.8, "val": 0.1, "test": 0.1})
    got_big = {r.doc_id: r.split for r in big.collect()}
    assert all(got_big[i] == got[i] for i in range(400))
    # single full split + validation errors
    one = {r.split for r in tp.split_assign(df, {"all": 1.0}).collect()}
    assert one == {"all"}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        tp.split_assign(df, {})
    with _pytest.raises(ValueError):
        tp.split_assign(df, {"a": 0.7, "b": 0.6})
    plan = full._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_shard_append_stability_and_fold(spark):
    """shard_append (crawl-loop family): epoch-1 positions NEVER
    change as later epochs land (the append-stability contract
    re-running shard_assign over the union would break); within each
    epoch the intra-shard order is the same md5 permutation
    shard_assign uses; counts state is exactly n_shards rows."""
    rows = [(i, f"doc {i}", "s") for i in range(60)]
    epochs = [rows[:20], rows[20:45], rows[45:]]

    # fold all three epochs
    counts = None
    folded = {}
    for ep in epochs:
        appended, counts = tp.shard_append(_docs(spark, ep), counts,
                                           n_shards=4)
        for r in appended.collect():
            folded[r.doc_id] = (r.shard, r.shard_pos)

    # append stability: epoch-1 alone assigns the SAME positions
    first, c1 = tp.shard_append(_docs(spark, epochs[0]), None, n_shards=4)
    for r in first.collect():
        assert folded[r.doc_id] == (r.shard, r.shard_pos)

    # shard = shard_assign's shard (same hash), positions are a dense
    # 1..n_k per shard across the whole fold
    want_shard = {r.doc_id: r.shard
                  for r in tp.shard_assign(_docs(spark, rows),
                                           n_shards=4).collect()}
    by_shard = {}
    for d, (s, p) in folded.items():
        assert want_shard[d] == s
        by_shard.setdefault(s, []).append(p)
    for s, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))

    # within-epoch order is the md5 permutation: epoch-1's positions
    # equal plain shard_assign over epoch 1
    want1 = {(r.doc_id): (r.shard, r.shard_pos)
             for r in tp.shard_assign(_docs(spark, epochs[0]),
                                      n_shards=4).collect()}
    for r in first.collect():
        assert want1[r.doc_id] == (r.shard, r.shard_pos)

    # bounded state: n_shards rows forever, totals = docs seen
    crows = counts.collect()
    assert len(crows) <= 4
    assert sum(r._cnt for r in crows) == 60


def test_shard_append_null_id_and_empty_epoch(spark):
    """NULL ids hash as '' (a REAL shard, the shard_assign hazard
    doc); an empty epoch leaves positions and state untouched."""
    appended, counts = tp.shard_append(
        _docs(spark, [(None, "t", "s"), (7, "t", "s")]), None, n_shards=4)
    rows = appended.collect()
    assert all(r.shard is not None and 0 <= r.shard < 4 for r in rows)

    empty = _docs(spark, []).filter("doc_id IS NOT NULL")
    more, counts2 = tp.shard_append(empty, counts, n_shards=4)
    assert more.count() == 0
    assert sorted(map(tuple, counts2.collect())) == \
        sorted(map(tuple, counts.collect()))


def test_dsir_select_incremental_fold_equals_global(spark):
    """dsir_select_incremental (crawl-loop family): under frozen
    weights the fold over ANY epoch split equals dsir_resample's
    global top-k (id tiebreak makes top-k fold-exact); state is
    exactly k rows; rank is recomputed at every fold."""
    rows = [(i, f"word{i % 17} common text {'target ' * (i % 5)}",
             "tgt" if i % 4 == 0 else "web") for i in range(80)]
    d = _docs(spark, rows)
    flag = F.col("source") == "tgt"
    w = {int(r.bucket): int(r.lam)
         for r in tp.dsir_weights_flagged(d, flag).collect()}

    want = sorted(
        (r.doc_id, r.score_sum, r.n_features, r.score, r.rank)
        for r in tp.dsir_resample(d, target_flag=flag, k=10)
        .select("doc_id", "score_sum", "n_features", "score", "rank")
        .collect())

    for split in (2, 3):
        best = None
        for b in range(split):
            batch = d.filter(F.col("doc_id") % split == b)
            best = tp.dsir_select_incremental(batch, best, weights=w,
                                              k=10)
        got_rows = best.collect()
        assert len(got_rows) == 10                      # k rows of state
        got = sorted((r.doc_id, r.score_sum, r.n_features, r.score,
                      r.rank) for r in got_rows)
        assert got == want, f"split={split}"


def test_split_assign_fraction_edges(spark):
    """Fractions summing over 1 raise; under 1 leaves exactly the
    remainder NULL; exactly 1 assigns every row (the float-edge
    otherwise branch — no sliver of NULL from a rounded top edge)."""
    import pytest as _pytest

    d = _docs(spark, [(i, "t", "s") for i in range(200)])
    with _pytest.raises(ValueError, match="<= 1"):
        tp.split_assign(d, {"a": 0.7, "b": 0.5})

    part = tp.split_assign(d, {"train": 0.5}).collect()
    names = {r.split for r in part}
    assert names <= {"train", None} and None in names

    full = tp.split_assign(d, {"a": 1 / 3, "b": 1 / 3, "c": 1 / 3}).collect()
    assert all(r.split is not None for r in full)
