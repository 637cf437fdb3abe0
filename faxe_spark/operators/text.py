"""Text-analysis operators for large-scale training-data pipelines.

Everything here is pure Column expressions (JVM-side, whole-stage
codegen) — at 100 TB these run inside the parquet scan stage with zero
shuffles — except the two operations Spark SQL genuinely cannot
express (Unicode normalization, mojibake repair), which run as
Arrow-batched pandas UDFs: still scan-stage projections, never
row-at-a-time Python.

Determinism contract: every Column-expression function is reproducible
in ANSI SQL (the DuckDB oracles in registry.py replicate the exact
formulas); normalize_unicode is parity-pinned against DuckDB's
nfc_normalize in tests, and fix_mojibake is a deterministic fixpoint.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# tiny per-language stopword seeds for the n-gram/stopword language
# heuristic; word-boundary regexes keep it formula-portable to SQL
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "is", "a"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "los", "es", "una", "y"],
}


def normalize_text(c: Column) -> Column:
    """Canonical form: lowercase, collapsed whitespace, trimmed."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(c: Column) -> Column:
    return F.split(F.trim(c), r"\s+")


def token_count(c: Column) -> Column:
    """Whitespace token count (the BPE-ish regex variant is
    `F.size(F.expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0)"))`)."""
    return F.size(tokens(c))


def char_count(c: Column) -> Column:
    return F.length(c)


def digit_ratio(c: Column) -> Column:
    return F.length(F.regexp_replace(c, r"[^0-9]", "")) / F.greatest(F.length(c), F.lit(1))


def punct_ratio(c: Column) -> Column:
    return (F.length(F.regexp_replace(c, r"[a-zA-Z0-9\s]", ""))
            / F.greatest(F.length(c), F.lit(1)))


def avg_word_len(c: Column) -> Column:
    t = tokens(c)
    return (F.length(F.regexp_replace(F.trim(c), r"\s+", ""))
            / F.greatest(F.size(t), F.lit(1)))


def stopword_hits(c: Column, lang: str = "en") -> Column:
    pattern = r"\b(" + "|".join(LANG_STOPWORDS[lang]) + r")\b"
    return F.regexp_count(F.lower(c), F.lit(pattern))


def stopword_ratio(c: Column, lang: str = "en") -> Column:
    return stopword_hits(c, lang) / F.greatest(token_count(c), F.lit(1))


def quality_score(c: Column) -> Column:
    """Composite [0,1] quality heuristic: long-enough, word-like, low
    punctuation/digit noise, has stopwords. Deterministic weighted sum."""
    len_score = F.least(F.length(c) / F.lit(500.0), F.lit(1.0))
    word_score = F.when((avg_word_len(c) >= 3) & (avg_word_len(c) <= 12), 1.0).otherwise(0.3)
    noise = punct_ratio(c) + digit_ratio(c)
    noise_score = F.greatest(F.lit(0.0), F.lit(1.0) - noise * 4)
    stop_score = F.least(stopword_ratio(c) * 5, F.lit(1.0))
    return (len_score * 0.25 + word_score * 0.25 + noise_score * 0.25 + stop_score * 0.25)


def lang_id(c: Column) -> Column:
    """Stopword-vote language heuristic (argmax over LANG_STOPWORDS;
    ties -> lexicographically first language; no hits -> 'und')."""
    scores = [(lang, stopword_hits(c, lang)) for lang in sorted(LANG_STOPWORDS)]
    best = None
    best_score = None
    for lang, s in scores:
        if best is None:
            best, best_score = F.lit(lang), s
        else:
            cond = s > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, s).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("und"))


def fingerprint(c: Column) -> Column:
    """Document fingerprint: md5 of the normalized text (the rolling-hash
    analog; md5 chosen for cross-engine reproducibility)."""
    return F.md5(normalize_text(c))


def words(c: Column) -> Column:
    return F.split(F.trim(normalize_text(c)), r"\s+")


def ngram_array(n: int, *, words_col: str = "_w") -> Column:
    """Word n-grams as an array<string> — pure expression, no explode.
    Indexes a MATERIALIZED words column (callers add it with
    `.withColumn("_w", words(...))` first — see repetition_features);
    index-based slicing needs a named array, which keeps the n-gram
    build inside codegen instead of an exploded (doc, gram) shuffle."""
    w = words_col
    parts = ", ' ', ".join(f"element_at({w}, i+{j})" for j in range(n))
    # NB: Spark's sequence(1, 0) DESCENDS ([1,0]) instead of being empty,
    # so a doc shorter than n words needs the explicit empty branch
    return F.expr(
        f"if(size({w}) >= {n}, "
        f"transform(sequence(1, size({w})-{n - 1}), i -> concat({parts})), "
        f"array())")


def dup_word_fraction(c: Column) -> Column:
    """Fraction of word occurrences that are repeats of an earlier word
    (Gopher-style repetition signal, word granularity)."""
    w = words(c)
    return (F.lit(1.0)
            - F.size(F.array_distinct(w)) / F.size(w)).cast("double")


def dup_ngram_fraction(n: int) -> Column:
    """Fraction of word n-grams that are duplicates — the pure-array
    formulation of Gopher's duplicate n-gram fraction (no per-doc
    groupBy; stays inside whole-stage codegen). Reads the materialized
    `_w` words column, like ngram_array."""
    total = F.expr("greatest(size(_w)-" + str(n - 1) + ", 0)")
    g = ngram_array(n)
    return F.when(total <= 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(g)) / total).cast("double")


# The eight highest-frequency English words Gopher requires a document
# to contain at least two of (Rae et al. 2021 §A1.1, "stop word filter").
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(df: DataFrame, text_col: str = "text", *,
                 min_words: int = 50, max_words: int = 100_000,
                 min_mean_word_len: float = 3.0,
                 max_mean_word_len: float = 10.0,
                 max_symbol_word_ratio: float = 0.1,
                 max_bullet_line_frac: float = 0.9,
                 max_ellipsis_line_frac: float = 0.3,
                 min_alpha_word_frac: float = 0.8,
                 min_stop_hits: int = 2) -> DataFrame:
    """Gopher document-format quality rules (Rae et al. 2021 §A1.1) —
    the canonical web-corpus keep/drop gate: word-count bounds, mean
    word length bounds, symbol-to-word ratio ('#'/'...'), fraction of
    lines that are bullets or trail off in an ellipsis, fraction of
    words with an alphabetic character, and presence of >=2 of the
    eight Gopher stop words. Complements repetition_features (the
    §A1.1 repetition half lives there).

    Every rule is a pure Column expression over the raw text — at
    100 TB this is one parquet scan stage, zero shuffles, fully inside
    whole-stage codegen; regex constructs are the portable subset
    (classes, anchors, alternation) so Java regex and RE2/DuckDB agree.
    """
    # NULL text evaluates as the empty doc: every rule fails closed
    # (gopher_pass False), never a NULL flag a downstream filter would
    # silently drop or keep depending on its polarity
    # NULL -> empty doc; then strip ALL whitespace at the edges before
    # tokenizing (review find: trim() strips ASCII spaces only, so a
    # tab/newline-only doc would still count words and a leading \t
    # would add a phantom empty token to every ratio denominator)
    c0 = F.coalesce(F.col(text_col).cast("string"), F.lit(""))
    c = F.regexp_replace(c0, r"^\s+|\s+$", "")
    w = tokens(c)
    # split('') returns [''] — report 0 words for an all-whitespace doc,
    # not 1 (review find: downstream token accounting reads this column)
    n_words = F.when(F.length(c) == 0, F.lit(0)).otherwise(F.size(w))
    safe_n = F.greatest(F.size(w), F.lit(1))
    mean_wl = avg_word_len(c)
    symbols = F.regexp_count(c, F.lit(r"#")) + F.regexp_count(c, F.lit(r"\.\.\.")) \
        + F.regexp_count(c, F.lit("…"))
    lines = F.split(c, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullet_lines = F.size(F.filter(lines, lambda x: x.rlike(r"^\s*[-*•]")))
    ellipsis_lines = F.size(F.filter(
        lines, lambda x: x.rlike(r"(\.\.\.|…)\s*$")))
    alpha_words = F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]")))
    stop_hits = None
    for sw in GOPHER_STOPWORDS:
        hit = F.when(F.lower(c).rlike(r"\b" + sw + r"\b"), 1).otherwise(0)
        stop_hits = hit if stop_hits is None else stop_hits + hit
    out = df.withColumns({
        "n_words": n_words.cast("long"),
        "mean_word_len": F.round(mean_wl, 4).cast("double"),
        "symbol_word_ratio": F.round(symbols / safe_n, 4).cast("double"),
        "bullet_line_frac": F.round(bullet_lines / n_lines, 4).cast("double"),
        "ellipsis_line_frac": F.round(ellipsis_lines / n_lines, 4).cast("double"),
        "alpha_word_frac": F.round(alpha_words / safe_n, 4).cast("double"),
        "stop_hits": stop_hits.cast("long"),
    })
    return out.withColumn(
        "gopher_pass",
        (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("symbol_word_ratio") <= max_symbol_word_ratio)
        & (F.col("bullet_line_frac") <= max_bullet_line_frac)
        & (F.col("ellipsis_line_frac") <= max_ellipsis_line_frac)
        & (F.col("alpha_word_frac") >= min_alpha_word_frac)
        & (F.col("stop_hits") >= min_stop_hits))


def repetition_features(df: DataFrame, text_col: str = "text",
                        *, max_dup_word: float = 0.7,
                        max_dup_2gram: float = 0.6) -> DataFrame:
    """Gopher-rule repetition quality (Rae et al. 2021 §A1.1 shape):
    duplicate word / 2-gram / 3-gram fractions plus a keep/drop flag.
    All pure Column expressions over one hidden `_w` token array —
    at 100 TB this runs inside the scan stage, zero shuffles."""
    c = F.col(text_col)
    out = df.withColumn("_w", words(c)).withColumns({
        "dup_word_frac": dup_word_fraction(c),
        "dup_2gram_frac": dup_ngram_fraction(2),
        "dup_3gram_frac": dup_ngram_fraction(3),
    })
    out = out.withColumn(
        "repetition_ok",
        (F.col("dup_word_frac") <= max_dup_word)
        & (F.col("dup_2gram_frac") <= max_dup_2gram))
    return out.drop("_w")


def normalize_unicode(df: DataFrame, text_col: str = "text", *,
                      form: str = "NFC",
                      out_col: str = "text_nfc") -> DataFrame:
    """Unicode normalization (NFC/NFKC/NFD/NFKD) — the step BEFORE any
    fingerprint/shingle dedup on a web corpus: 'café' composed and
    'café' decomposed must hash identically or every dedup layer
    silently treats them as distinct documents.

    Spark SQL has no normalization builtin, so this is the sanctioned
    slow path done right: an Arrow-batched pandas UDF over
    stdlib unicodedata (deterministic, version-pinned by the Python
    runtime — the same everywhere a fleet runs one image), never a
    row-at-a-time Python UDF. Still a scan-stage projection: no
    shuffle, composes with pushdown/pruning. NULL passes through as
    NULL (unknown text is not the same as empty text here — the
    fail-closed coalesce belongs to the consumer, as in gopher_rules).

    Cross-engine parity is pytest-pinned against DuckDB's
    nfc_normalize() (tests/test_trainprep.py)."""
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    # no type hints: `from __future__ import annotations` stringifies
    # them and pandas_udf can't resolve the local pd name — the legacy
    # (fn, returnType) form is Series->Series scalar by definition
    _norm = pandas_udf(
        lambda s: s.map(lambda v: v if v is None
                        else unicodedata.normalize(form, v)), "string")

    return df.withColumn(out_col, _norm(F.col(text_col)))


# Mojibake repair: UTF-8 bytes mis-decoded as Latin-1/cp1252 show up as
# 'Ã©' for 'é', 'â€™' for a right quote, etc. The repair is the exact
# inverse (re-encode latin-1, re-decode utf-8) applied ONLY when it
# round-trips cleanly AND strictly reduces the tell-tale lead bytes —
# never a lossy guess (ftfy's core heuristic, public). 'â€' is not
# covered by 'Ã'/'Â' (it is the cp1252 face of UTF-8 punctuation).
_MOJIBAKE_TELLS = ("Ã", "Â", "â€")


def fix_mojibake(df: DataFrame, text_col: str = "text", *,
                 out_col: str = "text_fixed",
                 max_passes: int = 3) -> DataFrame:
    """Repair UTF-8-as-Latin-1 double-encoding damage ('Ã©' -> 'é'),
    up to `max_passes` nested layers (double-mojibake happens when two
    systems mis-decode in sequence). Conservative by construction: a
    pass applies only if the latin-1 re-encode round-trips as valid
    UTF-8 and the result still contains fewer tell bytes; text without
    tells is returned untouched (the common case costs one substring
    scan per batch). Arrow-batched pandas UDF; scan-stage, no shuffle.
    Deterministic — repeated runs are a fixpoint (idempotence is
    pytest-pinned)."""
    from pyspark.sql.functions import pandas_udf

    tells = _MOJIBAKE_TELLS

    def _n_tells(s):
        return sum(s.count(t) for t in tells)

    def _fix_one(v):
        if v is None:
            return v
        cur, n = v, _n_tells(v)
        if n == 0:
            return v
        for _ in range(max_passes):
            try:
                cand = cur.encode("latin-1").decode("utf-8")
            except (UnicodeEncodeError, UnicodeDecodeError):
                break
            # the documented conservatism gate: a pass must strictly
            # reduce the tell count, or the text wasn't mojibake
            cand_n = _n_tells(cand)
            if cand == cur or cand_n >= n:
                break
            cur, n = cand, cand_n
            if n == 0:
                break
        return cur

    _fix = pandas_udf(lambda s: s.map(_fix_one), "string")

    return df.withColumn(out_col, _fix(F.col(text_col)))


# PII patterns, deliberately regex-portable (Java regex == RE2 == DuckDB
# for this subset: character classes, bounded repeats, \b anchors — no
# lookaround, no backrefs). Scrub order matters: emails first (an email
# never survives to be half-matched as a phone/IP), then phones, then
# bare IPv4s.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def pii_count(c: Column, kind: str) -> Column:
    """Number of matches of one PII pattern (email/phone/ipv4)."""
    return F.size(F.regexp_extract_all(c, F.lit(PII_PATTERNS[kind]), F.lit(0)))


def scrub_pii(c: Column) -> Column:
    """Replace every PII match with a typed placeholder (<EMAIL>,
    <PHONE>, <IPV4>) — the standard pre-training redaction pass.
    Pure JVM regexp_replace chain: at 100 TB this is a scan-stage
    expression, zero shuffles, no Python."""
    out = c
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return out


def pii_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Annotate with per-kind PII match counts + the scrubbed text."""
    c = F.col(text_col)
    return df.withColumns({
        **{f"n_{kind}": pii_count(c, kind) for kind in PII_PATTERNS},
        "scrubbed": scrub_pii(c),
    })


def html_to_text(c: Column) -> Column:
    """Markup -> text extraction (the step BEFORE every other text op
    in a web-corpus pipeline): drop comments and script/style blocks,
    strip tags, decode the common entities, collapse whitespace.
    Regex-only — (?is) inline flags and non-greedy quantifiers behave
    identically under Java regex and RE2 — and a pure scan-stage
    expression chain like scrub_pii. A full HTML5 parser this is not
    (malformed nesting degrades gracefully to tag-stripping), which is
    exactly the trade every large-scale extraction pass makes."""
    out = F.regexp_replace(c, r"(?is)<!--.*?-->", " ")
    out = F.regexp_replace(out, r"(?is)<script\b[^>]*>.*?</script>", " ")
    out = F.regexp_replace(out, r"(?is)<style\b[^>]*>.*?</style>", " ")
    out = F.regexp_replace(out, r"(?s)<[^>]+>", " ")
    for ent, ch in (("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
                    ("&quot;", "\""), ("&#39;", "'"), ("&amp;", "&")):
        out = F.regexp_replace(out, ent, ch)
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def duplicate_span_features(df: DataFrame, *, text_col: str = "text",
                            id_col: str = "doc_id",
                            span_words: int = 10) -> DataFrame:
    """Cross-document duplicate-SPAN detection (the Lee et al. 2022
    'Deduplicating Training Data' signal, word-granular): overlapping
    `span_words`-word n-grams, counted across the whole corpus; a
    doc's dup_span_frac is the fraction of its spans that occur more
    than once corpus-wide. Unlike the disjoint chunks of
    boilerplate_remove, OVERLAPPING spans catch shifted duplication
    (copy-paste with different surroundings).

    Shape: the span stream explodes twice (per-doc rows + the count
    side — scan-stage, cheap to repeat); counts aggregate on md5(span)
    with map-side partial combine and join back under AQE. Skew-safe
    like lm_novelty: a viral boilerplate span repeated in millions of
    docs partial-aggregates instead of sorting onto one window task.
    dup_span_frac is one division of two longs: engine-exact."""
    def spans():
        d = df.withColumn("_w", words(F.col(text_col)))
        return (d.select(id_col,
                         F.explode(ngram_array(span_words)).alias("_g"))
                .withColumn("_ck", F.md5("_g")).drop("_g"))

    cnt = spans().groupBy("_ck").agg(F.count(F.lit(1)).alias("_c"))
    agg = (spans().join(cnt, "_ck")
           .groupBy(id_col).agg(
               F.count(F.lit(1)).alias("n_spans"),
               F.sum((F.col("_c") >= 2).cast("long")).alias("n_dup_spans")))
    return (df.select(id_col).join(agg, id_col, "left")
            .withColumn("n_spans",
                        F.coalesce("n_spans", F.lit(0)).cast("long"))
            .withColumn("n_dup_spans",
                        F.coalesce("n_dup_spans", F.lit(0)))
            .withColumn("dup_span_frac",
                        (F.col("n_dup_spans")
                         / F.greatest("n_spans", F.lit(1))).cast("double")))


def exact_substring_dedup(df: DataFrame, *, text_col: str = "text",
                          id_col: str = "doc_id",
                          span_words: int = 10) -> DataFrame:
    """Exact substring-span REMOVAL (the apply side of
    duplicate_span_features — Lee et al. 2022 'Deduplicating Training
    Data' ExactSubstr, word-granular): every corpus-wide duplicated
    `span_words`-word span keeps its FIRST occurrence (min (doc, pos))
    and is cut from every later one. Overlapping grams make removal
    span-maximal: a duplicated region of ANY length >= span_words is
    tiled by duplicated grams, so the union of their covered token
    ranges removes the whole region from non-first occurrences while
    the first occurrence keeps every token.

    Returns one row per input doc: (id, n_tokens, n_removed,
    clean_text) where clean_text is the surviving normalized tokens
    re-joined by ' ' (docs with nothing removed get their normalized
    text back — deterministic, engine-comparable).

    Shape (all JVM, no Python): grams posexplode scan-stage; the
    canonical occurrence per gram is ONE groupBy min(struct(doc,pos))
    with map-side partial agg (never a window over the gram — the
    viral-span skew rule duplicate_span_features documents); covered
    token indexes collapse per doc via collect_set; the final token
    filter is a higher-order transform on the already-materialized
    words array. The paper's suffix-array build is a single-machine
    construction — the overlapping-gram tiling is the shuffle-friendly
    equivalent at word granularity."""
    cleaned, _ = _substring_scrub_core(
        df, None, text_col=text_col, id_col=id_col,
        span_words=span_words)
    return cleaned


def substring_scrub_incremental(new_df: DataFrame,
                                seen_grams: DataFrame | None, *,
                                text_col: str = "text",
                                id_col: str = "doc_id",
                                span_words: int = 10
                                ) -> tuple[DataFrame, DataFrame]:
    """Continuous-crawl edition of exact_substring_dedup (the span
    sibling of dedup_incremental/dedup_minhash_incremental): a span of
    an arriving document is cut iff its gram was seen EARLIER — in a
    prior batch via `seen_grams`, or at an earlier (doc, pos) within
    this batch. One batch with seen_grams=None is EXACTLY the batch
    op. Every gram of the batch enters the seen set (text was
    observed, whether or not it survived — the same
    chains-collapse-to-first-arrival rule as the other crawl loops).

    seen_grams is a 1-column (fingerprint) frame of gram md5s — the
    same table contract as the exact/MinHash loops, so
    compact_seen_fps / compact_pending_fps apply unchanged.

    Returns (cleaned_docs, updated_seen): cleaned_docs has the batch
    op's (id, n_tokens, n_removed, clean_text) schema — docs arrive
    and leave scrubbed, nothing is dropped wholesale (a fully
    duplicated doc leaves with clean_text = '')."""
    cleaned, new_rows = _substring_scrub_core(
        new_df, seen_grams, text_col=text_col, id_col=id_col,
        span_words=span_words)
    updated = (new_rows if seen_grams is None
               else seen_grams.union(new_rows))
    return cleaned, updated


def _substring_scrub_core(new_df: DataFrame,
                          seen_grams: DataFrame | None, *,
                          text_col: str, id_col: str,
                          span_words: int
                          ) -> tuple[DataFrame, DataFrame]:
    """(cleaned_docs, NEW (fingerprint) gram rows) — the shared kernel
    of exact_substring_dedup (seen=None) and the incremental loop.
    An occurrence is covered iff its gram is in the seen set (every
    in-batch occurrence then covers — the canonical keeper already
    lives in an earlier batch) or it is not the batch-canonical
    min (doc, pos) occurrence. New rows exclude already-seen grams so
    unions stay duplicate-free.

    The gram stream `occ` feeds three consumers and is deliberately
    NOT checkpointed (unlike the minhash/simhash cores, which
    checkpoint their small one-row-per-doc SIGNATURE frames): occ is
    the exploded one-row-per-(doc,pos) stream — the largest
    intermediate — and re-deriving it is a scan-stage explode off the
    parquet scan, the same recompute-over-materialize call
    duplicate_span_features documents ('scan-stage, cheap to
    repeat')."""
    d = new_df.withColumn("_w", words(F.col(text_col)))
    occ = (d.select(id_col,
                    F.posexplode(ngram_array(span_words))
                    .alias("_p0", "_g"))
           .select(id_col, (F.col("_p0") + 1).alias("_pos"),
                   F.md5("_g").alias("_ck")))
    first = occ.groupBy("_ck").agg(
        F.min(F.struct(F.col(id_col).alias("d"),
                       F.col("_pos").alias("p"))).alias("_f"))
    not_canonical = ((F.col(id_col) != F.col("_f.d"))
                     | (F.col("_pos") != F.col("_f.p")))
    joined = occ.join(first, "_ck")
    if seen_grams is not None:
        seen_marked = (seen_grams
                       .select(F.col("fingerprint").alias("_ck"),
                               F.lit(True).alias("_seen")))
        joined = (joined.join(seen_marked, "_ck", "left")
                  .filter(F.coalesce("_seen", F.lit(False))
                          | not_canonical))
    else:
        joined = joined.filter(not_canonical)
    covered = joined.select(
        id_col,
        F.explode(F.sequence(F.col("_pos"),
                             F.col("_pos") + F.lit(span_words - 1)))
        .alias("_i"))
    cov = covered.groupBy(id_col).agg(F.collect_set("_i").alias("_cov"))
    cleaned = (d.select(id_col, "_w").join(cov, id_col, "left")
               .withColumn("_cov", F.coalesce(
                   "_cov", F.expr("cast(array() as array<int>)")))
               .select(
                   id_col,
                   F.size("_w").cast("long").alias("n_tokens"),
                   F.size("_cov").cast("long").alias("n_removed"),
                   F.concat_ws(" ", F.expr(
                       "filter(transform(_w, (t, i) -> "
                       "if(array_contains(_cov, i + 1), null, t)), "
                       "x -> x is not null)")).alias("clean_text")))
    new_rows = occ.select(F.col("_ck").alias("fingerprint")).distinct()
    if seen_grams is not None:
        new_rows = new_rows.join(seen_grams, "fingerprint", "left_anti")
    return cleaned, new_rows


def hex_prefix_long(h: Column) -> Column:
    """First 8 hex digits of an md5-hex column parsed as a BIGINT in
    [0, 2^32) — THE engine-portable hash device (DuckDB side:
    ('0x' || substr(h, 1, 8))::BIGINT). One definition, so the quality
    classifier, the DSIR feature buckets and the shard layout cannot
    drift apart (review find: three inline copies)."""
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")


def md5_prefix_long(c: Column, suffix: str = "") -> Column:
    """hex_prefix_long(md5(c || suffix)) — the seeded form."""
    h = F.md5(F.concat(c, F.lit(suffix))) if suffix else F.md5(c)
    return hex_prefix_long(h)


def mean_pool_score(df: DataFrame, score_sum: Column, *,
                    scale: int, words_col: str = "_w") -> DataFrame:
    """Shared mean-pool tail of hashed_linear_score and trainprep.
    dsir_score (review find: previously copy-pasted): score_sum, the
    unigram+bigram feature count n_features = |w| + max(|w|-1, 0), and
    score = score_sum / (scale * max(n_features, 1)) — integer sums,
    ONE final division, so the double is engine-reproducible."""
    n_feat = (F.size(words_col)
              + F.greatest(F.size(words_col) - 1, F.lit(0)))
    return (df.withColumn("score_sum", score_sum)
            .withColumn("n_features", n_feat.cast("long"))
            .withColumn("score",
                        (F.col("score_sum")
                         / (F.lit(float(scale))
                            * F.greatest("n_features", F.lit(1))))
                        .cast("double")))


def hashed_token_weight(tok: Column, *, seed: str = "q",
                        scale: int = 1000) -> Column:
    """Deterministic integer weight in [-scale, scale] for a token —
    the md5-derived stand-in for a trained weight table (engines with a
    real fasttext/logistic model swap this for a weights-map lookup;
    the SHAPE of the scorer is what matters for the pipeline). Engine-
    portable: md5 prefix parsed as hex on both sides."""
    return (md5_prefix_long(tok, seed) % (2 * scale + 1)) - scale


def hashed_linear_score(df: DataFrame, *, text_col: str = "text",
                        seed: str = "q", scale: int = 1000) -> DataFrame:
    """fasttext-shape quality classifier scoring: hash every word (and
    word bigram) to a weight, mean-pool, decide keep = score > 0 — the
    CCNet / GPT-3 quality-filter architecture with the weight lookup
    replaced by a deterministic hash (see hashed_token_weight).

    Exactness device: weights are INTEGERS summed inside the array
    fold (order-free), divided once at the end — so the double `score`
    is a single division, reproducible across engines. Everything is a
    scan-stage array expression: zero shuffles, no Python, no explode.
    At 100 TB this annotates during the scan like the other text ops."""
    d = df.withColumn("_w", words(F.col(text_col)))
    uni = F.aggregate(
        F.transform(F.col("_w"),
                    lambda w: hashed_token_weight(w, seed=seed,
                                                  scale=scale).cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    big = F.aggregate(
        F.transform(ngram_array(2),
                    lambda g: hashed_token_weight(g, seed=seed,
                                                  scale=scale).cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    out = (mean_pool_score(d, uni + big, scale=scale)
           .withColumn("keep", F.col("score") > 0))
    return out.drop("_w")


# URL handling — regex-only (no java.net parsing), so the formulas are
# engine-portable: no lookaround (RE2 has none), replacements use $1 in
# Spark / \1 in the DuckDB oracles but identical match semantics.
_URL_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_URL_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_URL_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"


def url_scheme(c: Column) -> Column:
    return F.lower(F.regexp_extract(c, _URL_SCHEME_RE, 1))


def url_host(c: Column) -> Column:
    """Normalized host: lowercased, leading www. stripped, and the
    scheme's OWN default port stripped (https:443 / http:80 — a
    non-default port is a different origin and stays)."""
    h = F.lower(F.regexp_extract(c, _URL_HOST_RE, 1))
    h = F.regexp_replace(h, r"^www\.", "")
    scheme = url_scheme(c)
    h = F.when(scheme == "https", F.regexp_replace(h, r":443$", "")) \
        .when(scheme == "http", F.regexp_replace(h, r":80$", "")) \
        .otherwise(h)
    return h


def url_path(c: Column) -> Column:
    return F.regexp_extract(c, _URL_PATH_RE, 1)


# normalize_url's rule chain, shared with the DuckDB oracle (which
# rebuilds it with \1-style replacements). Order matters; see each rule.
# Review r4: (a) the utm rule must swallow RUNS of adjacent params in
# one match (scanning resumes after a replacement, so a one-param rule
# leaks every second adjacent tracker and breaks idempotence); (b) the
# default-port strip must pair the port with ITS scheme — :443 is not
# a default for http, collapsing distinct origins.
URL_NORMALIZE_RULES: list[tuple[str, str, str]] = [
    (r"#.*$", "", "fragment"),
    (r"([?&])(utm_[A-Za-z]+=[^&#]*&)+", "$1", "utm runs followed by &"),
    (r"[?&]utm_[A-Za-z]+=[^&#]*$", "", "trailing utm param"),
    (r"[?&]+$", "", "dangling separators"),
    *[(rf"^({scheme}://[^/?#:]+):{port}{tail}", f"$1{keep}", "default port")
      for scheme, port in (("https", "443"), ("http", "80"))
      for tail, keep in ((r"/", "/"), (r"\?", "?"), (r"$", ""))],
]


def normalize_url(c: Column) -> Column:
    """Canonical URL for dedup: drop the fragment, strip utm_* tracking
    params (fixing separators, idempotent across runs), strip the
    scheme's OWN default port (https:443 / http:80 only). Pure JVM
    regexp chain — scan-stage at 100 TB, like scrub_pii."""
    u = c
    for pat, rep, _why in URL_NORMALIZE_RULES:
        u = F.regexp_replace(u, pat, rep)
    return u


def url_n_params(clean: Column) -> Column:
    """Query-parameter count of an ALREADY-normalized url (pass the
    clean_url column — counting from the raw url would double the
    normalize chain in the plan and invite drift between the two)."""
    return F.size(F.regexp_extract_all(clean, F.lit(r"[?&][^=&#]+="),
                                       F.lit(0)))


def url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Annotate with scheme/host/path/param-count + the normalized URL
    (the dedup key a web-corpus pipeline joins on)."""
    c = F.col(url_col)
    out = df.withColumns({
        "scheme": url_scheme(c),
        "host": url_host(c),
        "path": url_path(c),
        "clean_url": normalize_url(c),
    })
    return out.withColumn("n_params", url_n_params(F.col("clean_url")))


def lm_novelty(df: DataFrame, *, text_col: str = "text",
               id_col: str = "doc_id", rare_max_count: int = 2) -> DataFrame:
    """Corpus bigram-LM document scoring (the CCNet quality-signal
    shape: a language model trained on the corpus itself scores each
    document's transitions). Per document: n_bigrams, n_rare (bigram
    occurrences whose corpus count <= rare_max_count — the novelty /
    gibberish signal), min_p / max_p (extreme transition probabilities
    p(w2|w1) = C(w1 w2) / C(w1 ·)), and mean_neglogp (average -log2 p,
    the perplexity proxy — order-dependent float, for ranking only; the
    other four columns are engine-exact and oracle-checked).

    Scale shape — the SKEW-SAFE count formulation: the bigram stream
    explodes three times (per-doc rows + each count side; a scan-stage
    explode is cheap to repeat and deliberately NOT checkpointed), the
    counts aggregate with map-side partial combine, and the counts
    join back under AQE (broadcast when the vocab fits, skew-join
    otherwise). A window count() over partitionBy(gram) looks tidier
    (one lineage, measured a touch faster locally) but has NO partial
    aggregation: at open-vocab scale a stopword bigram like 'of the'
    sends a double-digit percent of the corpus to one sort task — a
    scale-killer this formulation avoids. No Python anywhere."""
    def bigrams(cols):
        d = df.withColumn("_w", words(F.col(text_col)))
        return (d.select(id_col, F.explode(ngram_array(2)).alias("_g"))
                .withColumn("_w1", F.substring_index("_g", " ", 1))
                .select(*cols))

    ex = bigrams([id_col, "_g", "_w1"])
    bg = bigrams(["_g"]).groupBy("_g").agg(F.count(F.lit(1)).alias("_cb"))
    ug = bigrams(["_w1"]).groupBy("_w1").agg(
        F.count(F.lit(1)).alias("_cu"))
    scored = (ex.join(bg, "_g").join(ug, "_w1")
              .withColumn("_p", F.col("_cb") / F.col("_cu")))
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum((F.col("_cb") <= rare_max_count).cast("long")).alias("n_rare"),
        F.min("_p").alias("min_p"),
        F.max("_p").alias("max_p"),
        (F.sum(-F.log2("_p")) / F.count(F.lit(1))).alias("mean_neglogp"))
    out = (df.select(id_col).join(agg, id_col, "left")
           .withColumn("n_bigrams",
                       F.coalesce("n_bigrams", F.lit(0)).cast("long"))
           .withColumn("n_rare", F.coalesce("n_rare", F.lit(0))))
    return out


def text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass annotation with all text-analysis columns."""
    c = F.col(text_col)
    return df.withColumns({
        "n_tokens": token_count(c),
        "n_chars_calc": char_count(c),
        "digit_ratio": digit_ratio(c),
        "punct_ratio": punct_ratio(c),
        "avg_word_len": avg_word_len(c),
        "stopword_ratio": stopword_ratio(c),
        "quality": quality_score(c),
        "lang_guess": lang_id(c),
        "fingerprint": fingerprint(c),
    })
