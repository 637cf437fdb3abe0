"""Property-based tests (hypothesis) for the pure-Python surfaces and
the lambda expression library — the reference's test strategy
(flowdata_tests.erl / faxe_time_tests.erl exhaustive cases) generalized
to generated inputs."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from faxe_spark.durations import parse_duration_ms
from faxe_spark.paths import parse_path

UNITS = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000,
         "d": 86_400_000, "w": 604_800_000}

duration_terms = st.lists(
    st.tuples(st.integers(min_value=0, max_value=10_000),
              st.sampled_from(sorted(UNITS))),
    min_size=1, max_size=4)


@given(duration_terms, st.booleans())
def test_duration_parse_matches_term_sum(terms, neg):
    text = "".join(f"{n}{u}" for n, u in terms)
    expect = sum(n * UNITS[u] for n, u in terms)
    assert parse_duration_ms(("-" if neg else "") + text) == (-expect if neg else expect)


@given(st.text(max_size=10).filter(
    lambda s: not __import__("re").fullmatch(r"-?(\d+(ms|s|m|h|d|w))+", s.strip())))
def test_duration_rejects_non_literals(junk):
    with pytest.raises((ValueError, AttributeError)):
        parse_duration_ms(junk)


path_segment = st.tuples(
    st.text(alphabet="abcxyz_", min_size=1, max_size=6),
    st.lists(st.integers(min_value=1, max_value=9), max_size=2))


@given(st.lists(path_segment, min_size=1, max_size=5))
def test_parse_path_round_trip(segments):
    text = ".".join(name + "".join(f"[{i}]" for i in idxs)
                    for name, idxs in segments)
    assert parse_path(text) == [(n, list(i)) for n, i in segments]


@given(st.lists(path_segment, min_size=1, max_size=3))
def test_parse_path_rejects_zero_index(segments):
    name, idxs = segments[0]
    text = ".".join([f"{name}[0]"] +
                    [n + "".join(f"[{i}]" for i in ix) for n, ix in segments[1:]])
    with pytest.raises(ValueError):
        parse_path(text)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(-10**6, 10**6),
                          st.integers(-10**6, 10**6).filter(lambda x: x != 0),
                          st.text(alphabet="aB c-9", max_size=12)),
                min_size=1, max_size=50))
def test_lambda_lib_matches_python_reference(spark, rows):
    """Batched check: one DataFrame per example, every row compared to a
    pure-Python model of the lambda semantics."""
    from faxe_spark.dfs import compile_lambda

    df = spark.createDataFrame(rows, "a long, b long, s string")
    out = df.select(
        compile_lambda("abs(a)").alias("abs_a"),
        compile_lambda("max(a, b)").alias("max_ab"),
        compile_lambda("a + b * 2").alias("arith"),
        compile_lambda("if(a > b, a - b, b - a)").alias("absdiff"),
        compile_lambda("str_length(s)").alias("slen"),
        compile_lambda("str_upcase(str_trim(s))").alias("sup"),
        compile_lambda("str_starts_with(s, 'a')").alias("pre"),
    ).collect()
    for (a, b, s), r in zip(rows, out):
        assert r.abs_a == abs(a)
        assert r.max_ab == max(a, b)
        assert r.arith == a + b * 2
        assert r.absdiff == abs(a - b)
        assert r.slen == len(s)
        assert r.sup == s.strip().upper()
        assert r.pre == s.startswith("a")


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.floats(min_value=0.001, max_value=10**6,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=50))
def test_lambda_math_matches_python_reference(spark, xs):
    from faxe_spark.dfs import compile_lambda

    df = spark.createDataFrame([(x,) for x in xs], "x double")
    out = df.select(
        compile_lambda("sqrt(x)").alias("r"),
        compile_lambda("floor(x)").alias("fl"),
        compile_lambda("ceiling(x)").alias("ce"),
        compile_lambda("pow(x, 2)").alias("sq"),
    ).collect()
    for x, r in zip(xs, out):
        assert r.r == pytest.approx(math.sqrt(x), rel=1e-12)
        assert r.fl == math.floor(x)
        assert r.ce == math.ceil(x)
        assert r.sq == pytest.approx(x * x, rel=1e-12)


# ---------------------------------------------------------------------------
# PLC read planner invariants (faxe_spark/plc.py)
# ---------------------------------------------------------------------------

s7_bool_addrs = st.lists(
    st.tuples(st.integers(min_value=1, max_value=3),   # db
              st.integers(min_value=0, max_value=40),  # byte
              st.integers(min_value=0, max_value=7)),  # bit
    min_size=1, max_size=24, unique=True)


@given(s7_bool_addrs)
def test_plc_bool_plan_covers_every_alias_once(addrs):
    """Every requested tag appears exactly once across the plan, and its
    run-relative bit offset reconstructs the absolute address."""
    from faxe_spark.plc import plan_bulk_reads

    addresses = [f"DB{db}.DBX{byte}.{bit}" for db, byte, bit in addrs]
    aliases = [f"t{i}" for i in range(len(addrs))]
    runs = plan_bulk_reads(addresses, aliases)
    seen = {}
    for r in runs:
        assert r.amount >= 1
        for name, kind, off in r.aliases:
            assert kind == "bool_byte"
            assert name not in seen
            seen[name] = r.start * 8 + off  # absolute bit address
    assert set(seen) == set(aliases)
    want = {f"t{i}": db * 0 + byte * 8 + bit
            for i, (db, byte, bit) in enumerate(addrs)}
    assert seen == want


s7_word_addrs = st.lists(
    st.tuples(st.integers(min_value=1, max_value=2),
              st.integers(min_value=0, max_value=60)),
    min_size=1, max_size=20, unique=True)


@given(s7_word_addrs)
def test_plc_word_plan_amount_equals_alias_count(addrs):
    from faxe_spark.plc import plan_bulk_reads

    addresses = [f"DB{db}.DBW{2 * off}" for db, off in addrs]
    aliases = [f"w{i}" for i in range(len(addrs))]
    runs = plan_bulk_reads(addresses, aliases)
    assert sum(r.amount for r in runs) == len(addrs)
    assert sorted(n for r in runs for n, _t in r.aliases) == sorted(aliases)
    for r in runs:
        assert r.amount == len(r.aliases)


modbus_reqs = st.lists(
    st.tuples(st.sampled_from(["hregs", "coils"]),
              st.integers(min_value=0, max_value=200),
              st.integers(min_value=1, max_value=4)),
    min_size=1, max_size=20)


@given(modbus_reqs)
def test_modbus_plan_conserves_registers_and_aliases(reqs):
    from faxe_spark.plc import plan_modbus_reads

    fns = [f for f, _s, _c in reqs]
    starts = [s for _f, s, _c in reqs]
    counts = [c for _f, _s, c in reqs]
    aliases = [f"r{i}" for i in range(len(reqs))]
    runs = plan_modbus_reads(fns, starts, counts, aliases)
    assert sum(r.amount for r in runs) == sum(counts)
    assert sorted(a for r in runs for a in r.aliases) == sorted(aliases)
    assert all(r.amount <= 125 for r in runs)


# ---------------------------------------------------------------------------
# merge_value laws (esp_join.erl merge/2) — plan-time dispatch, checked
# through a tiny DataFrame evaluation
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("spark")
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.dictionaries(st.sampled_from("abcd"), st.integers(-5, 5), max_size=3),
       st.dictionaries(st.sampled_from("abcd"), st.integers(-5, 5), max_size=3))
def test_merge_value_map_right_wins(spark, m1, m2):
    import pyspark.sql.functions as F

    from faxe_spark.operators.join import merge_value

    df = spark.createDataFrame(
        [(m1, m2)], "a map<string,long>, b map<string,long>")
    dtype = df.schema["a"].dataType
    got = df.select(merge_value(F.col("a"), F.col("b"), dtype).alias("m")) \
        .collect()[0]["m"] or {}
    assert got == {**m1, **m2}


# -- round 4: modbus decode, greedy packing, comma addresses ----------------

@given(st.lists(st.integers(0, 0xFFFF), min_size=2, max_size=8)
       .filter(lambda r: len(r) % 2 == 0))
def test_modbus_float32_decode_round_trip(regs):
    """Registers -> float32 -> registers is the identity on the wire
    bytes (big-endian word order, esp_modbus_read OUT_TYPES)."""
    import struct

    from faxe_spark.sources.modbus import decode_registers

    vals = decode_registers(regs, "float32")
    if not isinstance(vals, list):
        vals = [vals]
    back = []
    for v in vals:
        hi, lo = struct.unpack(">HH", struct.pack(">f", v))
        back += [hi, lo]
    # NaN payloads aren't bit-stable through pack/unpack; compare
    # non-NaN words only
    import math

    if not any(isinstance(v, float) and math.isnan(v) for v in vals):
        assert back == regs


@given(st.integers(1, 9999), st.integers(0, 4095))
def test_s7_comma_width_suffix_addresses(db, byte):
    """DB<db>,Int16.<byte> == 16-bit int at byte <byte>; the plain
    comma form DB<db>,Int<byte> must agree on dtype and offset."""
    from faxe_spark.plc import parse_address

    a = parse_address(f"DB{db},Int16.{byte}")
    b = parse_address(f"DB{db},Int{byte}")
    assert a == b


@given(st.lists(st.integers(0, 900), min_size=1, max_size=60),
       st.integers(64, 600))
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pack_greedy_property(spark, tokens, budget):
    """Greedy invariants under arbitrary token counts incl. zeros and
    over-budget docs: ids keep order, pack ids are non-decreasing,
    pack totals respect the budget unless a single doc exceeds it."""
    from faxe_spark.operators import trainprep as tp

    rows = [(i, "w " * t if t else None, "s") for i, t in enumerate(tokens)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = sorted(tp.pack_greedy(df, budget=budget).collect(),
                 key=lambda r: r.doc_id)
    per_pack: dict[int, int] = {}
    last_pack = 0
    for r in out:
        assert r.pack_id >= last_pack
        last_pack = r.pack_id
        per_pack[r.pack_id] = per_pack.get(r.pack_id, 0) + r.n_tokens
    for pid, total in per_pack.items():
        members = [r for r in out if r.pack_id == pid]
        assert total <= budget or any(
            m.n_tokens > budget for m in members)


@given(st.binary(min_size=0, max_size=400))
@settings(max_examples=300, deadline=None)
def test_avi_parser_never_raises_on_arbitrary_bytes(payload):
    """Hostile-input property for the stdlib AVI walker: ANY byte
    string either parses to (w>0, h>0, non-empty spans within the
    payload, codec in {raw, mjpg}) or returns None — never an
    exception out of the Arrow worker (the junk-lane contract)."""
    from faxe_spark.operators.multimodal import _avi_raw_frames

    parsed = _avi_raw_frames(payload)
    if parsed is not None:
        w, h, spans, codec = parsed
        assert w > 0 and h > 0 and codec in ("raw", "mjpg")
        assert spans and all(0 <= s <= e <= len(payload)
                             for s, e in spans)


@given(st.binary(min_size=0, max_size=400))
@settings(max_examples=200, deadline=None)
def test_avi_parser_never_raises_on_riff_prefixed_bytes(payload):
    """Same property with a valid RIFF/AVI magic prepended — forces
    the fuzz INTO the chunk walker instead of bouncing off the magic
    check (size fields, nested LISTs, strh/strf slicing all see
    arbitrary bytes)."""
    from faxe_spark.operators.multimodal import _avi_raw_frames

    b = b"RIFF" + len(payload).to_bytes(4, "little") + b"AVI " + payload
    parsed = _avi_raw_frames(b)
    if parsed is not None:
        w, h, spans, codec = parsed
        assert w > 0 and h > 0 and codec in ("raw", "mjpg")
        assert spans and all(0 <= s <= e <= len(b) for s, e in spans)


# -- crawl-fold properties (r10): random epoch partitions --------------------

@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.dictionaries(st.integers(0, 10**9), st.integers(0, 2),
                       min_size=1, max_size=30),
       st.integers(1, 6))
def test_shard_append_fold_matches_python_model(spark, id_epochs, n_shards):
    """Append-stable layout under a RANDOM partition of random ids into
    up to 3 epochs, against a pure-Python md5 model: shard = md5-prefix
    hash; shard_pos = docs of the same shard in EARLIER epochs + the
    doc's md5-hex rank within its own epoch's shard slice. The
    fixed-split e2e tests pin the loop; this pins the arithmetic for
    arbitrary splits."""
    import hashlib

    from faxe_spark.operators import trainprep as tp

    epochs = [[i for i, e in sorted(id_epochs.items()) if e == k]
              for k in range(3)]
    epochs = [e for e in epochs if e]

    # pure-python expected fold
    hexes = {i: hashlib.md5((str(i) + "shuffle").encode()).hexdigest()
             for i in id_epochs}
    shard = {i: int(hexes[i][:8], 16) % n_shards for i in id_epochs}
    base = {s: 0 for s in range(n_shards)}
    want = {}
    for ep in epochs:
        by_shard = {}
        for i in ep:
            by_shard.setdefault(shard[i], []).append(i)
        for s, members in by_shard.items():
            for rank, i in enumerate(
                    sorted(members, key=lambda x: (hexes[x], x)), 1):
                want[i] = (s, base[s] + rank)
        for s, members in by_shard.items():
            base[s] += len(members)

    counts, got = None, {}
    for ep in epochs:
        df = spark.createDataFrame([(i, "t") for i in ep],
                                   "doc_id long, text string")
        appended, counts = tp.shard_append(df, counts,
                                           n_shards=n_shards)
        for r in appended.collect():
            got[r.doc_id] = (r.shard, r.shard_pos)
    assert got == want


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.dictionaries(st.integers(0, 10**6), st.integers(0, 2),
                       min_size=1, max_size=24),
       st.integers(1, 8))
def test_dsir_select_fold_equals_global_any_partition(spark, id_epochs, k):
    """fold == global top-k for ANY partition of the corpus into
    epochs (the dsir_select_incr_batches oracle claim, generalized):
    whatever order and grouping the crawl delivers, the k selected
    docs equal the one-shot selection over the union."""
    from faxe_spark.operators import trainprep as tp

    rows = [(i, f"w{i % 7} w{i % 5} w{i % 3}", "en" if i % 2 else "de")
            for i in sorted(id_epochs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    import pyspark.sql.functions as F
    wdf = tp.dsir_weights_flagged(df, F.expr("lang = 'en'"), buckets=16)
    w = {int(r.bucket): int(r.lam) for r in wdf.collect()}

    best = None
    for e in range(3):
        ids = [i for i, ep in id_epochs.items() if ep == e]
        if not ids:
            continue
        edf = df.filter(F.col("doc_id").isin(ids))
        best = tp.dsir_select_incremental(edf, best, weights=w, k=k,
                                          buckets=16)
    gl = tp.dsir_select_incremental(df, None, weights=w, k=k, buckets=16)
    assert sorted(map(tuple, best.collect())) == \
        sorted(map(tuple, gl.collect()))
