"""Property tests for the wire-lane codecs: arbitrary (well-typed)
values must survive the encode -> wire -> decode round trip exactly.
These are the lanes where a silent truncation or an escaping gap
corrupts data without failing any golden test."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

# -- BSON -------------------------------------------------------------------

_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=40),
)
_keys = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126,
                           exclude_characters="\x00$."),
    min_size=1, max_size=12)
_bson_docs = st.recursive(
    st.dictionaries(_keys, _scalars, max_size=5),
    lambda children: st.dictionaries(
        _keys, st.one_of(_scalars, children,
                         st.lists(_scalars, max_size=4)), max_size=5),
    max_leaves=12)


@settings(max_examples=200, deadline=None)
@given(_bson_docs)
def test_bson_round_trip_property(doc):
    from faxe_spark.sources.mongo import bson_decode, bson_encode

    buf = bson_encode(doc)
    got, end = bson_decode(buf)
    assert got == doc and end == len(buf)


# -- PG text format ---------------------------------------------------------

@settings(max_examples=200, deadline=None)
@given(st.one_of(
    st.booleans(),
    st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1),
    st.floats(allow_nan=False, allow_infinity=False),
    st.datetimes(),
))
def test_pgwire_text_round_trip_property(v):
    from faxe_spark.sources.pgwire import decode_text, encode_text, infer_oid

    # exact in every branch: str(float) round-trips doubles exactly
    # in Python (repr-based), and the other types are lossless
    assert decode_text(infer_oid(v), encode_text(v)) == v


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=60))
def test_pgwire_sql_literal_strings_safe(s):
    """String literals must round-trip through a real SQL engine —
    quoting/escaping proven against DuckDB, not by eye."""
    import duckdb

    from faxe_spark.sources.pgwire import sql_literal

    if "\x00" in s:                      # NUL cannot live in a literal
        return
    got = duckdb.sql(f"SELECT {sql_literal(s)} AS v").fetchone()[0]
    assert got == s


# -- S7 decode --------------------------------------------------------------

@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=-(2 ** 15), max_value=2 ** 15 - 1),
                min_size=1, max_size=8))
def test_s7_int_decode_property(vals):
    import struct

    from faxe_spark.sources.s7 import decode_payload

    data = b"".join(struct.pack(">h", v) for v in vals)
    assert decode_payload("int", data) == vals


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=2 ** 16 - 1))
def test_s7_bool_byte_decode_is_bit_exact(word):
    """Every bit of a 2-byte run must land at index byte*8 + bit with
    bit 0 = LSB (the esp_s7read.erl prepare_byte_list order)."""
    from faxe_spark.sources.s7 import decode_payload

    data = bytes([word & 0xFF, word >> 8])
    bits = decode_payload("bool_byte", data)
    assert len(bits) == 16
    for i in range(16):
        byte, bit = i // 8, i % 8
        assert bits[i] == (data[byte] >> bit) & 1


# -- influx line protocol ---------------------------------------------------

@settings(max_examples=150, deadline=None)
@given(st.floats(allow_nan=False, allow_infinity=False, width=64))
def test_influx_float_encoding_parses_back(x):
    """The compact-12-decimal float form must parse back within the
    precision the reference commits to (12 decimals)."""
    from faxe_spark.sinks.influx import encode_value

    s = encode_value(x)
    back = float(s)
    assert back == x or math.isclose(back, x, rel_tol=1e-11, abs_tol=1e-12)
