"""S7 bulk-read planner (esp_s7read.erl:356-455 port): many small tag
reads coalesce into few contiguous wire requests."""

from __future__ import annotations

import pytest

from faxe_spark.plc import BulkRead, bit_count, parse_address, plan_bulk_reads


def test_parse_address_forms():
    assert parse_address("DB12.DBX4.1") == {
        "db_number": 12, "dtype": "bool", "start": 4 * 8 + 1, "word_len": "bit"}
    assert parse_address("DB3.DBW10") == {
        "db_number": 3, "dtype": "word", "start": 10, "word_len": "word"}
    assert parse_address("DB3.DBD20.float") == {
        "db_number": 3, "dtype": "float", "start": 20, "word_len": "d_word"}
    with pytest.raises(ValueError, match="unparseable"):
        parse_address("MW100")


def test_bools_pack_into_byte_runs():
    """Bits in the same byte and a next-byte bit 0 join one run; a gap
    starts a new wire request (find_bool_bytes :395-425)."""
    addrs = ["DB1.DBX0.0", "DB1.DBX0.3", "DB1.DBX1.0", "DB1.DBX5.2"]
    runs = plan_bulk_reads(addrs, ["a", "b", "c", "d"])
    assert len(runs) == 2
    r0, r1 = runs
    assert (r0.db_number, r0.start, r0.amount, r0.word_len) == (1, 0, 2, "byte")
    # bit offsets are within the RUN (byte delta * 8 + bit)
    assert r0.aliases == [("a", "bool_byte", 0), ("b", "bool_byte", 3),
                          ("c", "bool_byte", 8)]
    assert (r1.start, r1.amount, r1.aliases) == (5, 1, [("d", "bool_byte", 2)])


def test_bool_next_byte_nonzero_bit_splits():
    """A next-byte bit that is NOT bit 0 cannot extend the run
    (the reference's exact merge condition)."""
    runs = plan_bulk_reads(["DB1.DBX0.7", "DB1.DBX1.3"], ["a", "b"])
    assert len(runs) == 2


def test_contiguous_words_merge():
    """Word reads whose starts differ by word_len_size merge; different
    DBs never merge (find_contiguous :436-455)."""
    addrs = ["DB2.DBW0", "DB2.DBW2", "DB2.DBW4", "DB2.DBW8", "DB9.DBW0"]
    runs = plan_bulk_reads(addrs, ["w0", "w2", "w4", "w8", "x0"])
    assert [(r.db_number, r.start, r.amount) for r in runs] == [
        (2, 0, 3), (2, 8, 1), (9, 0, 1)]
    assert runs[0].aliases == [("w0", "word"), ("w2", "word"), ("w4", "word")]


def test_mixed_dtypes_partition_before_merging():
    """A float between two words must not bridge them — dtypes plan
    independently (build_addresses partition step :364-377)."""
    addrs = ["DB2.DBW0", "DB2.DBD2.float", "DB2.DBW2"]
    runs = plan_bulk_reads(addrs, ["w0", "f2", "w2"])
    kinds = sorted((r.dtype, r.amount) for r in runs)
    assert kinds == [("float", 1), ("word", 2)]


def test_request_count_collapse_and_bit_budget():
    """The optimizer's point: 64 contiguous bools + 16 contiguous words
    = 2 wire requests, not 80; bit_count reports the PDU budget."""
    bools = [f"DB1.DBX{b}.{i}" for b in range(8) for i in range(8)]
    words = [f"DB1.DBW{100 + 2 * i}" for i in range(16)]
    runs = plan_bulk_reads(bools + words,
                           [f"b{i}" for i in range(64)]
                           + [f"w{i}" for i in range(16)])
    assert len(runs) == 2
    assert bit_count(runs) == 8 * 8 + 16 * 16


def test_unsorted_input_is_sorted_first():
    runs = plan_bulk_reads(["DB2.DBW4", "DB2.DBW0", "DB2.DBW2"], ["c", "a", "b"])
    assert len(runs) == 1
    assert runs[0].aliases == [("a", "word"), ("b", "word"), ("c", "word")]


def test_modbus_contiguous_registers_merge():
    """esp_modbus_read.erl:274-290: same function + same opts +
    back-to-back ranges merge into one request."""
    from faxe_spark.plc import plan_modbus_reads

    runs = plan_modbus_reads(
        ["hregs", "hregs", "hregs", "coils"],
        [0, 2, 10, 0], [2, 2, 1, 8], ["a", "b", "c", "k"])
    assert [(r.dtype, r.start, r.amount, r.aliases) for r in runs] == [
        ("coils", 0, 8, ["k"]),
        ("hregs", 0, 4, ["a", "b"]),
        ("hregs", 10, 1, ["c"])]


def test_modbus_differing_opts_do_not_merge():
    from faxe_spark.plc import plan_modbus_reads

    runs = plan_modbus_reads(
        ["hregs", "hregs"], [0, 2], [2, 2], ["a", "b"],
        outputs=["int16", "float32"])
    assert len(runs) == 2


def test_modbus_pdu_cap_splits_long_runs():
    """125-register protocol cap: a contiguous run larger than one PDU
    splits instead of producing an over-long request."""
    from faxe_spark.plc import plan_modbus_reads

    n = 100
    runs = plan_modbus_reads(
        ["hregs"] * n, [i * 2 for i in range(n)], [2] * n,
        [f"r{i}" for i in range(n)])
    assert all(r.amount <= 125 for r in runs)
    assert sum(r.amount for r in runs) == 200
    assert len(runs) == 2  # 200 registers over 125-cap = 2 requests


def test_parse_comma_addresses():
    """snap7 comma shorthand (esp_s7read.erl:70 'DB2024,Int16.1224 |
    DB2024.DBX12.2'; the corpus s7_test.dfs uses DB4,R1 / DB4,DWORD7)."""
    assert parse_address("DB4,R1") == {
        "db_number": 4, "dtype": "float", "start": 1, "word_len": "d_word"}
    assert parse_address("DB4,DWORD7") == {
        "db_number": 4, "dtype": "d_word", "start": 7, "word_len": "d_word"}
    assert parse_address("DB4,DInt22") == {
        "db_number": 4, "dtype": "d_int", "start": 22, "word_len": "d_word"}
    assert parse_address("DB4,Int42") == {
        "db_number": 4, "dtype": "int", "start": 42, "word_len": "word"}
    # comma bools carry bit addresses like the dotted form
    assert parse_address("DB2024,X12.2") == {
        "db_number": 2024, "dtype": "bool", "start": 12 * 8 + 2,
        "word_len": "bit"}
    with pytest.raises(ValueError, match="unknown S7 dtype"):
        parse_address("DB4,Q12")


def test_comma_and_dotted_forms_plan_identically():
    dotted = plan_bulk_reads(["DB1.DBW0", "DB1.DBW2"], ["a", "b"])
    comma = plan_bulk_reads(["DB1,W0", "DB1,W2"], ["a", "b"])
    assert len(dotted) == len(comma) == 1
    assert dotted[0].start == comma[0].start
    assert dotted[0].amount == comma[0].amount == 2
