"""PLC bulk-read planning — the S7 address-coalescing optimizer.

The reference's s7read node plans its PLC polling by merging many small
variable reads into few contiguous bulk reads (esp_s7read.erl:356-455:
build_addresses -> find_bool_bytes / find_contiguous). The planning
algorithm is the valuable part: it is what turns a 200-tag
subscription into 3 wire requests, and it is reusable for any
block-addressed source (Modbus registers, memory-mapped files,
byte-range object-store reads). Since round 5 the plans also EXECUTE
live: sources/s7.py speaks ISO-on-TCP/S7comm (and sources/modbus.py
Modbus-TCP) against embedded test devices.

Ports faithfully:
- address parsing for the standard S7 syntax (DB2.DBX4.1 / DBB / DBW /
  DBD / DBD..REAL strings), bit starts in BITS like s7addr (byte_num =
  start div 8, esp_s7read.erl:366-369);
- dtype partitioning, (db, start) sorting (:428-433, db*10000 trick);
- bool byte-packing: adjacent bits in the same or next byte (bit 0)
  join one byte-run read, each alias remembering its bit offset within
  the run (:395-425 find_bool_bytes);
- contiguous merging for non-bools with the reference's word_len_size
  table (:436-469 find_contiguous — note int=1 is the reference's own
  table, word-length units rather than bytes, kept for parity).

Output: (partitions, aliases) where each partition is one bulk read
{db_number, start, amount, word_len, dtype} and aliases[i] maps the
partition's payload back to the requested names.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# esp_s7read.erl:457-469
WORD_LEN_SIZE = {
    "bool": 1, "byte": 1, "sint": 1, "usint": 1, "char": 1, "string": 1,
    "word": 2, "int": 1, "d_word": 4, "d_int": 4, "float": 4,
    "timer": 4, "counter": 4,
}

_ADDR = re.compile(
    r"^DB(?P<db>\d+)\.DB(?P<width>[XBWD])(?P<byte>\d+)"
    r"(?:\.(?P<bit>\d+))?(?:\.(?P<dtype>[A-Za-z_]+))?$", re.I)

_WIDTH_DTYPE = {"X": "bool", "B": "byte", "W": "word", "D": "d_word"}

# snap7/s7addr comma shorthand (esp_s7read.erl:70 — "DB2024,Int16.1224 |
# DB2024.DBX12.2"; the corpus uses DB4,R1 / DB4,DWORD7 / DB4,DInt22):
# DB<n>,<TYPE><byte>[.<bit>]
_ADDR_COMMA = re.compile(
    r"^DB(?P<db>\d+)\s*,\s*(?P<type>[A-Za-z_]+)(?P<byte>\d+)"
    r"(?:\.(?P<bit>\d+))?$")

_COMMA_DTYPE = {
    "x": "bool", "b": "byte", "byte": "byte", "c": "char", "char": "char",
    "w": "word", "word": "word", "i": "int", "int": "int",
    "d": "d_word", "dword": "d_word", "di": "d_int", "dint": "d_int",
    "r": "float", "real": "float", "s": "string", "string": "string",
    "sint": "sint", "usint": "usint", "timer": "timer", "counter": "counter",
}

# comma addresses carry no [XBWD] width letter — word_len follows the
# dtype's wire width (the reference's byte/word/d_word PDU classes)
_DTYPE_WORD_LEN = {
    "bool": "bit", "byte": "byte", "sint": "byte", "usint": "byte",
    "char": "byte", "string": "byte", "word": "word", "int": "word",
    "d_word": "d_word", "d_int": "d_word", "float": "d_word",
    "timer": "d_word", "counter": "d_word",
}

# Spark column type each planned dtype decodes to (for the typed stub
# frame a wire-less container compiles the node into)
SPARK_TYPE = {
    # bool = 0/1 int: the reference emits S7 bits numerically — corpus
    # macros compare them to integer consts (macro1.dfs: State.Err == 2)
    "bool": "int", "byte": "int", "sint": "int", "usint": "int",
    "char": "string", "string": "string", "word": "int", "int": "int",
    "d_word": "bigint", "d_int": "bigint", "float": "double",
    "timer": "bigint", "counter": "bigint",
}


# width-suffixed comma form: DB2024,Int16.1224 = 16-bit int at byte
# 1224 (the esp_s7read.erl:70 example shape) — the digits after the
# type are a BIT WIDTH, the offset follows the dot
_WIDTH_SUFFIX = {
    ("int", 16): "int", ("int", 32): "d_int", ("dint", 32): "d_int",
    ("word", 16): "word", ("dword", 32): "d_word",
    ("real", 32): "float", ("r", 32): "float", ("uint", 16): "word",
}


def _parse_comma_address(address: str) -> dict | None:
    m = _ADDR_COMMA.match(address.strip())
    if not m:
        return None
    type_tok = m.group("type").lower()
    db = int(m.group("db"))
    if m.group("bit") is not None:
        wide = _WIDTH_SUFFIX.get((type_tok, int(m.group("byte"))))
        if wide is not None:
            # DB4,Int16.1224: byte group held the bit width, the
            # dot group holds the actual byte offset
            return {"db_number": db, "dtype": wide,
                    "start": int(m.group("bit")),
                    "word_len": _DTYPE_WORD_LEN[wide]}
        if _COMMA_DTYPE.get(type_tok) != "bool":
            raise ValueError(
                f"ambiguous S7 comma address {address!r}: a .suffix is "
                f"only valid for bools (bit) or width-suffixed types "
                f"(Int16/Int32/DWord32/Real32)")
    dtype = _COMMA_DTYPE.get(type_tok)
    if dtype is None:
        raise ValueError(f"unknown S7 dtype {m.group('type')!r} "
                         f"in {address!r}")
    byte = int(m.group("byte"))
    if dtype == "bool":
        bit = int(m.group("bit") or 0)
        return {"db_number": db, "dtype": "bool", "start": byte * 8 + bit,
                "word_len": "bit"}
    return {"db_number": db, "dtype": dtype, "start": byte,
            "word_len": _DTYPE_WORD_LEN[dtype]}


def parse_address(address: str) -> dict:
    """Parse one S7 address string into the planner's address map.
    Bool starts are in bits (byte*8 + bit), everything else in bytes —
    matching s7addr:parse as consumed by esp_s7read.erl:366-369.
    Accepts both the dotted (DB2.DBX4.1) and the snap7 comma
    (DB4,R1) syntaxes the corpus scripts mix."""
    comma = _parse_comma_address(address)
    if comma is not None:
        return comma
    m = _ADDR.match(address.strip())
    if not m:
        raise ValueError(f"unparseable S7 address {address!r} "
                         f"(expected DB<n>.DB[XBWD]<byte>[.bit][.dtype] "
                         f"or DB<n>,<Type><byte>[.<bit>])")
    db = int(m.group("db"))
    width = m.group("width").upper()
    byte = int(m.group("byte"))
    dtype = (m.group("dtype") or _WIDTH_DTYPE[width]).lower()
    if width == "X":
        bit = int(m.group("bit") or 0)
        return {"db_number": db, "dtype": "bool", "start": byte * 8 + bit,
                "word_len": "bit"}
    if dtype not in WORD_LEN_SIZE:
        raise ValueError(f"unknown S7 dtype {dtype!r} in {address!r}")
    return {"db_number": db, "dtype": dtype, "start": byte,
            "word_len": {"B": "byte", "W": "word", "D": "d_word"}[width]}


@dataclass
class BulkRead:
    """One coalesced wire request."""
    db_number: int
    start: int          # byte offset of the run
    amount: int         # number of word_len units to read
    word_len: str
    dtype: str
    aliases: list = field(default_factory=list)
    # bool runs: aliases are (name, 'bool_byte', bit_offset_within_run);
    # non-bool runs: (name, dtype) in payload order


def _sort_by_start(items: list[dict]) -> list[dict]:
    # db*10000 keeps runs from different DBs apart (esp_s7read.erl:431)
    return sorted(items, key=lambda e: e["db_number"] * 10000 + e["start"])


def _find_bool_bytes(bools: list[dict]) -> list[BulkRead]:
    """esp_s7read.erl:395-425: pack bit addresses into byte-run reads.
    A bit joins the current run when it lives in the run's last byte, or
    in the immediately following byte starting at bit 0."""
    runs: list[BulkRead] = []
    cur: BulkRead | None = None
    last_byte = None
    for e in bools:
        byte_num, bit_num = e["start"] // 8, e["start"] % 8
        if cur is not None and e["db_number"] == cur.db_number and (
                byte_num == last_byte
                or (byte_num == last_byte + 1 and bit_num == 0)):
            if byte_num == last_byte + 1:
                cur.amount += 1
            cur.aliases.append(
                (e["as"], "bool_byte", bit_num + (byte_num - cur.start) * 8))
            last_byte = byte_num
        else:
            if cur is not None:
                runs.append(cur)
            cur = BulkRead(db_number=e["db_number"], start=byte_num, amount=1,
                           word_len="byte", dtype="bool",
                           aliases=[(e["as"], "bool_byte", bit_num)])
            last_byte = byte_num
    if cur is not None:
        runs.append(cur)
    return runs


def _find_contiguous(items: list[dict]) -> list[BulkRead]:
    """esp_s7read.erl:436-455: merge same-dtype same-DB addresses whose
    starts are exactly word_len_size(dtype) apart into one run."""
    runs: list[BulkRead] = []
    cur: BulkRead | None = None
    last_start = None
    for e in items:
        step = WORD_LEN_SIZE[e["dtype"]]
        if cur is not None and e["dtype"] == cur.dtype \
                and e["db_number"] == cur.db_number \
                and last_start + step == e["start"]:
            cur.amount += 1
            cur.aliases.append((e["as"], e["dtype"]))
        else:
            if cur is not None:
                runs.append(cur)
            cur = BulkRead(db_number=e["db_number"], start=e["start"], amount=1,
                           word_len=e["word_len"], dtype=e["dtype"],
                           aliases=[(e["as"], e["dtype"])])
        last_start = e["start"]
    if cur is not None:
        runs.append(cur)
    return runs


def plan_bulk_reads(addresses: list[str], aliases: list[str]) -> list[BulkRead]:
    """The optimizer entry point (build_addresses, esp_s7read.erl:356-392):
    parse, partition by dtype, sort by (db, start), coalesce bools into
    byte runs and non-bools into contiguous runs. len(result) is the
    wire-request count — the number a 200-tag poll actually pays."""
    if len(addresses) != len(aliases):
        raise ValueError("addresses and aliases must have the same length")
    parsed = []
    for addr, name in zip(addresses, aliases):
        p = parse_address(addr)
        p["as"] = name
        parsed.append(p)
    by_dtype: dict[str, list[dict]] = {}
    for p in parsed:
        by_dtype.setdefault(p["dtype"], []).append(p)
    bools = _sort_by_start(by_dtype.pop("bool", []))
    runs = _find_bool_bytes(bools)
    for _dtype, items in sorted(by_dtype.items()):
        runs.extend(_find_contiguous(_sort_by_start(items)))
    return runs


def bit_count(runs: list[BulkRead]) -> int:
    """Total bits on the wire (esp_s7read.erl:472-486) — the PDU budget
    a reader uses to split plans across request frames."""
    per_unit = {"bit": 1, "byte": 8, "word": 16, "d_word": 32, "real": 32}
    return sum(per_unit[r.word_len] * r.amount for r in runs)


# ---------------------------------------------------------------------------
# Modbus request planning (esp_modbus_read.erl:228-290 build_requests /
# find_contiguous)
# ---------------------------------------------------------------------------

MODBUS_FUNCTIONS = ("coils", "hregs", "iregs", "inputs", "memory")


def plan_modbus_reads(functions: list[str], starts: list[int],
                      counts: list[int], aliases: list[str], *,
                      outputs: list[str] | None = None,
                      signed: list[bool] | None = None,
                      max_per_request: int = 125) -> list[BulkRead]:
    """Coalesce Modbus register reads (esp_modbus_read.erl:274-290):
    requests with the same function code and the same decode options
    whose address ranges are back-to-back (last_start + amount == start)
    merge into one wire request. On top of the reference's merge, runs
    longer than `max_per_request` registers are SPLIT — the Modbus
    protocol caps one read at 125 holding registers / 2000 coils
    (public spec), which the reference leaves to the device to reject.

    Returns BulkRead rows: db_number carries the function-code index,
    dtype the function name, word_len the decode opts repr."""
    if outputs is None:
        outputs = [""] * len(functions)
    if signed is None:
        signed = [None] * len(functions)
    if not (len(functions) == len(starts) == len(counts) == len(aliases)
            == len(outputs) == len(signed)):
        raise ValueError("functions/starts/counts/aliases/outputs/signed "
                         "must be the same length")
    for f in functions:
        if f not in MODBUS_FUNCTIONS:
            raise ValueError(f"unknown modbus function {f!r}")
    reqs = sorted(
        ({"function": f, "start": s, "amount": c, "as": a,
          "opts": (o or "", bool(sg) if sg is not None else None)}
         for f, s, c, a, o, sg in
         zip(functions, starts, counts, aliases, outputs, signed)),
        key=lambda e: (e["function"], e["opts"], e["start"]))
    runs: list[BulkRead] = []
    cur: BulkRead | None = None
    cur_opts = None
    last_start = None
    elem_amount = None
    for e in reqs:
        # the reference's merge condition (LastStart + Amount == Start,
        # esp_modbus_read.erl:278) implicitly assumes every request in a
        # run has the same register width (its total is count*Amount) —
        # we require that width equality explicitly, so a mixed-width
        # sequence can never merge misaligned; identical behavior on
        # uniform-width inputs (every corpus script)
        contiguous = (cur is not None and e["function"] == cur.dtype
                      and e["opts"] == cur_opts
                      and e["amount"] == elem_amount
                      and last_start + e["amount"] == e["start"]
                      and cur.amount + e["amount"] <= max_per_request)
        if contiguous:
            cur.amount += e["amount"]
            cur.aliases.append(e["as"])
        else:
            if cur is not None:
                runs.append(cur)
            cur = BulkRead(db_number=MODBUS_FUNCTIONS.index(e["function"]),
                           start=e["start"], amount=e["amount"],
                           word_len=repr(e["opts"]), dtype=e["function"],
                           aliases=[e["as"]])
            cur_opts = e["opts"]
            elem_amount = e["amount"]
        last_start = e["start"]
    if cur is not None:
        runs.append(cur)
    return runs
