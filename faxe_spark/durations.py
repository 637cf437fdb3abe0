"""faxe duration literals (`ms|s|m|h|d|w`) -> milliseconds / Spark intervals.

Reference semantics: apps/faxe/test/faxe_time_tests.erl:19-47 (duration
parsing incl. negative durations); used by every window / polling `every`
/ `align` option in SURVEY.md §2.
"""

from __future__ import annotations

import re

_UNIT_MS = {
    "ms": 1,
    "s": 1000,
    "m": 60_000,
    "h": 3_600_000,
    "d": 86_400_000,
    "w": 604_800_000,
}

_TOKEN = re.compile(r"(\d+)(ms|s|m|h|d|w)")


def parse_duration_ms(text: str | int | float) -> int:
    """`'5m'` -> 300000. Accepts compound (`'1h30m'`), negative, or raw ms."""
    if isinstance(text, (int, float)):
        return int(text)
    s = text.strip()
    neg = s.startswith("-")
    if neg:
        s = s[1:]
    pos = 0
    total = 0
    for m in _TOKEN.finditer(s):
        if m.start() != pos:
            raise ValueError(f"invalid duration literal: {text!r}")
        total += int(m.group(1)) * _UNIT_MS[m.group(2)]
        pos = m.end()
    if pos != len(s) or pos == 0:
        raise ValueError(f"invalid duration literal: {text!r}")
    return -total if neg else total


def duration_to_interval(text: str | int | float) -> str:
    """Duration literal -> Spark interval string (for F.window etc.)."""
    ms = parse_duration_ms(text)
    if ms % 1000 == 0:
        return f"{ms // 1000} seconds"
    return f"{ms} milliseconds"
