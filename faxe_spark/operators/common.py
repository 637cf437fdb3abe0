"""Shared operator helpers."""

from __future__ import annotations

import warnings

_warned: set[str] = set()


def warn_global_order(node: str) -> None:
    """An ordered window with no partition keys forces every row through
    ONE task — fine for a single device stream (the reference's model),
    a bottleneck at 100 TB. Keyed use (`by=...`, the group_by analog) is
    the scalable path; warn once per operator so the hazard is visible
    instead of silent."""
    if node in _warned:
        return
    _warned.add(node)
    warnings.warn(
        f"{node}: ordered window without partition keys runs on a single "
        f"task; pass by=<keys> (faxe group_by) for parallel execution",
        stacklevel=3)
