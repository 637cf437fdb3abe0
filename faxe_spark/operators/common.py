"""Shared operator helpers."""

from __future__ import annotations

import os
import warnings

_warned: set[str] = set()


def barrier(df):
    """Multi-reference barrier for a subtree several downstream
    references share (the _windows_z build, cosine_pairs' per-key
    counts): materialize once, read many.

    Default is a LAZY localCheckpoint (eager=False): deferred to the
    first action, not deduped across separate operator calls, plan
    truncated so every reference reads the materialized blocks.
    Documented trade (ADVICE r7): blocks are executor-local and
    non-replicated — an executor loss after materialization fails the
    job (retry re-runs it) instead of recomputing from lineage; a
    deployment that cannot retry should configure a reliable
    checkpoint dir instead.

    FAXE_SPARK_BARRIER=persist switches to the measured alternative
    (VERDICT r8 #5 A/B): persist(MEMORY_AND_DISK) + an eager count.
    Lineage is kept (executor loss recomputes), but the CacheManager
    dedupes identical plans ACROSS calls — repeated one-shot calls
    read a shared cache entry, which is wrong for an operator call
    (right only for an explicit index lifecycle) and makes min-of-N
    benchmarks measure the cache. See BASELINE.md round-9 journal for
    the measured numbers; the default won."""
    mode = os.environ.get("FAXE_SPARK_BARRIER", "checkpoint")
    if mode == "persist":
        from pyspark import StorageLevel

        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        df.count()
        return df
    return df.localCheckpoint(eager=False)


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
