"""Shared operator helpers."""

from __future__ import annotations

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

    The persist(MEMORY_AND_DISK)+eager-count alternative was A/B
    measured (VERDICT r8 #5, BASELINE.md round-9 journal: sf0.1 2.99
    vs 5.43 s, x10 7.75 vs 11.2 s) and REJECTED — besides losing on
    wall-clock, the CacheManager dedupes identical plans ACROSS calls
    (wrong for a one-shot operator call, right only for an explicit
    index lifecycle) and the un-unpersisted entries leak for the
    session lifetime (ADVICE r9). The knob that selected it is gone;
    this docstring is the record."""
    return df.localCheckpoint(eager=False)


def is_missing_input(e) -> bool:
    """True iff an AnalysisException means 'this input has no data
    files': PATH_NOT_FOUND (the directory does not exist) or
    UNABLE_TO_INFER_SCHEMA (it exists but holds no data files — e.g.
    `rm -rf pending/*` cleared the contents but kept the prefix, the
    normal shape on object stores). Everything else — unreadable
    files, a mistyped path that exists with junk in it — must stay a
    LOUD error (review find, twice: swallowing every
    AnalysisException turned broken crawl-state paths into silent
    state resets)."""
    klass = ""
    get = getattr(e, "getCondition", None) or getattr(
        e, "getErrorClass", None)
    if get is not None:
        klass = get() or ""
    return any(k in klass or k in str(e)
               for k in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"))


def orphan_stage_guard(spark, table: str) -> None:
    """Loud guard for the staged-rename device (compact_seen_fps /
    _staged_replace): a crash between DROP and RENAME leaves the
    destination missing and the state's ONLY copy under
    `<table>__stage`. Every reader that would treat a missing table
    as 'no state yet' must call this first — silently starting fresh
    would re-admit duplicates (fingerprint loops), renumber positions
    (shard counts) or discard the selection (DSIR best), and the next
    compaction would overwrite the orphan, destroying the state
    permanently. Recovery is one catalog op:
    ALTER TABLE <table>__stage RENAME TO <table>."""
    if (not spark.catalog.tableExists(table)
            and spark.catalog.tableExists(f"{table}__stage")):
        raise RuntimeError(
            f"state table '{table}' is missing but '{table}__stage' "
            "exists: a previous staged rewrite crashed between DROP "
            "and RENAME, and the stage holds the only copy of the "
            "state. Recover it with: ALTER TABLE "
            f"{table}__stage RENAME TO {table}")


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
