"""Flow: the pipeline builder — the DFS graph (SURVEY.md §3) as a Python
DSL. Each method mirrors a reference node; `build(spark)` composes the
operator functions into one DataFrame plan (Catalyst fuses the chain —
the per-node Erlang processes and mailbox hops have no runtime analog).

Compile-time checks mirror faxe_dfs.erl:
- unknown node options raise with a "did you mean" suggestion
  (faxe_dfs.erl:355-367 Levenshtein);
- the point/batch item-kind check on every edge (faxe_dfs.erl:165-183):
  windows emit 'batch', `aggregate` wants 'batch' (or explicit group
  keys), scalar transforms want 'point'.
"""

from __future__ import annotations

import difflib
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from faxe_spark import operators as ops
from faxe_spark.durations import duration_to_interval
from faxe_spark.tables import load_table


class FlowBuildError(ValueError):
    pass


def _check_kwargs(node: str, given: dict, allowed: set[str]) -> None:
    for k in given:
        if k not in allowed:
            hint = difflib.get_close_matches(k, allowed, n=1)
            extra = f" Did you mean '{hint[0]}'?" if hint else ""
            raise FlowBuildError(f"Unknown option '{k}' for node '{node}'.{extra}")


@dataclass
class _Step:
    node: str
    wants: str  # 'point' | 'batch' | 'any'
    emits: str
    apply: Callable[[DataFrame, "Flow"], DataFrame]


@dataclass
class Flow:
    """Immutable-ish chained builder. Example (SURVEY §7.5 slice):

    >>> f = (Flow.parquet_source("events", event_time="ts")
    ...      .where("value > 0")
    ...      .win_time(period="5m")
    ...      .aggregate([("value", "avg", "v_avg"), ("value", "count", "v_cnt")],
    ...                 by=["event_type"]))
    >>> df = f.build(spark, sf_dir)
    """

    _source: Callable[[SparkSession, str], DataFrame] | None = None
    _steps: list[_Step] = field(default_factory=list)
    _kind: str = "point"
    _event_time: str = "ts"
    _window: Any = None  # pending window Column (the open data_batch)
    _group_keys: list[str] = field(default_factory=list)

    # -- sources ----------------------------------------------------------
    @staticmethod
    def parquet_source(table: str, event_time: str = "ts") -> "Flow":
        f = Flow()
        f._source = lambda spark, sf_dir: load_table(spark, sf_dir, table)
        f._event_time = event_time
        return f

    @staticmethod
    def dataframe_source(df: DataFrame, event_time: str = "ts") -> "Flow":
        f = Flow()
        f._source = lambda spark, sf_dir: df
        f._event_time = event_time
        return f

    @staticmethod
    def stream_source(df: DataFrame, event_time: str = "ts") -> "Flow":
        """Streaming source: any readStream DataFrame (stream_parquet,
        socket_source, kafka_source). Build with `build_stream()`."""
        if not df.isStreaming:
            raise FlowBuildError("stream_source needs a streaming DataFrame "
                                 "(spark.readStream / sources.socket_source / "
                                 "streaming.stream_parquet)")
        f = Flow()
        f._source = lambda spark, sf_dir: df
        f._event_time = event_time
        return f

    # -- internals --------------------------------------------------------
    def _push(self, node: str, wants: str, emits: str,
              fn: Callable[[DataFrame, "Flow"], DataFrame]) -> "Flow":
        if wants != "any" and wants != self._kind:
            raise FlowBuildError(
                f"node '{node}' wants item kind '{wants}' but the flow "
                f"currently emits '{self._kind}' (faxe edge type-check, "
                f"faxe_dfs.erl:165-183)")
        self._steps.append(_Step(node, wants, emits, fn))
        if emits != "same":
            self._kind = emits
        return self

    # -- scalar / projection nodes ---------------------------------------
    def where(self, predicate) -> "Flow":
        return self._push("where", "point", "same", lambda df, f: ops.where(df, predicate))

    def eval(self, **exprs) -> "Flow":
        return self._push("eval", "point", "same", lambda df, f: ops.eval_lambdas(df, exprs))

    def set(self, **values) -> "Flow":
        return self._push("set", "point", "same", lambda df, f: ops.set_fields(df, values))

    def default(self, **defaults) -> "Flow":
        return self._push("default", "point", "same",
                          lambda df, f: ops.default_fields(df, defaults))

    def keep(self, fields, aliases=None) -> "Flow":
        return self._push("keep", "point", "same", lambda df, f: ops.keep(df, fields, aliases))

    def delete(self, fields, when=None) -> "Flow":
        return self._push("delete", "point", "same",
                          lambda df, f: ops.delete(df, fields, when=when))

    def rename(self, **mapping) -> "Flow":
        return self._push("rename", "point", "same", lambda df, f: ops.rename(df, mapping))

    def case(self, conditions, values, alias, default=None) -> "Flow":
        return self._push("case", "point", "same",
                          lambda df, f: ops.case_when(df, conditions, values, alias, default))

    def sample(self, n=None, every=None, **kw) -> "Flow":
        _check_kwargs("sample", kw, {"tiebreak"})
        if n is not None:
            return self._push("sample", "point", "same",
                              lambda df, f: ops.sample_nth(df, n, by=f._group_keys,
                                                           ts_col=f._event_time, **kw))
        return self._push("sample", "point", "same",
                          lambda df, f: ops.sample_per(df, every, by=f._group_keys,
                                                       ts_col=f._event_time, **kw))

    def change_detect(self, fields, **kw) -> "Flow":
        _check_kwargs("change_detect", kw, {"tiebreak", "emit_first"})
        return self._push("change_detect", "point", "same",
                          lambda df, f: ops.change_detect(df, fields, by=f._group_keys,
                                                          ts_col=f._event_time, **kw))

    def value_diff(self, fields, **kw) -> "Flow":
        _check_kwargs("value_diff", kw, {"mode", "tiebreak", "suffix", "default"})
        return self._push("value_diff", "point", "same",
                          lambda df, f: ops.value_diff(df, fields, by=f._group_keys,
                                                       ts_col=f._event_time, **kw))

    # -- grouping (esp_group_by: the subgraph-cloning machinery reduces to
    #    remembering the keys — Catalyst parallelizes per key natively) ---
    def group_by(self, *keys: str) -> "Flow":
        def apply(df, f):
            return df
        self._group_keys = list(keys)
        return self._push("group_by", "point", "same", apply)

    # -- windows: point -> batch ------------------------------------------
    def win_time(self, period: str, every: str | None = None) -> "Flow":
        def apply(df, f):
            f._window = ops.win_time(f._event_time, period, every).alias("window")
            return df
        return self._push("win_time", "point", "batch", apply)

    def win_session(self, timeout: str) -> "Flow":
        def apply(df, f):
            f._window = ops.win_session(f._event_time, timeout).alias("session")
            return df
        return self._push("win_session", "point", "batch", apply)

    def batch(self, size: int, tiebreak: str | None = None) -> "Flow":
        def apply(df, f):
            f._window = None
            out = ops.batch_by_count(df, size, by=f._group_keys,
                                     ts_col=f._event_time, order_tiebreak=tiebreak)
            f._group_keys = [*f._group_keys, "batch_id"]
            return out
        return self._push("batch", "point", "batch", apply)

    def unbatch(self) -> "Flow":
        """faxe `unbatch` (esp_unbatch.erl:26): flatten a batch back to
        points. In the row model the rows never left — this just closes
        the pending window/batch grouping."""
        def apply(df, f):
            f._window = None
            if f._group_keys and f._group_keys[-1] == "batch_id":
                f._group_keys = f._group_keys[:-1]
                return df.drop("batch_id")
            return df
        return self._push("unbatch", "batch", "point", apply)

    def group_union(self) -> "Flow":
        """faxe `group_union` (esp_group_union.erl:14): merge grouped
        sub-streams back — a no-op in Spark (groupBy output is already
        one DataFrame); clears the group keys."""
        def apply(df, f):
            f._group_keys = []
            return df
        return self._push("group_union", "any", "same", apply)

    # -- time-series similarity (operators/timeseries.py): the Matrix-
    #    Profile family on the product surface (VERDICT r6 #7). The
    #    series key comes from the flow's group_by (exactly one key),
    #    the timestamp from event_time — same contract as sample/diff.
    def _ts_key(self) -> str:
        if len(self._group_keys) != 1:
            raise FlowBuildError(
                "time-series nodes need exactly one group_by key as the "
                f"series key; flow has {self._group_keys or 'none'} — "
                "add .group_by('<key>') before the node")
        return self._group_keys[0]

    def subsequence_topk(self, pattern, *, value: str = "value",
                         k: int = 10, per_key: bool = False, **kw) -> "Flow":
        """Top-k windows nearest `pattern` under z-normalized distance
        (UCR); per_key=False ranks globally — pass salt there."""
        _check_kwargs("subsequence_topk", kw, {"tiebreak", "salt"})
        return self._push(
            "subsequence_topk", "point", "point",
            lambda df, f: ops.subsequence_topk(
                df, pattern, key_col=f._ts_key(), ts_col=f._event_time,
                value_col=value, k=k, per_key=per_key, **kw))

    def subsequence_topk_sax(self, pattern, *, value: str = "value",
                             k: int = 10, w: int = 4, alphabet: int = 4,
                             per_key: bool = False, **kw) -> "Flow":
        """SAX-pruned subsequence_topk (the scale path: score only the
        query word's bucket)."""
        _check_kwargs("subsequence_topk_sax", kw, {"tiebreak", "salt"})
        return self._push(
            "subsequence_topk_sax", "point", "point",
            lambda df, f: ops.subsequence_topk_sax(
                df, pattern, key_col=f._ts_key(), ts_col=f._event_time,
                value_col=value, k=k, w=w, alphabet=alphabet,
                per_key=per_key, **kw))

    def motif_topk(self, *, m: int, value: str = "value", k: int = 3,
                   per_key: bool = True, **kw) -> "Flow":
        """Top-k most-correlated window pairs per series (Matrix-Profile
        motifs) outside the exclusion zone."""
        _check_kwargs("motif_topk", kw,
                      {"exclusion", "min_corr", "tiebreak", "salt"})
        return self._push(
            "motif_topk", "point", "point",
            lambda df, f: ops.motif_topk(
                df, key_col=f._ts_key(), ts_col=f._event_time,
                value_col=value, m=m, k=k, per_key=per_key, **kw))

    def discord_topk(self, *, m: int, value: str = "value", k: int = 3,
                     per_key: bool = True, **kw) -> "Flow":
        """Top-k windows whose nearest neighbor is farthest (Matrix-
        Profile discords — the anomaly lane)."""
        _check_kwargs("discord_topk", kw, {"exclusion", "tiebreak", "salt"})
        return self._push(
            "discord_topk", "point", "point",
            lambda df, f: ops.discord_topk(
                df, key_col=f._ts_key(), ts_col=f._event_time,
                value_col=value, m=m, k=k, per_key=per_key, **kw))

    def match_pattern(self, pattern, *, value: str = "value",
                      max_dist: float = 0.5, **kw) -> "Flow":
        """Shape ALERTING (VERDICT r7 #6): emit (key, end_ts_ms, dist)
        for every window within `max_dist` of the pattern under
        z-normalized distance. On a stream_source build_stream this is
        the stateful matcher (streaming.stateful.subsequence_match_
        stream — state per key is exactly the m-1 reading tail, shapes
        straddling micro-batch boundaries included); on a batch build
        it is the exact batch analog, pinned equal cross-lane. Chain
        a sink for the alert: .match_pattern([...]) then write the
        result to http_post/mqtt_publish like any deadman alarm.
        `tiebreak` orders duplicate timestamps in the BATCH lane only —
        the stream lane's order is arrival within each micro-batch
        (sorted by ts per batch, the matcher's documented policy)."""
        _check_kwargs("match_pattern", kw, {"tiebreak"})

        def apply(df, f):
            if df.isStreaming:
                from faxe_spark.streaming.stateful import \
                    subsequence_match_stream
                return subsequence_match_stream(
                    df, pattern, key_col=f._ts_key(),
                    ts_col=f._event_time, value_col=value,
                    max_dist=max_dist)
            return ops.subsequence_match(
                df, pattern, key_col=f._ts_key(), ts_col=f._event_time,
                value_col=value, max_dist=max_dist, **kw)
        return self._push("match_pattern", "point", "point", apply)

    # -- training-corpus prep (VERDICT r8 #6: the trainprep ops on the
    #    builder surface, mirroring how match_pattern landed in r8) ------
    def dsir_resample(self, *, k: int, target, text: str = "text",
                      id: str = "doc_id", **kw) -> "Flow":
        """DSIR selection as a flow node: keep the k documents whose
        hashed-ngram importance weight toward `target` is highest.
        `target` is EITHER a boolean SQL expression / Column over this
        flow's rows (the labeled-subset form, fit in one corpus scan)
        OR a DataFrame (a separate target corpus, the paper's usual
        shape). Compiles to operators.trainprep.dsir_resample — scan +
        salted top-k, weights ride the plan as a literal map."""
        _check_kwargs("dsir_resample", kw,
                      {"buckets", "seed", "scale", "salt"})

        def apply(df, f):
            import pyspark.sql.functions as F

            from faxe_spark.operators import trainprep as tp
            if isinstance(target, DataFrame):
                return tp.dsir_resample(df, target, k=k, text_col=text,
                                        id_col=id, **kw)
            flag = F.expr(target) if isinstance(target, str) else target
            return tp.dsir_resample(df, target_flag=flag, k=k,
                                    text_col=text, id_col=id, **kw)
        return self._push("dsir_resample", "point", "point", apply)

    def shard(self, n_shards: int, *, id: str = "doc_id", **kw) -> "Flow":
        """Deterministic global shuffle as a flow node: every row gets
        `shard` in [0, n_shards) and `shard_pos` (its position in the
        shard's shuffled order) — operators.trainprep.shard_assign's
        one-shuffle layout; pick n_shards at the writer's parallelism."""
        _check_kwargs("shard", kw, {"seed", "keep_hash"})

        def apply(df, f):
            from faxe_spark.operators.trainprep import shard_assign
            return shard_assign(df, n_shards=n_shards, id_col=id, **kw)
        return self._push("shard", "point", "point", apply)

    def split(self, splits: dict | None = None, *, id: str = "doc_id",
              seed: str = "split", **fractions) -> "Flow":
        """Deterministic train/val/test assignment as a flow node:
        `.split(train=0.9, val=0.05, test=0.05)` adds a `split` column
        via operators.trainprep.split_assign (scan-stage, no shuffle;
        fractions summing under 1 leave the remainder split = NULL).
        Because **fractions is the catch-all, a mistyped OPTION would
        silently become a split name (review find) — non-numeric
        values fail loud here, and a split literally named 'id' or
        'seed' is expressible via the dict form:
        `.split({"seed": 0.5, "id": 0.5})`."""
        merged = {**(splits or {}), **fractions}
        if not merged:
            raise FlowBuildError(
                "split needs at least one named fraction, e.g. "
                ".split(train=0.9, val=0.1)")
        bad = [k for k, v in merged.items()
               if isinstance(v, bool) or not isinstance(v, (int, float))]
        if bad:
            raise FlowBuildError(
                f"split fractions must be numbers; {bad} are not — a "
                f"mistyped option lands here (only id=/seed= are "
                f"options; use the dict form for splits named like "
                f"them)")

        def apply(df, f):
            from faxe_spark.operators.trainprep import split_assign
            return split_assign(df, merged, id_col=id, seed=seed)
        return self._push("split", "point", "point", apply)

    def shard_append(self, n_shards: int, *, counts=None,
                     id: str = "doc_id", seed: str = "shuffle") -> "Flow":
        """Append-stable shard layout as a flow node (VERDICT r9 #4:
        the epoch-fold form on the builder surface, carried state as
        an argument like host_cap_incremental's library shape):
        `counts` is the (shard, _cnt) state a prior epoch returned —
        None for the first epoch — and the node emits the appended
        docs, positions offset past everything already written.
        The updated state is derivable from the output
        (`counts ⊎ out.groupBy('shard').count()`) and equals what
        operators.trainprep.shard_append returns; a long-running crawl
        loop should use the library tuple form or
        streaming.stateful.shard_append_pipeline — this node is the
        one-epoch member of that fold."""

        def apply(df, f):
            from faxe_spark.operators.trainprep import _shard_append_core
            appended, _ = _shard_append_core(
                df, counts, n_shards=n_shards, id_col=id, seed=seed,
                checkpoint=True)
            return appended
        return self._push("shard_append", "point", "point", apply)

    def dsir_select(self, *, k: int, weights, best=None,
                    text: str = "text", id: str = "doc_id",
                    **kw) -> "Flow":
        """Frozen-weight DSIR selection as a flow node (VERDICT r9
        #4): score this flow's rows against a weight table fit ONCE
        (`weights` = the {bucket: lam} dict from load_dsir_weights,
        or a persisted-weights NAME to load at build time) and emit
        the top-k of `best ∪ this epoch` — the output IS the updated
        carried state (exactly k rows), so the fold form is the
        node's natural shape: feed the built result back as `best`
        next epoch. Fold == global top-k (id tiebreak), the
        dsir_select_incr_batches oracle claim."""
        _check_kwargs("dsir_select", kw,
                      {"buckets", "seed", "scale", "salt"})

        def apply(df, f):
            from faxe_spark.operators import trainprep as tp
            w = weights
            if isinstance(w, str):
                w = tp.load_dsir_weights(df.sparkSession, name=w)
            return tp.dsir_select_incremental(
                df, best, weights=w, k=k, text_col=text, id_col=id,
                **kw)
        return self._push("dsir_select", "point", "point", apply)

    # -- aggregation: batch -> point --------------------------------------
    def aggregate(self, specs, by: list[str] | None = None, round_to=None) -> "Flow":
        def apply(df, f):
            keys = list(by or []) + f._group_keys
            if f._window is not None:
                keys = [f._window, *keys]
            f._window = None
            return ops.aggregate(df, specs, by=keys, ts_col=f._event_time,
                                 round_to=round_to)
        return self._push("aggregate", "batch", "point", apply)

    # -- build -------------------------------------------------------------
    def build(self, spark: SparkSession, sf_dir: str = "") -> DataFrame:
        if self._source is None:
            raise FlowBuildError("flow has no source node")
        if self._kind == "batch":
            raise FlowBuildError(
                "flow ends with an open window/batch — add an aggregate "
                "node (faxe: win_* emits data_batch; a sink wants points)")
        # steps mutate builder state while applying (batch appends
        # 'batch_id' to _group_keys, win_* set _window); snapshot/restore
        # so build() is repeatable on the same Flow instance.
        snap = (self._window, list(self._group_keys))
        try:
            df = self._source(spark, sf_dir)
            for step in self._steps:
                df = step.apply(df, self)
            return df
        finally:
            self._window, self._group_keys = snap[0], list(snap[1])

    # nodes with an incremental (Structured Streaming) physical plan.
    # Everything else either needs an unbounded window function
    # (change_detect/value_diff/top -> use the faxe_spark.streaming
    # stateful analogs) or a global sort/batch semantics.
    _STREAM_SAFE = frozenset({
        "where", "eval", "set", "default", "keep", "delete", "rename",
        "case", "if", "group_by", "win_time", "win_session", "aggregate",
        "group_union", "match_pattern",
        # split_assign is a pure scan-stage column expression (no
        # window/sort/collect) — it compiles on a streaming DataFrame;
        # shard (row_number window) and dsir_resample (driver-side
        # weight fit + global top-k) are batch-only by construction.
        "split",
    })

    def build_stream(self, spark: SparkSession, *, watermark: str = "0s",
                     sf_dir: str = "") -> DataFrame:
        """Compile the same flow onto Structured Streaming: the source
        must be a stream_source; the event-time column gets `watermark`
        lateness; windows/aggregations run incrementally (append mode
        emits a window once the watermark closes it — exactly the
        reference's `win_time` emit-on-expiry, SURVEY §2.5).

        Distinct/median aggregate specs need multi-pass plans that
        streaming can't run incrementally — Spark rejects them at
        stream start; keep streaming aggregates algebraic."""
        if self._source is None:
            raise FlowBuildError("flow has no source node")
        for step in self._steps:
            if step.node not in self._STREAM_SAFE:
                raise FlowBuildError(
                    f"node '{step.node}' has no incremental streaming plan; "
                    f"use its faxe_spark.streaming stateful analog, or "
                    f"batch build()")
        snap = (self._window, list(self._group_keys))
        try:
            df = self._source(spark, sf_dir)
            if not df.isStreaming:
                raise FlowBuildError("build_stream needs a stream_source flow")
            df = df.withWatermark(self._event_time, duration_to_interval(watermark))
            for step in self._steps:
                df = step.apply(df, self)
            return df
        finally:
            self._window, self._group_keys = snap[0], list(snap[1])
