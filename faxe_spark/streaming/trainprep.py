"""Incremental (streaming) training-data preparation.

The batch trainprep flagship (registry trainprep_pipeline) runs
filter -> clean -> dedup -> mix as one job over a frozen corpus. A
continuously-crawled corpus wants the same contract incrementally:
every arriving micro-batch is quality-filtered, mixture-sampled and
deduplicated against EVERYTHING seen so far, without reprocessing the
past. The scan-stage text operators are stateless Column expressions
(proven stream-compatible in round 4 — test_scan_stage_text_ops_run_
on_streams), mix_sample is a pure hash filter, and the only stateful
step — exact dedup — rides Spark's state store via
dedup_exact_stream. The result is a readStream-to-writeStream pipeline
whose output equals the batch pipeline run over the concatenated
batches (the golden equality test in tests/test_streaming.py).

Mixture rates come from a STATIC census (plan_mixture over a frozen
reference corpus or the previous crawl's statistics): rates must be a
pure function of configuration, not of the stream — a rate computed
from the unbounded stream itself would be non-deterministic under
re-partitioning and replay.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def trainprep_stream(stream_df: DataFrame, *, rates: dict[str, float],
                     min_quality: float = 0.3, text_col: str = "text",
                     domain_col: str = "source", key_col: str = "doc_id",
                     ts_col: str = "ts",
                     watermark: str = "1 hour") -> DataFrame:
    """quality filter -> deterministic mixture sampling -> streaming
    exact dedup, all streaming-safe:

    - the quality gate and mix_sample are scan-stage filters (no
      shuffle, no state) — they run identically on batch and stream;
    - dedup keeps the FIRST arrival of each content fingerprint within
      the watermark horizon (dedup_exact_stream), which equals the
      batch dedup_incremental min-id keeper whenever ids are assigned
      in arrival order (the crawl convention).

    `rates` is the plan_mixture output computed from a static census —
    see the module doc for why it must not be derived from the stream.
    """
    from faxe_spark.operators.text import quality_score
    from faxe_spark.operators.trainprep import mix_sample
    from faxe_spark.streaming.stateful import dedup_exact_stream

    out = stream_df.filter(
        quality_score(F.coalesce(F.col(text_col).cast("string"),
                                 F.lit(""))) >= min_quality)
    out = mix_sample(out, rates, domain_col=domain_col, key_col=key_col)
    return dedup_exact_stream(out, text_col=text_col, ts_col=ts_col,
                              watermark=watermark)


def trainprep_batch_reference(batches: list[DataFrame], *,
                              rates: dict[str, float],
                              min_quality: float = 0.3,
                              text_col: str = "text",
                              domain_col: str = "source",
                              key_col: str = "doc_id") -> DataFrame:
    """The batch analog the stream must reproduce: the same filters,
    then dedup_incremental folded over the batches in order (min-id
    keeper within each batch, seen-set anti-join across batches).
    Test-support surface for the golden equality check."""
    from faxe_spark.operators.dedup import dedup_incremental
    from faxe_spark.operators.text import quality_score
    from faxe_spark.operators.trainprep import mix_sample

    seen = None
    fresh_parts = []
    for b in batches:
        f = b.filter(
            quality_score(F.coalesce(F.col(text_col).cast("string"),
                                     F.lit(""))) >= min_quality)
        f = mix_sample(f, rates, domain_col=domain_col, key_col=key_col)
        fresh, seen = dedup_incremental(f, seen, text_col=text_col,
                                        id_col=key_col)
        fresh_parts.append(fresh)
    out = fresh_parts[0]
    for p in fresh_parts[1:]:
        out = out.unionByName(p)
    return out
