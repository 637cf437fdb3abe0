"""Structured Streaming surface (SURVEY.md §2.5, §2.10).

Same operator semantics as the batch library, on streaming DataFrames:
windows ride on `window()`/`session_window()` + watermarks (a strict
superset of the reference, which has no late-data handling), and the
per-key state machines (state_change, deadman, collect, triggered
timeout) ride on `applyInPandasWithState` — Spark's state store replaces
faxe's per-process FSM state (esp_state_change.erl, esp_deadman.erl,
esp_collect.erl).
"""

from faxe_spark.streaming.sources import stream_parquet, rate_source
from faxe_spark.streaming.windows import win_time_stream, win_session_stream, win_clock_stream
from faxe_spark.streaming.stateful import (
    state_change_stream,
    state_sequence_stream,
    collect_stream,
    deadman_stream,
    triggered_timeout_stream,
    time_elapsed_stream,
    join_stream,
    collect_full_stream,
    change_detect_stream,
    value_diff_stream,
    sample_stream,
)

__all__ = [
    "stream_parquet",
    "rate_source",
    "win_time_stream",
    "win_session_stream",
    "win_clock_stream",
    "state_change_stream",
    "state_sequence_stream",
    "collect_stream",
    "deadman_stream",
    "triggered_timeout_stream",
    "time_elapsed_stream",
    "join_stream",
    "collect_full_stream",
    "change_detect_stream",
    "value_diff_stream",
    "sample_stream",
]
