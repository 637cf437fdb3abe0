"""Operator inventory (SURVEY.md §2), one function per faxe node.

Every operator is a plain function ``DataFrame -> DataFrame`` (plus
options), composable directly or through `faxe_spark.flow.Flow`. All of
them build declarative DataFrame plans — Catalyst picks the physical
strategy; nothing here collects to the driver or hand-schedules work.
"""

from faxe_spark.operators.project import (
    eval_lambdas,
    set_fields,
    default_fields,
    keep,
    delete,
    rename,
    extract_path,
    case_when,
    if_else,
    fields_to_array,
    array_explode,
    path_split,
    jsonsize,
    shift_time,
)
from faxe_spark.operators.filter import where, sample_nth, sample_per, change_detect, distinct_values
from faxe_spark.operators.window import (
    win_time, win_event, win_event_agg, win_session, batch_by_count,
    fill_period_filter, win_clock_agg,
)
from faxe_spark.operators.aggregate import aggregate, AGG_FUNCTIONS, percentile, top_k, dist_count
from faxe_spark.operators.diff import value_diff, time_diff, count_change, time_elapsed
from faxe_spark.operators.join import (
    asof_join, asof_join_exact, interval_join, combine, union_streams,
    merge_join, merge_value, salted_join,
)
from faxe_spark.operators.state import (
    state_runs, state_change, state_count, state_duration, state_sequence,
    state_change_bulk, state_count_duration, deadman_gaps,
    triggered_timeout_gaps,
)
from faxe_spark.operators.collect import collect_unique, collect_fields, collect_table
from faxe_spark.operators.timeseries import (
    subsequence_topk, subsequence_topk_sax, subsequence_match,
    motif_topk, discord_topk,
    build_sax_index, load_sax_index, add_to_sax_index, query_sax_index,
    drop_sax_index,
)

__all__ = [
    "eval_lambdas", "set_fields", "default_fields", "keep", "delete", "rename",
    "extract_path", "case_when", "if_else", "fields_to_array", "array_explode",
    "path_split", "jsonsize",
    "where", "sample_nth", "sample_per", "change_detect", "distinct_values",
    "win_time", "win_event", "win_event_agg", "win_session", "batch_by_count",
    "fill_period_filter",
    "aggregate", "AGG_FUNCTIONS", "percentile", "top_k", "dist_count",
    "value_diff", "time_diff", "count_change",
    "asof_join", "asof_join_exact", "interval_join", "combine", "union_streams",
    "merge_join", "merge_value", "salted_join",
    "state_runs", "state_change", "state_count", "state_duration", "state_sequence",
    "state_change_bulk", "state_count_duration", "deadman_gaps",
    "triggered_timeout_gaps",
    "collect_unique", "collect_fields", "collect_table",
    "subsequence_topk", "subsequence_topk_sax", "subsequence_match",
    "motif_topk", "discord_topk", "build_sax_index", "load_sax_index",
    "add_to_sax_index", "query_sax_index", "drop_sax_index",
]
