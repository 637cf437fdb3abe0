"""faxe_spark — a PySpark-native stream/batch analytics engine.

A from-scratch reimplementation of the *capabilities* of heyoka/faxe
(an Erlang flow-based IoT stream processor; see SURVEY.md) on idiomatic
Spark: DataFrame/SQL for the logical plan, Catalyst/Tungsten for physical
execution, Structured Streaming for the streaming surface.

Design stance (SURVEY.md §7): operator = function ``DataFrame -> DataFrame``;
the DFS node graph becomes a Python builder (`faxe_spark.flow.Flow`); every
operator runs on batch DataFrames (DuckDB-oracle checkable) and, where Spark
allows, on streaming DataFrames with the same code path.
"""

from faxe_spark.session import get_spark, configure_session
from faxe_spark.tables import load_table, TABLE_NAMES
from faxe_spark.durations import parse_duration_ms, duration_to_interval

__all__ = [
    "get_spark",
    "configure_session",
    "load_table",
    "TABLE_NAMES",
    "parse_duration_ms",
    "duration_to_interval",
]

__version__ = "0.1.0"
