from tamer_spark.streaming.readers import (
    run_available_now,
    session_agg,
    stream_lines,
    stream_parquet,
    windowed_agg,
)
from tamer_spark.streaming.stateful import stateful_running_totals

__all__ = [
    "stream_lines",
    "stream_parquet",
    "windowed_agg",
    "session_agg",
    "run_available_now",
    "stateful_running_totals",
]
