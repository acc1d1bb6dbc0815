from tamer_spark.plans.inspect import (
    explain_str,
    has_broadcast_join,
    has_shuffle,
    pushed_filters,
    read_schema_columns,
    shuffle_count,
    wholestage_codegen_ids,
)

__all__ = [
    "explain_str",
    "has_broadcast_join",
    "has_shuffle",
    "shuffle_count",
    "pushed_filters",
    "read_schema_columns",
    "wholestage_codegen_ids",
]
