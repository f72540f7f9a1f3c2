from .inspect import (
    physical_plan,
    pushed_filters,
    scan_read_schema,
    count_exchanges,
    has_broadcast_hash_join,
)

__all__ = [
    "physical_plan",
    "pushed_filters",
    "scan_read_schema",
    "count_exchanges",
    "has_broadcast_hash_join",
]
