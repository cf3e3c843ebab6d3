from .rollup import (
    build_rollup_5m,
    compact_rollup,
    route_traffic_query,
    rollup_invariant_check,
)

__all__ = [
    "build_rollup_5m",
    "compact_rollup",
    "route_traffic_query",
    "rollup_invariant_check",
]
