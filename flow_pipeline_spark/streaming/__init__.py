from .jobs import (
    start_raw_persist,
    start_rollup_stream,
    start_jdbc_inserter,
    run_compaction,
)
from .metrics import MetricsListener

__all__ = [
    "start_raw_persist",
    "start_rollup_stream",
    "start_jdbc_inserter",
    "run_compaction",
    "MetricsListener",
]
