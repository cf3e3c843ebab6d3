"""S10 — observability: the inserter exposes a Prometheus counter
(inserter/inserter.go:44-49,69-73; scraped per compose/prometheus/
prometheus.yml) and perfs.json graphs rate()s of such counters.

Spark-side equivalent: a StreamingQueryListener capturing per-micro-batch
progress (rows/s, batch duration) into an in-memory list that can be
persisted or served. The PromQL-style rate/sum-by queries over these series
are ordinary DataFrame ops (SURVEY §2.6 W7)."""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql.streaming import StreamingQueryListener


class MetricsListener(StreamingQueryListener):
    """Collects {query, batch_id, timestamp, num_input_rows,
    process_rate} per progress event — the `insert_count`-style counter the
    reference registers (and, unlike the reference, we actually record it:
    inserter.go registers but never increments, SURVEY §2.1 S10)."""

    def __init__(self) -> None:
        self.progress: list[dict[str, Any]] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        self.progress.append({
            "query_id": p.get("id"),
            "name": p.get("name"),
            "batch_id": p.get("batchId"),
            "timestamp": p.get("timestamp"),
            "num_input_rows": p.get("numInputRows"),
            "input_rows_per_second": p.get("inputRowsPerSecond"),
            "processed_rows_per_second": p.get("processedRowsPerSecond"),
            "duration_ms": (p.get("durationMs") or {}).get("triggerExecution"),
        })

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass
